"""Robust per-key anomaly flags over bucketed event counts.

The ops question every log pipeline answers daily: which (user,
period) error counts are spikes against that user's own history? The
robust statistic is median/MAD (not mean/stddev — one outage week
would inflate a stddev and mask the next one; the median absolute
deviation has a 50% breakdown point, Hampel's rule).

Plan shape: one hash aggregate to (key, period, n), then ONE shuffle
on the key feeding two stacked Window nodes (median, then MAD over
|n - median|) — Catalyst reuses the exchange since both windows share
the partition key. State per key is the period count, bounded by the
timeline. percentile() is the same linear-interpolation definition as
DuckDB's quantile_cont (bitwise-matched by the agg_exact_quantiles
contract query), so the spike verdicts are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logging_spark.operators.cohort import WEEK_S


def spike_flags(events: DataFrame, key_col: str = "user_id",
                ts_col: str = "ts", period_s: int = WEEK_S,
                k_mad: int = 3) -> DataFrame:
    """(key, period, n, med, mad, is_spike): per-key period counts with
    Hampel spike flags — n is a spike when n - median > k_mad * MAD
    (strict, one-sided: low periods are quiet, not anomalous). Keys
    with constant history (MAD 0) flag any count above the median.
    """
    period = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp")) / period_s
    ).cast("long")
    counts = (events.select(F.col(key_col).alias("key"),
                            period.alias("period"))
              .groupBy("key", "period")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("key")
    med = F.percentile(F.col("n").cast("double"), F.lit(0.5)).over(w)
    step = counts.withColumn("med", med)
    mad = F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).over(w)
    step = step.withColumn("mad", mad)
    return step.select(
        F.col("key"), "period", "n", "med", "mad",
        ((F.col("n") - F.col("med")) > k_mad * F.col("mad"))
        .alias("is_spike"),
    )
