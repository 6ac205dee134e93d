"""Winsorized (percentile-clipped) aggregation.

Outlier-robust rollups for metric columns: clip each value to its
group's [lo_p, hi_p] exact percentiles before aggregating, and report
how many values were clipped on each side. The standard pre-step
before averaging latencies/costs whose tails are sensor noise.

Plan shape: one percentile aggregate per group (exact `percentile`,
which matches DuckDB's quantile_cont bitwise — established by the
Hampel operator), broadcast the tiny bounds table back onto the fact,
then one ordinary hash aggregate. Two shuffles of the group key
total; the bounds join is always broadcast (|groups| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorized_stats(
    df: DataFrame,
    value: str,
    group: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Per-group winsorized sum (in cents, integer-exact) + clip counts.

    Output: (group, sum_cents_winsorized, n_clip_lo, n_clip_hi, n).
    NULL values are excluded from both the percentiles and the sums
    (SQL aggregate semantics).
    """
    v = F.col(value)
    bounds = df.groupBy(group).agg(
        F.expr(f"percentile({value}, {lo_p})").alias("_lo"),
        F.expr(f"percentile({value}, {hi_p})").alias("_hi"))
    j = df.where(v.isNotNull()).join(F.broadcast(bounds), group)
    clipped = F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    return (j.groupBy(group)
            .agg(F.sum(F.round(clipped * 100).cast("long"))
                  .alias("sum_cents_winsorized"),
                 F.sum(F.when(v < F.col("_lo"), 1).otherwise(0))
                  .cast("long").alias("n_clip_lo"),
                 F.sum(F.when(v > F.col("_hi"), 1).otherwise(0))
                  .cast("long").alias("n_clip_hi"),
                 F.count(F.lit(1)).alias("n")))
