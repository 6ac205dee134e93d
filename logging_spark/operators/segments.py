"""RFM customer segmentation: recency / frequency / monetary binning.

The classic lifecycle-marketing rollup, shaped for scale: ONE
aggregation over the fact table produces all three dimensions
(max date, count, sum cents — decomposable aggregates, fully
map-side combined), then binning is pure per-row expression work:

- recency: days since last order, bucketed in 90-day quarters and
  capped (the tail of dormant customers lands in one bin);
- frequency / monetary: log2 bins via `length(bin(x))` — integer
  bit-length, engine-exact (the same portable-log2 trick as the
  governance size bins), matching how RFM is used in practice
  (orders-of-magnitude tiers, not precise quantiles — a quantile
  version would need a global distribution pass; the log2 form is
  embarrassingly parallel).

No window functions, no second shuffle: the output is one row per
customer, keyed by the (uniform) customer id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(orders: DataFrame, cust_col: str = "o_custkey",
                 date_col: str = "o_orderdate",
                 amount_col: str = "o_totalprice",
                 ref_date: str = "2002-01-01") -> DataFrame:
    """(cust, recency_days, frequency, monetary_cents, r_bin, f_bin,
    m_bin): per-customer RFM facts + bins as of ``ref_date``."""
    per = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(F.col(date_col).cast("date")).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(F.floor(F.col(amount_col) * 100).cast("long"))
         .cast("long").alias("monetary_cents"))
    recency = F.datediff(F.lit(ref_date).cast("date"), F.col("_last"))
    facts = per.select(
        "cust",
        recency.cast("long").alias("recency_days"),
        "frequency", "monetary_cents")
    return facts.select(
        "*",
        F.least(F.expr("recency_days DIV 90"), F.lit(7).cast("long"))
         .cast("long").alias("r_bin"),
        F.length(F.bin("frequency")).cast("long").alias("f_bin"),
        F.length(F.bin(F.expr("monetary_cents DIV 100"))).cast("long")
         .alias("m_bin"))
