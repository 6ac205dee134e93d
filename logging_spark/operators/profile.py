"""One-pass column profiling: the data-quality audit table.

(column, n_rows, n_null, n_distinct) per profiled column — the
summary every ingestion pipeline publishes next to a new snapshot
(null regressions and cardinality cliffs are how schema drift and
join-key corruption actually surface).

Plan shape: ONE aggregate over the scan computes every null counter
plus all distinct counts; Spark plans multiple DISTINCT aggregates as
a single Expand (one row duplicated per distinct column) + two hash
aggregates — one pass over the data, no per-column scans. The long
(column, metric) layout comes from a zero-cost stack over the 1-row
wide result. For 10^12-row tables swap count_distinct for
approx_count_distinct (HLL) per column — same plan, constant memory —
and keep the exact form for audit snapshots of bounded dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct) per column, exact."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long").alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _null_{c}, _dist_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_null, n_distinct)",
        "_n AS n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct")
