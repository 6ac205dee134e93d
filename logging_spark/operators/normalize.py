"""Quantile normalization: map each group's value distribution onto
the GLOBAL distribution by rank (the bioinformatics microarray
technique, Bolstad et al. 2003, repurposed for cross-source score
calibration — make source A's 90th percentile mean the same thing as
source B's before fusing or thresholding).

Exact-integer convention (ties take the max rank, like a cumulative
count):

- a row's within-group level is q = ceil(r * L / n_g), where r is the
  count of group rows with value <= v and L the number of levels;
- the global level table maps each level p to the smallest global
  value whose cumulative count c satisfies c * L >= p * N.

Scale shape: both cumulative counts run over COLLAPSED (group, value)
/ (value) tables — distinct values, not rows, cross the windows (the
mann_whitney/ks_test pattern). The level table is L rows and
broadcast-joins back; each collapsed global value EMITS its covered
levels via sequence+explode (a narrow flatMap), so no inequality join
anywhere. The one global-ordering window runs over distinct values —
bound L and collapse first when value cardinality rivals row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(df: DataFrame, group_col: str, value_col: str,
                       levels: int = 1000) -> DataFrame:
    """(group, value, n_group, r, q, norm_value) per distinct
    (group, value): norm_value is the global value at the row's
    within-group quantile level. Row-level output is recovered by
    joining back on (group, value) — collapsed output keeps the
    result partitioning-independent and oracle-friendly."""
    per = (df.select(F.col(group_col).alias("grp"),
                     F.col(value_col).cast("long").alias("v"))
           .groupBy("grp", "v")
           .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    wg = (Window.partitionBy("grp").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0))
    ranked = per.select(
        "grp", "v", F.sum("_c").over(wg).alias("r"),
        F.sum("_c").over(Window.partitionBy("grp")).alias("n_group"))

    glob = (df.select(F.col(value_col).cast("long").alias("gv"))
            .groupBy("gv")
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    wv = Window.orderBy("gv").rowsBetween(Window.unboundedPreceding, 0)
    gcum = glob.select(
        "gv", F.sum("_c").over(wv).alias("c"),
        (F.sum("_c").over(wv) - F.col("_c")).alias("c_prev"),
        F.sum("_c").over(Window.partitionBy()).alias("n_total"))
    # value gv covers levels p with c_prev*L < p*N <= c*L:
    # p from floor(c_prev*L/N)+1 to floor(c*L/N) — emitted directly,
    # no inequality join
    # guard empty ranges: Spark's sequence(5, 3) DESCENDS instead of
    # being empty (the luhn lesson), so a value covering no level must
    # yield an empty array, not a reversed one
    lv = gcum.select(
        "gv",
        F.explode(F.expr(
            f"CASE WHEN (c_prev * {levels}) DIV n_total "
            f"< (c * {levels}) DIV n_total THEN sequence("
            f"CAST((c_prev * {levels}) DIV n_total AS INT) + 1, "
            f"CAST((c * {levels}) DIV n_total AS INT)) "
            f"ELSE array() END")).alias("p"))

    out = (ranked.withColumn(
        "q", F.expr(f"(r * {levels} + n_group - 1) DIV n_group"))
        .join(F.broadcast(lv), F.col("q") == F.col("p"))
        .select(F.col("grp").alias(group_col),
                F.col("v").alias(value_col),
                "n_group", "r", "q",
                F.col("gv").alias("norm_value")))
    return out
