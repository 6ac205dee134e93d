"""Count-min sketch as pure relational algebra — buildable, mergeable,
and auditable in ANY engine.

The classic Cormode-Muthukrishnan frequency sketch done Spark-first:
instead of a custom aggregator, the sketch IS a tiny table
(depth x width rows of (r, bucket, c)) produced by one groupBy — which
makes it map-side combinable (each partition collapses to <= d*w rows
before the shuffle), trivially mergeable across corpora/days (union +
re-groupBy), and — because the bucket hash is the repo's engine-
portable hash60 (md5) — bit-identical in DuckDB, so estimates are
oracle-checkable, the same auditability bar as every other operator
(HLL/quantile sketches expose no portable state; this one is all
state).

Estimate(key) = min over rows r of c[r][h_r(key)]; the one-sided CM
guarantee (est >= exact, overcount <= eps * total with prob 1-delta
for w = e/eps, d = ln(1/delta)) is asserted IN-QUERY by
countmin_audit, the same audit-the-approximation pattern as
agg_hll_audit / minhash_estimate_audit.

Scale shape at 10^12 turns: the sketch build shuffles d rows per
input row but they collapse map-side to d*w rows per partition;
the probe side joins the d*w-row sketch BROADCAST against the key
frame — no wide exchange carries raw keys anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logging_spark.operators.sample import hash60


def countmin_sketch(df: DataFrame, key_col: str, depth: int = 4,
                    width: int = 1024, seed: str = "cm") -> DataFrame:
    """(r, bucket, c): the d x w sketch table for the key column."""
    rows = None
    for r in range(depth):
        part = df.select(
            F.lit(r).alias("r"),
            F.pmod(hash60(key_col, f"{seed}{r}"), F.lit(width))
            .alias("bucket"))
        rows = part if rows is None else rows.unionAll(part)
    return rows.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c"))


def countmin_estimates(df: DataFrame, key_col: str, depth: int = 4,
                       width: int = 1024, seed: str = "cm") -> DataFrame:
    """(key, n_exact, est): per-distinct-key exact count and sketch
    estimate. The exact count rides along because the audit needs it;
    production probes of a handful of keys drop that aggregate."""
    sketch = countmin_sketch(df, key_col, depth=depth, width=width,
                             seed=seed)
    exact = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    probes = exact.select(
        key_col, "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     F.pmod(hash60(key_col, f"{seed}{r}"),
                            F.lit(width)).alias("bucket"))
            for r in range(depth)])).alias("_p")
    ).select(key_col, "n_exact", "_p.r", "_p.bucket")
    return (probes.join(F.broadcast(sketch), ["r", "bucket"])
            .groupBy(key_col, "n_exact")
            .agg(F.min("c").alias("est")))


def countmin_audit(df: DataFrame, key_col: str, depth: int = 4,
                   width: int = 1024, seed: str = "cm") -> DataFrame:
    """One audit row: (n_keys, n_underestimates, total_overcount,
    max_overcount). n_underestimates MUST be 0 (the one-sided CM
    guarantee); the overcounts quantify collision noise at this
    (depth, width) against the actual key distribution."""
    est = countmin_estimates(df, key_col, depth=depth, width=width,
                             seed=seed)
    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum((F.col("est") < F.col("n_exact")).cast("long"))
        .cast("long").alias("n_underestimates"),
        F.sum(F.col("est") - F.col("n_exact")).cast("long")
        .alias("total_overcount"),
        F.max(F.col("est") - F.col("n_exact")).cast("long")
        .alias("max_overcount"))


# ---------------------------------------------------------------------
# Mergeable quantile sketch: power-of-two equi-width histogram.
# Completes the relational sketch taxonomy (KMV = distinct, count-min
# = frequency, theta = set ops): the sketch IS a (bucket, cnt) table —
# mergeable by union + re-sum (EXACT, unlike probabilistic merges),
# broadcastable, engine-portable (pure integer buckets). A quantile
# recovered from it is the true quantile's bucket lower edge, so the
# value-space error is bounded by the bucket width BY CONSTRUCTION —
# the audit query carries that bound as data.

def histogram_sketch(df: DataFrame, value_expr: str,
                     width_pow2: int = 7,
                     group_by: list[str] | None = None) -> DataFrame:
    """(group..., bucket, cnt) with bucket = value DIV 2^width_pow2.
    `value_expr` must render a non-negative BIGINT (e.g. cents).
    One map-side-combined groupBy; sketch size is bounded by the
    value domain / width, independent of row count."""
    gcols = list(group_by or [])
    b = F.expr(f"CAST(({value_expr}) AS BIGINT) DIV {1 << width_pow2}")
    return (df.groupBy(*gcols, b.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def merge_histogram_sketches(sketches: DataFrame) -> DataFrame:
    """Union-of-sketches -> one sketch: re-sum per bucket. Exact."""
    return (sketches.groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def sketch_quantile_edge(sketch: DataFrame, q_num: int, q_den: int,
                         width_pow2: int = 7) -> DataFrame:
    """Lower edge of the bucket holding rank ceil(n * q_num / q_den):
    1-row (n, target_rank, edge). The cumulative walk is a window over the
    SKETCH table (rows bounded by value-domain/width, hundreds — not
    a data-sized global window)."""
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = sketch.agg(F.sum("cnt").cast("long").alias("n"))
    cum = (sketch.crossJoin(F.broadcast(tot))
           .withColumn("cum", F.sum("cnt").over(w).cast("long"))
           .withColumn("target_rank",
                       # ceil under TRUNCATING division: the negate
                       # trick -((-x) DIV d) yields floor here, not
                       # ceil (caught by the brute-force twin)
                       F.expr(f"CAST((n * {q_num} + {q_den} - 1) "
                              f"DIV {q_den} AS BIGINT)")))
    return (cum.where(F.col("cum") >= F.col("target_rank"))
            .groupBy("n", "target_rank")
            .agg((F.min("bucket") * (1 << width_pow2)).cast("long")
                 .alias("edge")))
