"""KMV (k-minimum-values) distinct-count sketch — relational and exact.

The Theta/KMV family estimator (Bar-Yossef et al. 2002; the Apache
DataSketches theta sketch is the production descendant): hash every
value into a uniform integer space, keep only the k SMALLEST distinct
hashes; with U = the k-th smallest hash as a fraction of the space,
distinct-count ≈ (k-1) / U. Like `operators/sketch.py` (count-min)
the sketch here IS a DataFrame — k rows of BIGINT — so it is

- **mergeable**: the min-k of a union of per-shard min-k sketches is
  exactly the global min-k (any hash among the global k smallest has
  at most k-1 smaller hashes in its own shard, so every global
  survivor is present in its shard's sketch). Union + re-min-k is the
  whole merge — the basis for per-day / per-shard rollups where the
  raw values never leave their shard.
- **oracle-checkable**: hashes are a 56-bit md5 prefix (the portable
  `hash60` construction, truncated one hex char so the estimate's
  `(k-1) * SPACE` numerator stays inside signed int64 for k <= 128),
  and the estimate is integer arithmetic — no engine-dependent
  floats. 56 bits keeps birthday collisions negligible below ~1e8
  distinct values; past that, report per-shard estimates (the merge
  identity still holds) rather than one global number.

Scale story (100 TB): the expensive step is distinct-hash dedup,
a map-side-combining shuffle of 8-byte hashes (not values). The
min-k itself is `orderBy(hv).limit(k)` = TakeOrderedAndProject:
per-partition top-k heaps, then a k-row driver merge — no global
sort. Sketch size is k rows regardless of input size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 56-bit space: 14 hex chars. (k-1) * SPACE <= 127 * 2^56 < 2^63.
KMV_SPACE = 1 << 56
MAX_K = 128


def hash56(col: str | Column, seed: str) -> Column:
    """Uniform integer in [0, 2^56): md5 prefix, engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat_ws(":", F.lit(seed), c.cast("string")))
    return F.conv(F.substring(h, 1, 14), 16, 10).cast("long")


def hash56_sql(expr: str, seed: str) -> str:
    """DuckDB rendering of hash56 for oracle SQL."""
    return ("CAST('0x' || substr(md5('" + seed + ":' || CAST(" + expr
            + " AS VARCHAR)), 1, 14) AS BIGINT)")


def _check_k(k: int) -> None:
    if not 2 <= k <= MAX_K:
        raise ValueError(f"k must be in [2, {MAX_K}], got {k}")


def kmv_sketch(df: DataFrame, col: str, k: int = 64,
               seed: str = "kmv") -> DataFrame:
    """The k smallest distinct 56-bit hashes of `col`, as (hv BIGINT).
    Deterministic; merge sketches with `merge_sketches`."""
    _check_k(k)
    return (df.select(hash56(col, seed).alias("hv"))
            .distinct().orderBy("hv").limit(k))


def merge_sketches(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Min-k of a union of sketches (a (hv) frame): exactly the sketch
    of the union of the underlying inputs."""
    _check_k(k)
    return sketches.select("hv").distinct().orderBy("hv").limit(k)


def grouped_sketch(df: DataFrame, col: str, group_cols: list[str],
                   k: int = 64, seed: str = "kmv") -> DataFrame:
    """Per-group min-k sketches in one pass: (group_cols..., hv).
    One dedup shuffle on (group, hv), then a windowed top-k (the
    rank pushes below the shuffle as WindowGroupLimit)."""
    _check_k(k)
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (df.select(*group_cols, hash56(col, seed).alias("hv"))
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))


def kmv_estimate(sketch: DataFrame) -> DataFrame:
    """One row (k_used, kth_hash, est_distinct) from a (hv) sketch.
    est = (k_used - 1) * KMV_SPACE DIV kth — integer-exact; for
    inputs with fewer than k distinct values the sketch holds them
    all and the estimator biases low — callers with tiny inputs
    should read k_used."""
    return (sketch.agg(F.count(F.lit(1)).alias("k_used"),
                       F.max("hv").alias("kth_hash"))
            .select("k_used", "kth_hash",
                    F.expr(f"((k_used - 1) * {KMV_SPACE}) DIV kth_hash")
                    .alias("est_distinct")))


def kmv_audit(df: DataFrame, col: str, k: int = 64,
              seed: str = "kmv", n_sigma: int = 3) -> DataFrame:
    """Estimate vs exact, with a within-error-budget verdict — the
    repo's standard audit shape for approximate operators (see
    agg_hll_audit / agg_countmin_audit). Budget: n_sigma / sqrt(k)
    relative error, expressed in permille (computed here in Python —
    the constant, not the data, carries the float)."""
    budget_permille = int(math.ceil(n_sigma * 1000.0 / math.sqrt(k)))
    est = kmv_estimate(kmv_sketch(df, col, k=k, seed=seed))
    exact = df.agg(F.count_distinct(col).alias("exact_distinct"))
    return (est.crossJoin(exact)  # both single-row aggregates
            .select(
                "k_used", "est_distinct", "exact_distinct",
                F.expr("abs(est_distinct - exact_distinct) * 1000 "
                       "DIV exact_distinct").alias("err_permille"))
            .withColumn(
                "within_budget",
                (F.col("err_permille") <= budget_permille).cast("int")))


def kmv_intersect_estimate(sk_a: DataFrame,
                           sk_b: DataFrame) -> DataFrame:
    """Theta-sketch set intersection from two KMV sketches: one row
    (theta, n_common, est_intersection). theta = min of the two kth
    hashes; every hash < theta present in BOTH sketches is a complete
    uniform sample of A ∩ B below theta (a min-k sketch contains ALL
    its input's distinct hashes below its own kth), so
    est = n_common * KMV_SPACE DIV theta. The strict < excludes the
    kth itself, so n_common <= MAX_K - 1 = 127 and the numerator
    127 * 2^56 stays inside int64.

    Distinct-intersection ("audience overlap") without ever joining
    the raw id sets — two k-row frames meet, nothing else."""
    ta = sk_a.agg(F.max("hv").alias("_ka"))
    tb = sk_b.agg(F.max("hv").alias("_kb"))
    theta = (ta.crossJoin(tb)
             .select(F.least("_ka", "_kb").alias("theta")))
    common = (sk_a.join(sk_b, "hv")
              .crossJoin(F.broadcast(theta))
              .where(F.col("hv") < F.col("theta"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    return (common.crossJoin(F.broadcast(theta))
            .select("theta", "n_common",
                    F.expr(f"(n_common * {KMV_SPACE}) DIV theta")
                    .alias("est_intersection")))
