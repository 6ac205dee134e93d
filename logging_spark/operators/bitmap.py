"""Block-packed bitmap membership index: EXACT distributed set algebra.

Completes the set-operation taxonomy from the approximate side
(`kmv.py` = approx distinct, theta intersection = approx set ops,
`sketch.py` count-min = approx frequency): when member ids are dense
non-negative integers — user ids, vec ids, doc ids after
`sample.dense_ids` — a set of 10^9 members collapses to 10^9/62
(set, block, bits) rows, and intersection / union / difference
become bit-ops on block-aligned BIGINTs. Everything here is EXACT,
mergeable (union + re-`bit_or`), broadcastable when one side is
small, and engine-portable (``&``, ``<<``, ``bit_or``, ``bit_count``
exist in both Spark and DuckDB with identical semantics on BIGINT),
so every number is oracle-checkable.

Reference parity: the reference's per-sink membership accounting
(`pkg/datasource/datasource.go` routed-set bookkeeping) is a distinct
membership question at heart; this is the audience-overlap /
segment-sizing generalization a 10^12-turn pipeline needs.

Block size is 62, not 64: ``1 << 62`` is the largest power of two
that stays positive in a signed BIGINT, and Java's ``shiftleft``
masks the shift amount to 6 bits — positions are kept strictly below
both cliffs (see CLAUDE.md round-3 notes on `shiftleft`).

Scale shape at 10^12 rows: the index build is one map-side-combined
groupBy (each partition collapses to its distinct (set, block) rows
before the shuffle — ``bit_or`` is commutative); pair intersection
joins block-aligned index rows only, so the wide stage carries
n_members/62 rows per set, never raw members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_BITS = 62


def bitmap_index(df: DataFrame, set_col: str, member_col: str,
                 block_bits: int = BLOCK_BITS) -> DataFrame:
    """(set, block, bits): one row per 62-member block per set.

    ``member_col`` must render a NON-NEGATIVE BIGINT (dense ids —
    see `sample.dense_ids` for re-basing sparse ids). Duplicate
    members are absorbed by ``bit_or``; no pre-distinct needed.
    """
    assert 0 < block_bits <= 62, "positions must stay below bit 62"
    return (df.select(
        F.col(set_col).alias("set_id"),
        F.expr(f"CAST({member_col} AS BIGINT) DIV {block_bits}")
        .alias("block"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), "
               f"CAST({member_col} % {block_bits} AS INT))")
        .alias("_bit"))
        .groupBy("set_id", "block")
        .agg(F.expr("bit_or(_bit)").alias("bits")))


def bitmap_merge(indexes: DataFrame) -> DataFrame:
    """Union-of-indexes -> one index: re-``bit_or`` per (set, block).
    Exact — the mergeability that makes the index incremental
    (yesterday's index + today's delta index, no rescan)."""
    return (indexes.groupBy("set_id", "block")
            .agg(F.expr("bit_or(bits)").alias("bits")))


def bitmap_cardinality(index: DataFrame) -> DataFrame:
    """(set_id, n): exact member count per set — sum of block
    popcounts, map-side combinable."""
    return (index.groupBy("set_id")
            .agg(F.expr("CAST(sum(bit_count(bits)) AS BIGINT)")
                 .alias("n")))


def bitmap_pair_stats(index: DataFrame) -> DataFrame:
    """Exact audience overlap for every set pair (a < b):
    (set_a, set_b, n_a, n_b, n_inter, n_union, jaccard_ppm).

    The intersection join is block-aligned (equi-join on ``block``);
    a block missing on either side contributes 0 by construction, so
    the inner join IS the intersection. Sizes join back from
    `bitmap_cardinality` — a tiny broadcast.
    """
    a = index.select(F.col("set_id").alias("set_a"), "block",
                     F.col("bits").alias("bits_a"))
    b = index.select(F.col("set_id").alias("set_b"), "block",
                     F.col("bits").alias("bits_b"))
    inter = (a.join(b, "block")
             .where(F.col("set_a") < F.col("set_b"))
             .groupBy("set_a", "set_b")
             .agg(F.expr("CAST(sum(bit_count(bits_a & bits_b)) "
                         "AS BIGINT)").alias("n_inter")))
    card = bitmap_cardinality(index)
    out = (inter
           .join(F.broadcast(card.select(
               F.col("set_id").alias("set_a"), F.col("n").alias("n_a"))),
               "set_a")
           .join(F.broadcast(card.select(
               F.col("set_id").alias("set_b"), F.col("n").alias("n_b"))),
               "set_b")
           .withColumn("n_union",
                       (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
                       .cast("long")))
    return out.select(
        "set_a", "set_b", "n_a", "n_b", "n_inter", "n_union",
        F.expr("(n_inter * 1000000) DIV n_union").alias("jaccard_ppm"))


def bitmap_pair_audit(df: DataFrame, set_col: str, member_col: str,
                      block_bits: int = BLOCK_BITS) -> DataFrame:
    """`bitmap_pair_stats` with an in-query exactness proof: the same
    pairwise intersection recomputed member-at-a-time (distinct
    member equi-join — a completely different plan) must match the
    bitmap popcount bit-for-bit. One row per pair with
    ``exact_match`` — the audit-the-operator pattern of
    `agg_hll_audit` / `countmin_audit`, except here the expected
    answer is equality, not a bound."""
    stats = bitmap_pair_stats(
        bitmap_index(df, set_col, member_col, block_bits=block_bits))
    m = (df.select(F.col(set_col).alias("set_id"),
                   F.expr(f"CAST({member_col} AS BIGINT)").alias("m"))
         .distinct())
    exact = (m.alias("x").join(m.alias("y"), "m")
             .where(F.col("x.set_id") < F.col("y.set_id"))
             .groupBy(F.col("x.set_id").alias("set_a"),
                      F.col("y.set_id").alias("set_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter_exact")))
    return (stats.join(exact, ["set_a", "set_b"], "left")
            .select("set_a", "set_b", "n_a", "n_b", "n_inter",
                    "n_union", "jaccard_ppm",
                    F.coalesce("n_inter_exact", F.lit(0)).cast("long")
                    .alias("n_inter_exact"),
                    (F.col("n_inter")
                     == F.coalesce("n_inter_exact", F.lit(0)))
                    .cast("int").alias("exact_match")))
