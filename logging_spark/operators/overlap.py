"""Pairwise text-overlap metrics (BLEU-1/ROUGE-1-style).

Eval pipelines score candidate texts against references by clipped
n-gram overlap. This is a PER-ROW computation — given a DataFrame of
(candidate_tokens, reference_tokens) pairs, precision/recall/F1 are
pure Catalyst HOF expressions with no shuffle, no UDF, no Python: the
operator's cost at 100 TB is exactly one codegen'd pass over however
the pairs were produced (a retrieval join, an adjacency join, a
cogroup). Integer fixed-point throughout (ppm), so the DuckDB oracle
twin (list comprehension + list_filter) matches bit-for-bit.

HOF hygiene (CLAUDE.md): the token arrays enter the lambdas as bound
COLUMNS (pre-projected), never as expressions — an expression in a
lambda body re-evaluates per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def clipped_overlap(a: Column, b: Column) -> Column:
    """Clipped multiset intersection size of two token arrays:
    ``sum over distinct t in a of min(count_a(t), count_b(t))`` —
    the BLEU clipping rule. O(|distinct a| * (|a|+|b|)) per row."""
    return F.aggregate(
        F.array_distinct(a),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.least(
            F.size(F.filter(a, lambda x: x == t)),
            F.size(F.filter(b, lambda x: x == t))).cast("long"))


def pair_overlap_metrics(pairs: DataFrame, a_col: str, b_col: str,
                         out_prefix: str = "") -> DataFrame:
    """Append clipped-unigram ``overlap``, ``precision_ppm``,
    ``recall_ppm``, ``f1_ppm`` columns for token-array columns
    ``a_col`` (candidate) / ``b_col`` (reference).

    F1 over counts reduces to ``2*overlap/(|a|+|b|)`` exactly, so all
    three metrics are single integer divisions. Empty sides score 0
    (guarded with greatest(...,1))."""
    a, b = F.col(a_col), F.col(b_col)
    p = out_prefix
    na = f"greatest(CAST(size({a_col}) AS BIGINT), 1L)"
    nb = f"greatest(CAST(size({b_col}) AS BIGINT), 1L)"
    nab = (f"greatest(CAST(size({a_col}) AS BIGINT)"
           f" + CAST(size({b_col}) AS BIGINT), 1L)")
    return (pairs
            .withColumn(p + "overlap", clipped_overlap(a, b))
            .withColumn(p + "precision_ppm",
                        F.expr(f"({p}overlap * {PPM}) DIV {na}")
                        .cast("long"))
            .withColumn(p + "recall_ppm",
                        F.expr(f"({p}overlap * {PPM}) DIV {nb}")
                        .cast("long"))
            .withColumn(p + "f1_ppm",
                        F.expr(f"(2 * {p}overlap * {PPM}) DIV {nab}")
                        .cast("long")))


def venn_masks(frames: dict, id_col: str) -> DataFrame:
    """N-way corpus Venn diagram (n <= 62): one row per non-empty
    membership mask with its exact population count.

    Each input frame contributes its ids tagged with one bit
    (2^position in the dict's insertion order); a union + one
    groupBy(id) bit_or + one groupBy(mask) count gives every Venn
    cell in two shuffles TOTAL regardless of n — the pairwise
    full-outer-join approach is quadratic in corpora, this is not.
    Also emits `corpora`, the '+'-joined names for the mask, so the
    output is self-describing.
    """
    from functools import reduce
    names = list(frames)
    tagged = [
        frames[nm].select(F.col(id_col).alias("_id"),
                          F.lit(1 << i).cast("long").alias("_bit"))
        .distinct()
        for i, nm in enumerate(names)]
    allrows = reduce(lambda a, b: a.unionByName(b), tagged)
    masks = (allrows.groupBy("_id")
             .agg(F.expr("bit_or(_bit)").alias("mask")))
    label = F.concat_ws("+", F.array_compact(F.array(*[
        F.when((F.col("mask").bitwiseAND(F.lit(1 << i))) != 0,
               F.lit(nm)) for i, nm in enumerate(names)])))
    return (masks.groupBy("mask")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ids"))
            .select(F.col("mask").cast("long"), label.alias("corpora"),
                    "n_ids"))
