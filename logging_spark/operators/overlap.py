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
