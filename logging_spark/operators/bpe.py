"""BPE merge-candidate counting: adjacent-token-pair frequencies.

The first step of byte-pair-encoding tokenizer training is a corpus
scan counting every adjacent symbol pair; the most frequent pair
becomes the next merge rule. At training-corpus scale that scan IS
the workload (each iteration re-counts), so the shape matters:

- pairs are built per row with one `zip_with` over two shifted
  slices of the SAME pre-projected token array — arrays enter the
  HOF as plain column children, so nothing is re-evaluated per
  element (the interpreted-HOF re-evaluation trap);
- counting is explode + groupBy: partial (map-side) aggregation
  collapses each partition's pair multiset before the shuffle, so
  the exchange carries one row per distinct pair per partition —
  at 100 TB this is the difference between shuffling tokens and
  shuffling a vocabulary;
- top-k is orderBy+limit, which Spark plans as
  TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows), never a global sort.

Ties are broken by pair text ascending so the k-th boundary is
deterministic under any partitioning (and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions import text as T


def pair_counts(df: DataFrame, text_col: str = "text",
                k: int | None = None) -> DataFrame:
    """(pair, n): adjacent-token-pair frequencies over the corpus,
    top-k by (n desc, pair asc) when `k` is given."""
    toks = df.select(T.tokens(text_col).alias("_toks")).where(
        F.size("_toks") >= 2)
    pair = F.zip_with(
        F.expr("slice(_toks, 1, size(_toks) - 1)"),
        F.expr("slice(_toks, 2, size(_toks) - 1)"),
        lambda a, b: F.concat(a, F.lit(" "), b))
    out = (toks.select(F.explode(pair).alias("pair"))
           .groupBy("pair").agg(F.count(F.lit(1)).alias("n")))
    if k is not None:
        out = out.orderBy(F.col("n").desc(), "pair").limit(k)
    return out
