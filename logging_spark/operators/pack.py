"""Sequence packing: assign token chunks to fixed-budget training
packs (the step between chunking and batch assembly in an LLM data
pipeline — packs of ~context-length tokens feed the trainer directly).

Document-level packing: chunks pack greedily IN ORDER within their
document; packs never cross documents. That is the semantics most
curation pipelines want anyway (cross-document packing leaks attention
across unrelated texts unless the trainer masks it), and it is the
scalable one: the running token count is a window partitioned by
doc_id — a single hash-partitioned sort, skew-bounded by document
length, no global order. A corpus-global greedy pack would need a
range-partitioned two-pass cumulative sum (per-partition totals, then
offset broadcast) — doable, but not what we ship until a consumer
needs cross-document packs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    doc_col: str = "doc_id",
    order_col: str = "chunk_idx",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Add pack_idx: the 0-based pack this chunk starts in, packing
    chunks of `token_col` tokens greedily in `order_col` order into
    per-document packs of `budget` tokens. A chunk is assigned to the
    pack where its FIRST token lands (floor(cum_before / budget)), so
    a chunk may overflow its pack by at most one chunk — the standard
    first-fit-by-order approximation that keeps assignment a pure
    prefix-sum (exact bin packing is NP-hard and order-destroying).
    """
    w = (Window.partitionBy(doc_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return chunks.withColumn(
        "pack_idx", F.floor(cum_before / F.lit(budget)).cast("int"))
