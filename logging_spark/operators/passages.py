"""Cross-corpus duplicate-passage removal (C4 / "Deduplicating
Training Data Makes Language Models Better" style).

The reference dedups whole records by key (W1, pkg/core/dedup
semantics); web-scale LLM corpora additionally remove REPEATED SPANS
that occur across otherwise-distinct documents (boilerplate, license
headers, navigation chrome). This operator chunks every document into
fixed-width token windows, hashes each chunk, keeps an occurrence only
in the lowest-doc_id document containing that chunk, and reassembles
the surviving text per document.

Scale shape (the reason this is NOT a self-join):
- one narrow explode: (doc_id, chunk_idx, chunk_hash) — chunk BODIES
  never enter the wide stages, only 16-byte hashes + two ints;
- one hash-partition aggregate on chunk_hash (min doc_id = keeper).
  Skew is self-bounding: a hot hash group IS the duplicate family,
  and only (hash, doc) pairs ride the shuffle;
- one equi-join back on chunk_hash (hashes only), one per-doc
  re-aggregate of kept indices (small int arrays);
- reassembly re-slices the ORIGINAL token array by kept index, so
  document text crosses the wire exactly once (the final doc_id join).

Empty / short documents: a doc shorter than `window_tokens` is one
(partial) chunk; an empty doc has zero chunks and survives with
text_kept = ''. Spark's sequence() DESCENDS when stop < start, so the
chunk-index explode is guarded on n_chunks > 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions.text import tokens


def passage_occurrences(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        window_tokens: int = 20) -> DataFrame:
    """(id, chunk_idx, chunk_hash) for every fixed-width token window.

    Chunk i covers tokens [i*w, (i+1)*w); the final chunk may be
    partial. The hash is md5 of the space-joined chunk (portable to
    the DuckDB oracle). Token arrays are pre-projected bound columns
    so the HOF/Generate stages never re-evaluate the tokenizer.
    """
    w = window_tokens
    base = df.select(F.col(id_col).alias("_id"),
                     tokens(text_col).alias("_toks"))
    base = base.withColumn(
        "_nch", F.ceil(F.size("_toks") / F.lit(float(w))).cast("int"))
    occ = (base.where(F.col("_nch") > 0)
           .select("_id", "_toks",
                   F.explode(F.sequence(F.lit(0), F.col("_nch") - 1))
                    .alias("chunk_idx")))
    return occ.select(
        F.col("_id").alias(id_col),
        "chunk_idx",
        F.md5(F.concat_ws(
            " ", F.slice(F.col("_toks"),
                         F.col("chunk_idx") * w + 1, F.lit(w))))
         .alias("chunk_hash"))


def global_passage_dedup(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         window_tokens: int = 20) -> DataFrame:
    """Remove duplicated token windows corpus-wide; first doc wins.

    Returns one row per input document:
      (id_col, n_chunks, n_kept, text_kept)
    where text_kept is the space-joined concatenation of this
    document's surviving chunks in original order. An occurrence
    survives iff its document is the minimum-id document containing
    that exact chunk — so unique text is untouched and every
    duplicated span survives exactly once corpus-wide.
    """
    w = window_tokens
    occ = passage_occurrences(df, id_col, text_col, w)
    keeper = (occ.groupBy("chunk_hash")
              .agg(F.min(id_col).alias("_keeper")))
    kept = (occ.join(keeper, "chunk_hash")
            .where(F.col(id_col) == F.col("_keeper"))
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("chunk_idx")).alias("_kept"),
                 F.count(F.lit(1)).alias("n_kept")))
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    base = base.withColumn(
        "n_chunks",
        F.ceil(F.size("_toks") / F.lit(float(w))).cast("long"))
    out = base.join(kept, id_col, "left")
    empty = F.array().cast("array<int>")
    return out.select(
        id_col,
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.concat_ws(" ", F.flatten(F.transform(
            F.coalesce(F.col("_kept"), empty),
            lambda i: F.slice(F.col("_toks"), i * w + 1, F.lit(w)))))
         .alias("text_kept"))
