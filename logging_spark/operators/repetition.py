"""Corpus-scale Gopher repetition signals: explode + count + aggregate.

Batch twin of `functions.text.ngram_repetition` (same five integer
outputs per document — see that docstring for the Gopher rule mapping,
arXiv:2112.11446 §A.1.1). The column-expression version is convenient
inside single-projection chains, but even `let`-bound its per-row count
table is O(distinct × total) string comparisons, interpreted (HOFs
never reach codegen). This operator restates the same counting as
relational algebra so Catalyst keeps the whole thing in whole-stage
codegen:

    explode(ngrams)  ->  groupBy(id, gram).count()  ->  groupBy(id).agg

Scale shape (100 TB corpus): the document body is dropped at the first
projection — only (id, gram) pairs shuffle, and both aggregations are
hash aggregates with map-side partial combine, so shuffle volume is
~the distinct-gram footprint per doc, not the corpus. Cost is
O(total grams) per row vs the expression twin's O(distinct × total ×
tokenize). Capped rows (token_count > max_tokens) never explode —
their gram list is NULLed before the flatMap — and surface as NULL
signals, exactly like the expression twin.

Output tie-break matches the twin bit-for-bit: the top gram is
max(struct(cnt, gram)) — highest count, then lexicographically largest
gram — the total order the DuckDB oracle mirrors with
ORDER BY c DESC, gram DESC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions.text import ngrams, token_count


def repetition_signals(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 2,
                       max_tokens: int = 2_000) -> DataFrame:
    """(id, n_grams, top_cnt, top_gram, top_chars, dup_chars) per doc.

    Empty/short docs (fewer than n tokens) yield (0, NULL, NULL, NULL,
    0); docs past `max_tokens` yield all-NULL (un-scorable, like the
    expression twin's NULL struct). One row out per row in.
    """
    capped = (token_count(text_col) > max_tokens).alias("capped")
    grams = F.when(capped, F.lit(None)).otherwise(ngrams(text_col, n))
    # materialize BOTH computed columns in their own projection below
    # the Generate: handing raw expressions to the explode select makes
    # the post-Generate projection recompute `capped` (a fresh regex
    # split) per EXPLODED row, not per document — measured 4.3 s vs
    # 1.4 s on 5k docs × ~53 grams
    pre = df.select(F.col(id_col), capped, grams.alias("_grams"))
    ex = pre.select(
        id_col, "capped",
        F.explode_outer("_grams").alias("gram"),
    )
    # count(gram) skips NULL, so a doc with no grams keeps one marker
    # row with cnt = 0 through both aggregates
    cnt = ex.groupBy(id_col, "capped", "gram").agg(
        F.count("gram").alias("cnt"))
    agg = cnt.groupBy(id_col, "capped").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.max(F.when(F.col("gram").isNotNull(), F.struct(
            F.col("cnt").alias("cnt"), F.col("gram").alias("gram"),
        ))).alias("top"),
        F.sum(F.when(F.col("cnt") > 1,
                     F.col("cnt") * F.length("gram"))
              .otherwise(F.lit(0))).cast("long").alias("dup_chars"),
    )
    null_l = F.lit(None).cast("long")
    return agg.select(
        id_col,
        F.when(F.col("capped"), null_l)
         .otherwise(F.col("n_grams")).alias("n_grams"),
        F.col("top.cnt").cast("long").alias("top_cnt"),
        F.col("top.gram").alias("top_gram"),
        (F.col("top.cnt").cast("long")
         * F.length("top.gram").cast("long")).alias("top_chars"),
        F.when(F.col("capped"), null_l)
         .otherwise(F.col("dup_chars")).alias("dup_chars"),
    )
