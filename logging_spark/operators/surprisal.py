"""Unigram surprisal scoring: a perplexity-style quality filter with
integer-exact arithmetic.

CCNet-style pipelines keep the MIDDLE perplexity band of a corpus
(too low = boilerplate, too high = garbage). A full LM isn't needed
for the filter to work — a unigram model over the corpus's own
vocabulary separates the same tails. The portability twist: token
surprisal is computed as `length(bin(total DIV count))`, i.e.
floor(log2(total/count)) + 1 — pure integer bit-length, bit-exact in
both Spark and DuckDB, where float log() would diverge in the last
ulp and flip rows at a percentile boundary.

Plan shape (two shuffles, both on narrow rows):

1. explode tokens -> (doc_id, tok); vocabulary = groupBy(tok) with
   map-side combine (the exchange carries distinct tokens per
   partition, not token instances);
2. corpus total rides a broadcast single-row aggregate (crossJoin
   against one row — never a single-partition window);
3. token stream joins the surprisal table on `tok` (broadcast when
   the vocab fits, shuffle-hash otherwise — Zipf makes the vocab
   orders of magnitude smaller than the stream), then one
   groupBy(doc_id) sum.

Scores are (surprisal_sum, n_tokens, mean_x100 = sum*100 DIV n);
empty-token docs have no rows (no tokens, no evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions import text as T


def unigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, n_tokens, surprisal_sum, mean_x100): per-doc unigram
    surprisal under the corpus's own token distribution."""
    toks = df.select(F.col(id_col), F.explode(T.tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_total"))
    sp = (vocab.crossJoin(F.broadcast(total))
          .select("tok",
                  F.length(F.bin(F.expr("_total DIV _cnt"))).cast("long")
                  .alias("_sp")))
    return (toks.join(sp, "tok")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum("_sp").cast("long").alias("surprisal_sum"))
            .withColumn("mean_x100",
                        F.expr("(surprisal_sum * 100) DIV n_tokens")
                        .cast("long")))


def surprisal_band_keep(df: DataFrame, lo_x100: int, hi_x100: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Scores + the CCNet-style keep flag: 1 iff mean surprisal sits
    inside the [lo, hi] band (x100 fixed-point, inclusive)."""
    s = unigram_surprisal(df, id_col, text_col)
    return s.withColumn(
        "keep",
        F.col("mean_x100").between(lo_x100, hi_x100).cast("int"))


def bigram_surprisal(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, surprisal_sum, mean_x100): per-doc CONDITIONAL
    bigram surprisal — floor(log2(count(w1) / count(w1 w2))) + 1 per
    bigram, the integer bit-length trick again. This is the KenLM-
    band substitute one rung up from the unigram filter: templated
    text (every w1 deterministically followed by the same w2) scores
    near 1; incoherent text (w2 nearly independent of w1) scores near
    the unigram surprisal of w2. count(w1) >= count(w1 w2) always, so
    DIV >= 1 and the bit-length is >= 1 — no zero/negative guards.

    Plan shape mirrors unigram_surprisal: two vocab aggregates
    (unigram + bigram, both map-side combined), the bigram table
    joins its w1 count once (vocab-sized join, not stream-sized),
    and the doc bigram stream joins the finished surprisal table.
    """
    toks = df.select(F.col(id_col),
                     F.explode(T.tokens(text_col)).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c1"))
    bg = df.select(F.col(id_col),
                   F.explode(T.ngrams(text_col, 2)).alias("g"))
    bvocab = bg.groupBy("g").agg(F.count(F.lit(1)).alias("_c2"))
    sp = (bvocab
          .join(uni, F.split(F.col("g"), " ").getItem(0)
                == F.col("tok"))
          .select("g", F.length(F.bin(F.expr("_c1 DIV _c2")))
                  .cast("long").alias("_sp")))
    return (bg.join(sp, "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                 F.sum("_sp").cast("long").alias("surprisal_sum"))
            .withColumn("mean_x100",
                        F.expr("surprisal_sum * 100 DIV n_bigrams")))


def backoff_trigram_score(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          min_count: int = 2) -> DataFrame:
    """Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation") — the next rung past
    bigram_surprisal and the standard web-scale stand-in for a
    smoothed LM: no normalization, just score S(w3|w1 w2) =

        c(w1 w2 w3) / c(w1 w2)                    if c3 >= min_count
        0.4 * c(w2 w3) / c(w2)                    elif c2 >= min_count
        0.4^2 * c(w3) / N                         otherwise

    with the canonical 0.4 backoff factor kept EXACT as rationals:
    tier-2 = (2*c * 1e6) DIV (5*c'), tier-3 = (4*c * 1e6) DIV (25*N)
    — ppm scores, no floats anywhere.

    Output per doc: n_trigrams, n_tier1/2/3 (how often the model had
    trigram/bigram/unigram evidence — templated text lives in tier 1,
    garbage in tier 3), score_sum_ppm, mean_ppm.

    Plan: three vocab aggregates (tri/bi/uni, all map-side combined),
    the instance stream joins tri once and bi twice (prefix + backoff
    bigram) and uni twice (w2, w3) — all equi-joins on Zipf-small gram
    keys; the corpus total rides a broadcast single-row aggregate.
    """
    toks = df.select(F.col(id_col),
                     F.explode(T.tokens(text_col)).alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.agg(F.sum("c1").alias("n_total"))
    tg = df.select(F.col(id_col),
                   F.explode(T.ngrams(text_col, 3)).alias("g3"))
    # derive the sub-grams AFTER the explode so the projection is not
    # re-run per generated row
    inst = tg.select(
        id_col, "g3",
        F.expr("substring_index(g3, ' ', 2)").alias("g2p"),
        F.expr("substring_index(g3, ' ', -2)").alias("g2s"),
        F.expr("element_at(split(g3, ' '), 2)").alias("w2"),
        F.expr("substring_index(g3, ' ', -1)").alias("w3"))
    tri = tg.groupBy("g3").agg(F.count(F.lit(1)).alias("c3"))
    bg = df.select(F.explode(T.ngrams(text_col, 2)).alias("g2"))
    bi = bg.groupBy("g2").agg(F.count(F.lit(1)).alias("c2"))
    j = (inst.join(tri, "g3")
         .join(bi.select(F.col("g2").alias("g2p"),
                         F.col("c2").alias("c2p")), "g2p")
         .join(bi.select(F.col("g2").alias("g2s"),
                         F.col("c2").alias("c2s")), "g2s", "left")
         .join(uni.select(F.col("tok").alias("w2"),
                          F.col("c1").alias("c1w2")), "w2")
         .join(uni.select(F.col("tok").alias("w3"),
                          F.col("c1").alias("c1w3")), "w3")
         .crossJoin(F.broadcast(total)))
    tier = (F.when(F.col("c3") >= min_count, F.lit(1))
            .when(F.coalesce("c2s", F.lit(0)) >= min_count, F.lit(2))
            .otherwise(F.lit(3)))
    score = (F.when(tier == 1,
                    F.expr("(c3 * 1000000) DIV c2p"))
             .when(tier == 2,
                   F.expr("(2 * c2s * 1000000) DIV (5 * c1w2)"))
             .otherwise(
                 F.expr("(4 * c1w3 * 1000000) DIV (25 * n_total)")))
    scored = j.select(id_col, tier.alias("_t"),
                      score.cast("long").alias("_s"))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"),
                 F.sum(F.expr("CAST(_t = 1 AS BIGINT)")).cast("long")
                 .alias("n_tier1"),
                 F.sum(F.expr("CAST(_t = 2 AS BIGINT)")).cast("long")
                 .alias("n_tier2"),
                 F.sum(F.expr("CAST(_t = 3 AS BIGINT)")).cast("long")
                 .alias("n_tier3"),
                 F.sum("_s").cast("long").alias("score_sum_ppm"))
            .withColumn("mean_ppm",
                        F.expr("score_sum_ppm DIV n_trigrams")
                        .cast("long")))
