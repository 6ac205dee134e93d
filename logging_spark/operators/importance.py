"""DSIR-flavored importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al., arXiv:2302.03169
— public methodology) scores every corpus document by how much its
hashed n-gram distribution looks like a TARGET corpus relative to the
BACKGROUND corpus, then samples by that weight. This module computes
the scores with exact integer arithmetic so selection is reproducible
on any engine/cluster and the DuckDB oracle matches bit-for-bit:

  bucket(gram)  = md5-60bit(seed:gram) mod buckets   (fixed feature dim)
  weight(b)     = floor((target_count[b]+1) * SCALE / (background_count[b]+1))
                  — an add-1-smoothed likelihood ratio in fixed point
  score(doc)    = sum over the doc's grams of weight(bucket(gram))

(The reference paper uses log-ratios; a fixed-point linear ratio keeps
the ranking monotone per bucket while staying integer-exact, which is
what makes the selection auditable — the float-log variant is a
one-line swap where auditability doesn't matter.)

Scale shape: two bucket-count aggregations (output = `buckets` rows,
constant), a broadcast join of that tiny weight table onto the corpus
gram stream (narrow), and one per-doc sum keyed on the uniform doc id.
Document text never shuffles; the only wide deps are count-shuffles of
(bucket) and (doc_id) keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logging_spark.functions.text import ngrams

SCALE = 1_000_000


def gram_bucket(gram: Column, buckets: int, seed: str = "dsir") -> Column:
    """Hash a gram into [0, buckets): md5-based (engine-portable),
    60-bit positive so pmod == % on every engine."""
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), gram)), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def doc_gram_buckets(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 2,
                     buckets: int = 4096, seed: str = "dsir") -> DataFrame:
    """(id, bucket) per word n-gram occurrence (repeats kept — DSIR
    features are counts, not sets)."""
    return (df.select(F.col(id_col),
                      F.explode(ngrams(text_col, n)).alias("_g"))
            .select(F.col(id_col),
                    gram_bucket(F.col("_g"), buckets, seed).alias("_b")))


def bucket_weights(target: DataFrame, background: DataFrame,
                   text_col: str = "text", n: int = 2,
                   buckets: int = 4096, seed: str = "dsir") -> DataFrame:
    """(bucket, weight) — the fixed-point smoothed likelihood ratio
    table. Only `buckets` rows: broadcast it."""
    tc = (doc_gram_buckets(target, text_col=text_col, n=n,
                           buckets=buckets, seed=seed)
          .groupBy("_b").agg(F.count(F.lit(1)).alias("_tc")))
    bc = (doc_gram_buckets(background, text_col=text_col, n=n,
                           buckets=buckets, seed=seed)
          .groupBy("_b").agg(F.count(F.lit(1)).alias("_bc")))
    # left join: background buckets only — callers join corpus grams
    # against this table, and the background is (by default) the corpus
    # itself, so every probed bucket exists
    return (bc.join(tc, "_b", "left")
            .select("_b", F.expr(
                f"((coalesce(_tc, 0L) + 1L) * {SCALE}L) "
                f"div (_bc + 1L)").alias("_w")))


def importance_scores(corpus: DataFrame, target: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 2, buckets: int = 4096,
                      seed: str = "dsir") -> DataFrame:
    """(id, n_grams, score): per-document DSIR importance score against
    the target distribution, background = the corpus itself. Rank or
    threshold on `score` (compose with sample.deterministic_sample for
    the resampling step); docs shorter than n tokens have no features
    and are absent by definition."""
    w = bucket_weights(target, corpus, text_col=text_col, n=n,
                       buckets=buckets, seed=seed)
    docs = doc_gram_buckets(corpus, id_col=id_col, text_col=text_col,
                            n=n, buckets=buckets, seed=seed)
    return (docs.join(F.broadcast(w), "_b")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum("_w").alias("score")))


def importance_weighted_sample(
    corpus: DataFrame,
    target: DataFrame,
    rate_ppm: int = 250_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    seed: str = "dsir",
    sample_seed: str = "dsir-rs",
) -> DataFrame:
    """(id, score): the DSIR RESAMPLING step — keep each document with
    probability proportional to its importance score, expected keep
    rate = rate_ppm/10⁶. Deterministic Bernoulli via the repo's md5
    threshold trick: u = md5(seed:id) mod 10⁶, keep iff
    u · ΣW < score · rate_ppm · n — pure integer comparison, so
    membership is a function of (seed, id, corpus) reproducible on any
    engine, and docs with score ≥ mean/rate are always kept (the
    implicit probability cap). The score total rides a 1-row broadcast.

    Overflow headroom: u < 10⁶ and fixture-scale ΣW keep every product
    under 2⁶³ (ANSI mode would error, not wrap, if violated); at
    10⁹+ docs cast the comparison operands to decimal(38,0) — same
    integers, wider lanes."""
    scored = importance_scores(corpus, target, id_col=id_col,
                               text_col=text_col, n=n, buckets=buckets,
                               seed=seed)
    tot = scored.agg(F.sum("score").alias("_W"),
                     F.count(F.lit(1)).alias("_n"))
    u = F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit(sample_seed), F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("long"),
        F.lit(1_000_000))
    return (scored.crossJoin(F.broadcast(tot))
            .where(u * F.col("_W")
                   < F.col("score") * F.lit(rate_ppm) * F.col("_n"))
            .select(id_col, "score"))


def ess_audit(df: DataFrame, weight_col: str,
              by: list[str] | None = None) -> DataFrame:
    """Kish effective sample size of a weight column: ESS =
    (sum w)^2 / sum w^2 — THE diagnostic for importance weighting
    (DSIR scores, raking weights, temperature mixing): ESS << n means
    a few heavy documents dominate the weighted objective and the
    selection is effectively tiny however large n looks.

    Exact integers end to end: both sums ride DECIMAL(38,0) (ppm-scale
    weights over 1e8 rows put (sum w)^2 far past BIGINT; decimal DIV's
    BIGINT quotient is exact because ESS <= n), output ess_x100 and
    ess_ratio_ppm = ESS/n. Zero-weight groups report ess 0.
    One map-side-combined aggregate per group.
    """
    by = list(by or [])
    g = df.groupBy(*by) if by else df.groupBy()
    agg = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("_s1"),
        F.sum((F.col(weight_col).cast("decimal(38,0)")
               * F.col(weight_col))).alias("_s2"))
    return agg.selectExpr(
        *by, "n",
        "CAST(_s1 AS BIGINT) AS sum_w",
        "CASE WHEN _s2 > 0 THEN (_s1 * _s1 * 100) DIV _s2 "
        "ELSE CAST(0 AS BIGINT) END AS ess_x100",
        "CASE WHEN _s2 > 0 THEN (_s1 * _s1 * 1000000) DIV (_s2 * n) "
        "ELSE CAST(0 AS BIGINT) END AS ess_ratio_ppm")
