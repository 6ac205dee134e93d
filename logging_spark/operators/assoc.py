"""Token co-occurrence / association mining over a document corpus.

PMI-family statistics are the standard corpus-analysis signal for
collocation discovery and template detection; at training-data scale
they also expose boilerplate (pairs with lift >> 1 across millions of
docs are navigation chrome, license headers, ...). The log-free LIFT
form keeps everything integer-exact for the oracle contract:

    lift = P(a,b) / (P(a) P(b)) = n_ab * N / (n_a * n_b)

reported in integer percent via the repo's integral-ratio idiom
(x100 then DIV — Spark `a DIV b` == DuckDB `a // b`).

Scale shape: pair GENERATION is per-document over the distinct-token
array (a `let`-bound nested transform — zero shuffle, O(k^2) per doc
bounded by `max_tokens`), so the only exchanges are the two groupBys
on (tok_a, tok_b) and tok. The corpus' text bodies never shuffle; the
wide stages carry token pairs only. A vocabulary cap (`max_tokens`
rarest-first would need a df pass; here positional first-k) bounds
degenerate documents exactly like ngram_repetition's NULL-past-cap
guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.functions.expr import let
from logging_spark.functions.text import tokens


def token_pairs(text, max_tokens: int = 64):
    """array<struct<tok_a,tok_b>>: all unordered distinct-token pairs
    (tok_a < tok_b) of the first `max_tokens` distinct tokens. The
    sorted-distinct array is let-bound so the tokenizer runs once per
    row, and both nested transforms read lambda VARIABLES (see
    functions/expr.let — an unbound expression here would re-tokenize
    per pair)."""
    def body(toks):
        return F.flatten(F.transform(
            toks,
            lambda x: F.transform(
                F.filter(toks, lambda y: y > x),
                lambda y: F.struct(x.alias("tok_a"), y.alias("tok_b")))))

    return let(
        F.slice(F.array_sort(F.array_distinct(tokens(text))),
                1, max_tokens),
        body)


def token_lift(
    docs: DataFrame,
    text_col: str = "text",
    min_support: int = 5,
    max_tokens: int = 64,
) -> DataFrame:
    """(tok_a, tok_b, n_xy, lift_pct): document-level co-occurrence
    lift for every unordered token pair appearing in >= min_support
    documents. lift_pct = n_xy * n_docs * 100 DIV (n_x * n_y) —
    100 = independence, > 100 = positive association."""
    base = docs.select(token_pairs(F.col(text_col), max_tokens).alias("_p"),
                       F.array_distinct(tokens(F.col(text_col))).alias("_t"))
    base = base.localCheckpoint(eager=False)  # pairs + singles + count share it
    n_docs = base.select(F.count(F.lit(1)).alias("n_docs"))
    pair_counts = (base.select(F.explode("_p").alias("p"))
                   .groupBy(F.col("p.tok_a").alias("tok_a"),
                            F.col("p.tok_b").alias("tok_b"))
                   .agg(F.count(F.lit(1)).alias("n_xy"))
                   .where(F.col("n_xy") >= min_support))
    tok_counts = (base.select(F.explode("_t").alias("tok"))
                  .groupBy("tok").agg(F.count(F.lit(1)).alias("n_t")))
    ta = tok_counts.select(F.col("tok").alias("tok_a"),
                           F.col("n_t").alias("_na"))
    tb = tok_counts.select(F.col("tok").alias("tok_b"),
                           F.col("n_t").alias("_nb"))
    return (pair_counts
            .join(F.broadcast(ta), "tok_a")
            .join(F.broadcast(tb), "tok_b")
            .crossJoin(F.broadcast(n_docs))
            .select("tok_a", "tok_b", F.col("n_xy").cast("long").alias("n_xy"),
                    F.expr("CAST((n_xy * n_docs * 100) DIV (_na * _nb)"
                           " AS BIGINT)").alias("lift_pct")))
