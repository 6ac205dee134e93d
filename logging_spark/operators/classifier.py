"""Model-based quality filtering as pure dataflow — the hashed
linear scorer (feature-hashing / "hashing trick").

Every serious pretraining pipeline gates documents with a cheap
learned classifier (fastText-style linear model over bag-of-words).
At 100 TB the inference plan matters more than the model: the scorer
must be a scan-side expression, not a per-row Python call. With
FEATURE HASHING there is no vocabulary table at all — each token's
weight is a pure function of its hash, so scoring is

    explode(tokens) -> weight(token) -> sum per doc

entirely inside whole-stage codegen, shuffling only (doc_id, weight
partials) via the map-side-combined sum. A real trained model swaps
`weight()` for a broadcast join against its (token, weight) table —
same plan shape, one BroadcastHashJoin added.

The weight function here is an md5-derived stand-in "model"
(deterministic, engine-portable — the same trick the simhash oracle
uses): w(tok) = int(md5(seed||tok)[:4 hex]) - 32768, i.e. a uniform
integer in [-32768, 32767]. Integer-exact end to end, so the oracle
value-checks the full inference pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logging_spark.functions import text as T


def token_weight(tok: Column | str, seed: str = "qmodel") -> Column:
    """Hash-derived signed 16-bit weight for a token (the stand-in
    pretrained embedding; portable: DuckDB twin is
    CAST('0x' || substring(md5(seed || tok), 1, 4) AS INT) - 32768)."""
    tok = F.col(tok) if isinstance(tok, str) else tok
    hx = F.substring(F.md5(F.concat(F.lit(seed), tok)), 1, 4)
    return (F.conv(hx, 16, 10).cast("long") - 32768).alias("w")


def hashed_linear_scores(df: DataFrame, id_col: str, text_col: str,
                         seed: str = "qmodel") -> DataFrame:
    """Per-document linear score: sum of hashed token weights
    (duplicate tokens count — bag-of-words). Output:
    (id_col, n_tokens, score). Docs with zero tokens score 0.

    One explode + one grouped sum on the doc id (map-side combined;
    the wide rows carry (id, weight) only — never text)."""
    tok = df.select(F.col(id_col),
                    F.explode_outer(T.tokens(text_col)).alias("_tok"))
    return (tok.groupBy(id_col)
            .agg(F.count("_tok").cast("long").alias("n_tokens"),
                 F.coalesce(F.sum(F.when(F.col("_tok").isNotNull(),
                                         token_weight("_tok", seed))),
                            F.lit(0)).cast("long").alias("score")))
