"""Ranking-quality metrics for retrieval evaluation: nDCG@k, MRR and
recall@k over pre-ranked (query, rank, relevance) tables — the missing
third leg next to the BM25/TF-IDF retrievers (operators/bm25.py,
operators/tfidf.py) and the recall-style audits the repo already has
for ANN (LSH recall as a query).

Everything is integer-exact, which makes the metrics oracle-checkable
without any deterministic-double ceremony:

- the DCG position weights 1/log2(i+1) are NOT correctly-rounded
  library calls in either engine; instead they are baked once in
  Python as ``floor(1e9 / log2(i+1))`` BIGINT constants and embedded
  verbatim in both the Spark expression and the DuckDB oracle, so
  DCG_x1e9 = sum(gain * w9[rank]) is an exact commutative integer sum
  (gain <= 2^6, k <= 20: no overflow anywhere near BIGINT);
- nDCG_x1e6 = (DCG_x1e9 * 1e6) DIV IDCG_x1e9 — one integral division,
  Spark DIV == DuckDB ``//`` (both truncate toward zero; values are
  nonnegative here anyway);
- MRR rides rr_x1e6 = 1e6 DIV first_relevant_rank.

Scale: one groupBy per metric over (query) — partial aggregation
map-side, the exchange carries one row per query. The ideal-DCG
ranking is a window over (query) only: same partitioning as the
aggregate, one sort, no extra exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dcg_weights_x1e9(k: int) -> list[int]:
    """floor(1e9 / log2(i+1)) for i = 1..k — THE constants shared by
    operator and oracle (embed these literal values in the SQL)."""
    return [math.floor(1e9 / math.log2(i + 1)) for i in range(1, k + 1)]


def _w9_case(col: str, k: int) -> str:
    ws = dcg_weights_x1e9(k)
    cases = " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(ws))
    return f"CASE {col} {cases} ELSE 0 END"


def ndcg_at_k(df: DataFrame, query_col: str, rank_col: str,
              gain_col: str, k: int = 10) -> DataFrame:
    """Per-query nDCG@k from a pre-ranked table (1-based ``rank_col``,
    integer ``gain_col`` — pass 2^rel - 1 upstream for exponential
    gain). Output: query, n_ranked, dcg_x1e9, idcg_x1e9, ndcg_x1e6.

    IDCG places the k largest gains on the best positions; ties in
    gain contribute identically in any order, so the ideal ranking
    window needs no tiebreak column to stay deterministic.
    """
    per = df.select(
        F.col(query_col).alias("query"),
        F.col(rank_col).cast("int").alias("_rk"),
        F.col(gain_col).cast("long").alias("_g"))
    wi = Window.partitionBy("query").orderBy(F.col("_g").desc())
    scored = per.withColumn("_irk", F.row_number().over(wi)).select(
        "query", "_g",
        F.expr(_w9_case("_rk", k)).alias("_w"),
        F.expr(_w9_case("_irk", k)).alias("_iw"))
    agg = scored.groupBy("query").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(F.col("_g") * F.col("_w")).cast("long").alias("dcg_x1e9"),
        F.sum(F.col("_g") * F.col("_iw")).cast("long").alias("idcg_x1e9"))
    return agg.selectExpr(
        "query", "n_ranked", "dcg_x1e9", "idcg_x1e9",
        "CASE WHEN idcg_x1e9 > 0 THEN (dcg_x1e9 * 1000000) DIV idcg_x1e9 "
        "ELSE CAST(0 AS BIGINT) END AS ndcg_x1e6")


def mrr(df: DataFrame, query_col: str, rank_col: str,
        rel_col: str) -> DataFrame:
    """Mean reciprocal rank: per-query rr_x1e6 = 1e6 DIV rank of the
    FIRST relevant result (0 when none), plus the macro mean on one
    summary row via a grouping-sets-free second aggregate. Output:
    one row per query (query, first_rel_rank, rr_x1e6) — take
    ``mrr_summary`` for the corpus-level number."""
    per = (df.select(F.col(query_col).alias("query"),
                     F.col(rank_col).cast("long").alias("_rk"),
                     F.col(rel_col).cast("int").alias("_rel"))
           .groupBy("query")
           .agg(F.min(F.when(F.col("_rel") > 0, F.col("_rk")))
                .alias("first_rel_rank")))
    return per.selectExpr(
        "query", "first_rel_rank",
        "CASE WHEN first_rel_rank IS NOT NULL THEN "
        "1000000 DIV first_rel_rank ELSE CAST(0 AS BIGINT) END AS rr_x1e6")


def mrr_summary(df: DataFrame, query_col: str, rank_col: str,
                rel_col: str) -> DataFrame:
    """One row: n_queries, mrr_x1e6 = sum(rr) DIV n (macro average)."""
    per = mrr(df, query_col, rank_col, rel_col)
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.expr("CAST(sum(rr_x1e6) AS BIGINT) DIV count(1)")
        .cast("long").alias("mrr_x1e6"))


def recall_at_k(df: DataFrame, query_col: str, rank_col: str,
                rel_col: str, k: int = 10) -> DataFrame:
    """Per-query recall@k = |relevant in top k| / |relevant|, x1e6.
    Queries with no relevant docs are excluded (recall undefined)."""
    per = (df.select(F.col(query_col).alias("query"),
                     F.col(rank_col).cast("long").alias("_rk"),
                     F.col(rel_col).cast("int").alias("_rel"))
           .groupBy("query")
           .agg(F.sum(F.expr(f"CAST(_rel > 0 AND _rk <= {k} AS BIGINT)"))
                .cast("long").alias("rel_topk"),
                F.sum(F.expr("CAST(_rel > 0 AS BIGINT)"))
                .cast("long").alias("rel_total")))
    return (per.where("rel_total > 0")
            .selectExpr("query", "rel_topk", "rel_total",
                        "(rel_topk * 1000000) DIV rel_total "
                        "AS recall_x1e6"))
