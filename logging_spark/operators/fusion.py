"""Reciprocal-rank fusion (RRF) — combine any number of top-k
rankings into one, rank-based (Cormack/Clarke/Buettcher, the industry
default for fusing lexical + vector retrieval).

rrf(d) = sum over lists L of SCALE DIV (k + rank_L(d)); documents
missing from a list contribute 0. Integer fixed-point (single DIV per
list) so the fused ordering is engine-exact; ties break by id.

Scale shape: the inputs are TOP-K LISTS — bounded by construction
(k rows per ranker), so the fusion is a full-outer hash join of a few
k-row frames and never touches the corpus. Rankers that need a global
order produce their k rows via orderBy().limit(k) (TakeOrdered:
per-partition heaps + a k-row driver merge, no global sort); ranking
WITHIN a k-row list is a single-partition window over k rows, which
is bounded and fine — the anti-pattern is a single-partition window
over the corpus, not over a limit() result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def ranked_topk(df: DataFrame, order_cols: list, k: int,
                id_col: str = "doc_id") -> DataFrame:
    """(id, rank): the top-k rows by `order_cols` (ties must be broken
    by the caller including id in order_cols), ranked 1..k. limit(k)
    plans as TakeOrdered; the rank window runs over k rows only."""
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return (top.withColumn("rank", F.row_number().over(w))
            .select(id_col, F.col("rank").cast("long").alias("rank")))


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", scale: int = SCALE) -> DataFrame:
    """(id, rrf_score, n_lists): fused ranking over (id, rank)
    frames. Standard RRF with constant `k` (=60 in the paper)."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    out = None
    for i, r in enumerate(rankings):
        part = r.select(
            id_col,
            F.expr(f"CAST({scale} AS BIGINT) DIV ({k} + rank)")
            .alias(f"_s{i}"))
        out = part if out is None else out.join(part, id_col, "full_outer")
    score = sum(
        (F.coalesce(F.col(f"_s{i}"), F.lit(0))
         for i in range(len(rankings))), F.lit(0))
    n_lists = sum(
        (F.col(f"_s{i}").isNotNull().cast("int")
         for i in range(len(rankings))), F.lit(0))
    return out.select(F.col(id_col),
                      score.cast("long").alias("rrf_score"),
                      n_lists.cast("int").alias("n_lists"))
