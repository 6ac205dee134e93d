"""Ranking metrics (operators/ranking.py): integer-exact nDCG@k, MRR
and recall@k vs brute-force Python on randomized ranked lists."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row

from logging_spark.operators.ranking import (
    dcg_weights_x1e9, mrr, mrr_summary, ndcg_at_k, recall_at_k)


def _fixture(seed=7, n_queries=12, n_docs=25):
    rnd = random.Random(seed)
    rows = []
    for qi in range(n_queries):
        ranks = list(range(1, n_docs + 1))
        for rk in ranks:
            rel = rnd.choice([0, 0, 0, 1, 1, 2, 3])
            rows.append(Row(query=f"q{qi}", rank=rk, rel=rel,
                            gain=(1 << rel) - 1))
    return rows


def _brute_ndcg(rows, k):
    w9 = dcg_weights_x1e9(k)
    out = {}
    for q in {r.query for r in rows}:
        mine = [r for r in rows if r.query == q]
        dcg = sum(r.gain * w9[r.rank - 1] for r in mine if r.rank <= k)
        ideal = sorted((r.gain for r in mine), reverse=True)[:k]
        idcg = sum(g * w9[i] for i, g in enumerate(ideal))
        out[q] = (dcg * 1_000_000) // idcg if idcg > 0 else 0
    return out


def test_ndcg_matches_brute_force(spark):
    rows = _fixture()
    df = spark.createDataFrame(rows)
    got = {r["query"]: r["ndcg_x1e6"]
           for r in ndcg_at_k(df, "query", "rank", "gain", k=10).collect()}
    assert got == _brute_ndcg(rows, 10)
    # perfect ranking -> exactly 1e6
    perfect = [Row(query="p", rank=i, rel=0, gain=10 - i)
               for i in range(1, 11)]
    r = ndcg_at_k(spark.createDataFrame(perfect), "query", "rank",
                  "gain", k=10).collect()[0]
    assert r["ndcg_x1e6"] == 1_000_000


def test_weights_are_floor_of_true_values():
    for i, w in enumerate(dcg_weights_x1e9(20), start=1):
        assert w == math.floor(1e9 / math.log2(i + 1))
    assert dcg_weights_x1e9(3)[0] == 10**9  # 1/log2(2) == 1


def test_mrr_and_recall_match_brute_force(spark):
    rows = _fixture(seed=11)
    df = spark.createDataFrame(rows)
    got = {r["query"]: (r["first_rel_rank"], r["rr_x1e6"])
           for r in mrr(df, "query", "rank", "rel").collect()}
    for q in {r.query for r in rows}:
        mine = sorted((r for r in rows if r.query == q),
                      key=lambda r: r.rank)
        first = next((r.rank for r in mine if r.rel > 0), None)
        want = (first, 1_000_000 // first if first else 0)
        assert got[q] == want, q
    s = mrr_summary(df, "query", "rank", "rel").collect()[0]
    assert s["n_queries"] == 12
    assert s["mrr_x1e6"] == sum(v for _, v in got.values()) // 12

    k = 5
    rec = {r["query"]: r["recall_x1e6"]
           for r in recall_at_k(df, "query", "rank", "rel", k=k).collect()}
    for q in {r.query for r in rows}:
        mine = [r for r in rows if r.query == q]
        tot = sum(1 for r in mine if r.rel > 0)
        top = sum(1 for r in mine if r.rel > 0 and r.rank <= k)
        if tot:
            assert rec[q] == (top * 1_000_000) // tot, q
        else:
            assert q not in rec
