"""Unit tests for operators/bm25.py and operators/kmeans.py against
pure-Python brute-force references using the SAME integer rules."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logging_spark.operators.bm25 import SCALE, bm25_scores, bm25_topk
from logging_spark.operators.kmeans import kmeans_assign, kmeans_summary


def _bm25_brute(docs, queries, k1_x10=12, b_x100=75, scale=SCALE):
    # token-less docs are excluded from the corpus stats, mirroring
    # the operator's where(size > 0)
    toks = {d: t.split() for d, t in docs if t.split()}
    dl = {d: len(ts) for d, ts in toks.items()}
    n, s = len(toks), sum(dl.values())
    if n == 0:
        return {}
    avgdl_x100 = (100 * s) // n
    out = {}
    for qid, qtext in queries:
        for term in sorted(set(qtext.lower().split())):
            hits = {d: ts.count(term) for d, ts in toks.items()
                    if term in ts}
            if not hits:
                continue
            df = len(hits)
            idf = (n * scale) // df
            for d, tf in hits.items():
                core = (100000 * tf * (k1_x10 + 10) * avgdl_x100) // (
                    1000 * tf * avgdl_x100
                    + k1_x10 * (100 - b_x100) * avgdl_x100
                    + 100 * k1_x10 * b_x100 * dl[d])
                out[(qid, d)] = out.get((qid, d), 0) + idf * core
    return out


def test_bm25_matches_brute_force(spark):
    docs = [(0, "red fox jumps over the red dog"),
            (1, "red red red red"),
            (2, "the quick brown fox"),
            (3, "dog sleeps"),
            (4, "fox fox dog red quick")]
    queries = [("qa", "red fox"), ("qb", "quick dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.query_id, r.doc_id): r.score
           for r in bm25_scores(df, queries).collect()}
    assert got == _bm25_brute(docs, queries)


def test_bm25_topk_rank_and_saturation(spark):
    # tf saturation: doc 1 (4x 'red', short) must not beat doc 0
    # 4x over — and ranks are dense 1..k with doc-id tie-breaks
    docs = [(0, "red fox"), (1, "red red red red red red red red"),
            (2, "red fox"), (3, "blue")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk(df, [("q", "red fox")], k=3).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    # docs 0 and 2 are identical: tie broken by doc_id
    ranked = [r.doc_id for r in rows]
    assert ranked.index(0) < ranked.index(2)


def _kmeans_brute(vecs, k, rounds, scale=10_000):
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(
        np.int64)
    cent = {c: q[c].copy() for c in range(k)}
    assign, dist = {}, {}
    for r in range(rounds):
        for i in range(len(q)):
            best = min(((int(((q[i] - cv) ** 2).sum()), c)
                        for c, cv in cent.items()))
            dist[i], assign[i] = best
        if r < rounds - 1:
            cent = {}
            for c in set(assign.values()):
                members = [i for i in assign if assign[i] == c]
                sums = np.sum([q[i] for i in members], axis=0,
                              dtype=np.int64)
                # TRUNCATING integer mean: Spark DIV and DuckDB //
                # both truncate toward zero (Python // floors)
                cent[c] = np.sign(sums) * (np.abs(sums)
                                           // len(members))
    return assign, dist


def test_kmeans_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    vecs = np.concatenate([
        rng.normal(0.5, 0.05, (10, 8)),
        rng.normal(-0.5, 0.05, (10, 8)),
        rng.normal(0.0, 0.05, (10, 8))]).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.cluster, r.dist)
           for r in kmeans_assign(df, k=3, rounds=3).collect()}
    assign, dist = _kmeans_brute(vecs, k=3, rounds=3)
    assert got == {i: (assign[i], dist[i]) for i in assign}
    # summary is consistent with the assignment
    summ = {r.cluster: (r.n, r.inertia)
            for r in kmeans_summary(df, k=3, rounds=3).collect()}
    for c in summ:
        members = [i for i in assign if assign[i] == c]
        assert summ[c] == (len(members),
                           sum(dist[i] for i in members))


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["red", "fox", "dog", "the", "run", "blue"])


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(st.lists(_word, min_size=0, max_size=12),
                     min_size=1, max_size=12),
       qterms=st.lists(_word, min_size=1, max_size=3))
def test_bm25_property_matches_brute(spark_prop, docs, qterms):
    spark = spark_prop
    texts = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    queries = [("q", " ".join(qterms))]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {(r.query_id, r.doc_id): r.score
           for r in bm25_scores(df, queries).collect()}
    assert got == _bm25_brute(texts, queries)


@settings(max_examples=8, deadline=None)
@given(st.data())
def test_kmeans_property_matches_brute(spark_prop, data):
    spark = spark_prop
    n = data.draw(st.integers(min_value=4, max_value=20))
    dim = data.draw(st.integers(min_value=2, max_value=6))
    vecs = [[data.draw(st.floats(min_value=-1, max_value=1,
                                 allow_nan=False, width=32))
             for _ in range(dim)] for _ in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.cluster, r.dist)
           for r in kmeans_assign(df, k=3, rounds=2).collect()}
    assign, dist = _kmeans_brute(vecs, k=3, rounds=2)
    assert got == {i: (assign[i], dist[i]) for i in assign}


def test_rrf_fuse_missing_docs_and_order(spark):
    from logging_spark.operators.fusion import rrf_fuse
    r1 = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)],
                               "doc_id string, rank long")
    r2 = spark.createDataFrame([("c", 1), ("a", 2)],
                               "doc_id string, rank long")
    got = {r.doc_id: (r.rrf_score, r.n_lists)
           for r in rrf_fuse([r1, r2], k=60).collect()}
    s = 1_000_000
    assert got == {
        "a": (s // 61 + s // 62, 2),
        "b": (s // 62, 1),          # absent from r2: contributes 0
        "c": (s // 63 + s // 61, 2),
    }
    # consensus doc (a) outranks the single-list doc even though b
    # holds the same rank-2 slot in its list
    assert got["a"][0] > got["b"][0]


def test_semdedup_drops_near_parallel_cellmates(spark):
    """Crafted geometry: ids 0-3 seed 4 cells; 4 extra vectors are
    near-copies of seeds 0/1 (must drop, first-wins) or near-opposite
    (d < 0: must survive even though |cos| is large)."""
    from logging_spark.operators.kmeans import semdedup_summary
    import numpy as np
    rng = np.random.RandomState(7)
    seeds = [np.eye(8)[i] for i in range(4)]
    rows = [(i, seeds[i].tolist()) for i in range(4)]
    rows.append((4, (seeds[0] * 0.9 + 0.01).tolist()))   # ~cos 1 to 0
    rows.append((5, (seeds[1] * 0.7 + 0.02).tolist()))   # ~cos 1 to 1
    rows.append((6, (-seeds[2]).tolist()))               # cos -1 to 2
    rows.append((7, (rng.rand(8) * 0.05 + seeds[3] * 0.0
                     + np.eye(8)[7]).tolist()))          # own direction
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    out = {r["cluster"]: (r["n"], r["n_dropped"])
           for r in semdedup_summary(df, k=4, rounds=2,
                                     sim_p=4, sim_q=5).collect()}
    # clusters of seeds 0 and 1 each contain one near-duplicate
    total_n = sum(n for n, _ in out.values())
    total_drop = sum(d for _, d in out.values())
    assert total_n == 8
    assert total_drop == 2  # ids 4 and 5 only; 6 (antiparallel) kept


def test_phrase_hits_overlapping_and_order(spark):
    from logging_spark.operators.bm25 import phrase_hits
    docs = [(0, "a a a b"),        # 'a a' occurs at pos 0 and 1
            (1, "b a b a"),        # never adjacent 'a a'
            (2, "x a a y a a"),    # two occurrences
            (3, "a")]              # too short
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_hits(df, "a a").collect()}
    assert got == {0: 2, 2: 2}


def test_phrase_hits_three_terms(spark):
    from logging_spark.operators.bm25 import phrase_hits
    docs = [(0, "the quick brown fox"), (1, "quick brown dog"),
            (2, "the quick red brown fox")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_hits(df, "quick brown fox").collect()}
    assert got == {0: 1}
