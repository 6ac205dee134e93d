"""BPE pair counts (operators/bpe.py) and unigram surprisal band
filter (operators/surprisal.py) on hand-checkable fixtures."""

from __future__ import annotations

from pyspark.sql import Row

from logging_spark.operators.bpe import pair_counts
from logging_spark.operators.surprisal import (surprisal_band_keep,
                                               unigram_surprisal)


def test_pair_counts_adjacent_only(spark):
    df = spark.createDataFrame(
        [Row(text="a b a b c"), Row(text="b c"), Row(text="solo")])
    got = {r["pair"]: r["n"] for r in pair_counts(df).collect()}
    # "a b" twice (doc1), "b a" once, "b c" twice (doc1+doc2);
    # single-token doc contributes nothing
    assert got == {"a b": 2, "b a": 1, "b c": 2}


def test_pair_counts_topk_tiebreak(spark):
    df = spark.createDataFrame([Row(text="x y"), Row(text="a b")])
    top = pair_counts(df, k=1).collect()
    assert [(r["pair"], r["n"]) for r in top] == [("a b", 1)]


def test_unigram_surprisal_bit_exact(spark):
    # corpus: a a a b  -> total=4; sp(a)=len(bin(4//3))=1,
    # sp(b)=len(bin(4//1))=3
    df = spark.createDataFrame(
        [Row(doc_id="d1", text="a a a"), Row(doc_id="d2", text="b")])
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    assert got["d1"]["surprisal_sum"] == 3 and got["d1"]["mean_x100"] == 100
    assert got["d2"]["surprisal_sum"] == 3 and got["d2"]["mean_x100"] == 300


def test_surprisal_band_keep_flags(spark):
    df = spark.createDataFrame(
        [Row(doc_id="d1", text="a a a"), Row(doc_id="d2", text="b")])
    got = {r["doc_id"]: r["keep"]
           for r in surprisal_band_keep(df, 50, 150).collect()}
    assert got == {"d1": 1, "d2": 0}


def test_empty_token_docs_emit_no_row(spark):
    df = spark.createDataFrame([Row(doc_id="d1", text="a"),
                                Row(doc_id="d2", text="   ")])
    assert [r["doc_id"] for r in unigram_surprisal(df).collect()] == ["d1"]


def _bpe_brute(texts, n_merges):
    """Pure-Python greedy BPE at the word level, MERGE_JOIN joiner."""
    from collections import Counter
    from logging_spark.operators.bpe import MERGE_JOIN
    seqs = [t.split() for t in texts if t.split()]
    merges = []
    for r in range(n_merges):
        c = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                c[(a, b)] += 1
        if not c:
            break
        # max by (count, pair-text ascending as tie-break)
        best = min(c.items(), key=lambda kv: (-kv[1],
                                              kv[0][0] + " " + kv[0][1]))
        (left, right), n = best
        merges.append((r + 1, left, right, n))
        out = []
        for s in seqs:
            ns = []
            for x in s:
                if ns and ns[-1] == left and x == right:
                    ns[-1] = left + MERGE_JOIN + right
                else:
                    ns.append(x)
            out.append(ns)
        seqs = out
    return merges, seqs


def test_learn_merges_matches_brute_force(spark):
    from logging_spark.operators.bpe import apply_merges, learn_merges
    texts = ["the cat sat on the mat",
             "the cat ate the cat food",
             "on the mat the cat sat",
             "a b a b a b a b",
             "b a b a b a",
             ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = learn_merges(df, n_merges=4)
    want, want_seqs = _bpe_brute(texts, 4)
    assert got == want
    # inference twin: applying the learned table reproduces the
    # final training-state sequences (empty docs -> empty arrays)
    applied = [r.syms for r in apply_merges(df, got).collect()]
    assert [s for s in applied if s] == want_seqs


def test_apply_one_merge_overlap_is_greedy_left_to_right(spark):
    from logging_spark.operators.bpe import MERGE_JOIN, learn_merges, \
        apply_merges
    # a a a a: merge (a,a) pairs greedily -> [aa, aa]; the middle
    # overlap must NOT merge with the already-merged tail
    df = spark.createDataFrame([("a a a a a",)], "text string")
    m = learn_merges(df, n_merges=1)
    assert m == [(1, "a", "a", 4)]
    aa = "a" + MERGE_JOIN + "a"
    assert apply_merges(df, m).collect()[0].syms == [aa, aa, "a"]
