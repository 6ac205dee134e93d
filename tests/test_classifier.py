"""Hashed linear scorer (operators/classifier.py) vs a pure-Python
reference of the same md5 weight derivation."""

import hashlib

from logging_spark.operators.classifier import hashed_linear_scores


def _w(tok: str, seed: str = "qmodel") -> int:
    return int(hashlib.md5((seed + tok).encode()).hexdigest()[:4], 16) - 32768


def test_scores_match_python_reference(spark):
    docs = [(1, "the cat sat on the mat"),
            (2, "single"),
            (3, ""),                      # zero tokens -> score 0
            (4, "   "),                   # whitespace-only -> score 0
            (5, "dup dup dup")]           # bag-of-words: dups count
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           hashed_linear_scores(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for doc_id, text in docs:
        toks = text.split()
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["score"] == sum(_w(t) for t in toks)
    assert got[5]["score"] == 3 * _w("dup")
    assert got[3]["score"] == 0 and got[4]["score"] == 0


def test_weights_are_signed_16bit(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(200)], "doc_id long, text string")
    rows = hashed_linear_scores(df, "doc_id", "text").collect()
    assert all(-32768 <= r["score"] <= 32767 for r in rows)
    # weights are not degenerate: both signs occur over 200 tokens
    assert any(r["score"] < 0 for r in rows)
    assert any(r["score"] > 0 for r in rows)
