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
