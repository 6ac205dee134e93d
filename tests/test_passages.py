"""global_passage_dedup: cross-corpus duplicate-span removal."""

from pyspark.sql import functions as F

from logging_spark.operators.passages import (global_passage_dedup,
                                              passage_occurrences)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_duplicate_span_kept_once_first_doc_wins(spark):
    # doc 1 and doc 2 share an identical 4-token window; doc 1 keeps it
    shared = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, f"{shared} one two three four"),
         (2, f"{shared} five six seven eight"),
         (3, "nine ten eleven twelve unique only here")],
        "doc_id long, text string")
    out = _rows(global_passage_dedup(df, window_tokens=4))
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["text_kept"] == "five six seven eight"
    assert out[3]["n_kept"] == out[3]["n_chunks"] == 2
    assert out[3]["text_kept"] == "nine ten eleven twelve unique only here"


def test_partial_tail_chunk_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"),      # 2 chunks at w=4: "a b c d", "e"
         (2, ""),               # zero chunks, survives as ''
         (3, "e")],             # its single chunk duplicates doc 1's tail
        "doc_id long, text string")
    out = _rows(global_passage_dedup(df, window_tokens=4))
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_chunks"] == 0 and out[2]["n_kept"] == 0
    assert out[2]["text_kept"] == ""
    assert out[3]["n_kept"] == 0 and out[3]["text_kept"] == ""


def test_reassembly_preserves_order(spark):
    # doc 20's middle chunk is doc 10's first chunk: removal must
    # splice, not reorder
    df = spark.createDataFrame(
        [(10, "x1 x2 y1 y2"),
         (20, "a1 a2 x1 x2 b1 b2")],
        "doc_id long, text string")
    out = _rows(global_passage_dedup(df, window_tokens=2))
    assert out[20]["text_kept"] == "a1 a2 b1 b2"
    assert out[10]["text_kept"] == "x1 x2 y1 y2"


def test_occurrence_frame_shape(spark):
    df = spark.createDataFrame([(7, "t1 t2 t3")], "doc_id long, text string")
    occ = passage_occurrences(df, window_tokens=2)
    rows = occ.orderBy("chunk_idx").collect()
    assert [r["chunk_idx"] for r in rows] == [0, 1]
    assert occ.columns == ["doc_id", "chunk_idx", "chunk_hash"]
    # hashes only — no text column survives into the wide stages
    assert all(len(r["chunk_hash"]) == 32 for r in rows)


def test_no_cross_join_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(8)],
        "doc_id long, text string")
    plan = global_passage_dedup(df, window_tokens=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
