"""Sequence packing (operators/pack.py)."""

from logging_spark.operators.pack import pack_chunks


def test_pack_chunks_greedy_per_doc(spark):
    # doc 1: tokens 40,40,40,40 -> cum-before 0,40,80,120 -> packs 0,0,0,1
    # doc 2 restarts at pack 0 regardless of doc 1's fill
    rows = [(1, 0, 40), (1, 1, 40), (1, 2, 40), (1, 3, 40),
            (2, 0, 90), (2, 1, 30)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    got = {(r["doc_id"], r["chunk_idx"]): r["pack_idx"]
           for r in pack_chunks(df, budget=100).collect()}
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 0, (1, 3): 1,
                   (2, 0): 0, (2, 1): 0}


def test_pack_chunk_overflows_by_at_most_one_chunk(spark):
    # a chunk is assigned where its FIRST token lands: 90+30 stays in
    # pack 0 (overflow 20), the next chunk starts pack 1
    rows = [(1, 0, 90), (1, 1, 30), (1, 2, 10)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    got = [r["pack_idx"] for r in
           pack_chunks(df, budget=100).orderBy("chunk_idx").collect()]
    assert got == [0, 0, 1]


def test_pack_empty_and_exact_boundary(spark):
    # zero-token chunks stay in the current pack; an exact-budget fill
    # closes the pack (cum_before = budget -> next pack)
    rows = [(1, 0, 100), (1, 1, 0), (1, 2, 1)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens int")
    got = [r["pack_idx"] for r in
           pack_chunks(df, budget=100).orderBy("chunk_idx").collect()]
    assert got == [0, 1, 1]
