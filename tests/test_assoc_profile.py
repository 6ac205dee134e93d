"""Round-4 operator units: token co-occurrence lift, equi-depth
histogram (no-global-sort plan), consecutive same-speaker merge,
and the kv_pairs Python UDTF."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.operators.assoc import token_lift  # noqa: E402
from logging_spark.operators.dedup import merge_consecutive  # noqa: E402
from logging_spark.operators.profile import equidepth_histogram  # noqa: E402


def test_token_lift_hand_computed(spark):
    # 4 docs; (a,b) together in 2 of 4, a in 3, b in 2:
    # lift = 2*4*100 // (3*2) = 133
    docs = spark.createDataFrame(
        [(1, "a b x"), (2, "a b"), (3, "a y"), (4, "b y" * 0 + "y")],
        "doc_id long, text string")
    out = {(r["tok_a"], r["tok_b"]): (r["n_xy"], r["lift_pct"])
           for r in token_lift(docs, min_support=2).collect()}
    assert out[("a", "b")] == (2, 133)


def test_token_lift_max_tokens_caps_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string")
    # cap=2 keeps only (a, b) as a pair candidate per doc
    out = token_lift(docs, min_support=2, max_tokens=2).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in out} == {("a", "b")}


def test_equidepth_histogram_balanced_counts(spark):
    df = spark.createDataFrame([(float(i),) for i in range(800)], "value double")
    out = {r["bucket"]: r["n"] for r in
           equidepth_histogram(df, "value", n_buckets=8).collect()}
    assert len(out) == 8
    assert sum(out.values()) == 800
    assert all(90 <= n <= 110 for n in out.values()), out


def test_equidepth_histogram_has_no_global_sort(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "value double")
    plan = equidepth_histogram(df, "value")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan  # ntile would be a single-partition sort


def test_merge_consecutive_blocks_and_text_order(spark):
    df = spark.createDataFrame(
        [("c", 1, "user", "t1"), ("c", 2, "user", "t2"),
         ("c", 3, "assistant", "t3"), ("c", 4, "user", "t4"),
         ("c", 5, "user", "t5"), ("c", 6, "user", "t6")],
        "conv_id string, turn_idx int, role string, text string")
    rows = sorted(merge_consecutive(df).collect(),
                  key=lambda r: r["block_idx"])
    assert [(r["block_idx"], r["role"], r["n_turns"], r["text"])
            for r in rows] == [
        (1, "user", 2, "t1\nt2"),
        (2, "assistant", 1, "t3"),
        (3, "user", 3, "t4\nt5\nt6"),
    ]


def test_kv_udtf_lateral_rows(spark):
    from logging_spark.functions import kv_udtf
    kv_udtf.register(spark)
    spark.createDataFrame(
        [("a=1 b=2 noise =bad c=x=y",), ("",)], "text string"
    ).createOrReplaceTempView("_t_kv")
    rows = {(r["key"], r["val"]) for r in spark.sql(
        "SELECT p.key, p.val FROM _t_kv t, LATERAL kv_pairs(t.text) p"
    ).collect()}
    # '=bad' (no key) and 'noise' (no '=') are skipped; value keeps
    # everything after the FIRST '='
    assert rows == {("a", "1"), ("b", "2"), ("c", "x=y")}


def test_ecdf_normalize_hand_computed(spark):
    from logging_spark.operators.profile import ecdf_normalize
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (2.0,), (3.0,)], "value double")
    out = {r["value"]: (r["n_rows"], r["cum_below"], r["pct_ppm"])
           for r in ecdf_normalize(df, "value").collect()}
    assert out[1.0] == (2, 0, 0)
    assert out[2.0] == (1, 2, 500000)
    assert out[3.0] == (1, 3, 750000)


def test_ecdf_normalize_no_global_sort_window(spark):
    from logging_spark.operators.profile import ecdf_normalize
    df = spark.createDataFrame([(float(i % 7),) for i in range(100)],
                               "value double")
    plan = (ecdf_normalize(df, "value")
            ._jdf.queryExecution().executedPlan().toString())
    # the cume_dist spelling would show Window + Exchange SinglePartition;
    # range partitioning is the parallel sort we want
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
