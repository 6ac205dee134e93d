"""Round-4 operator units: trailing-context training-example assembly
and the salted two-phase aggregation (result-identical to plain
groupBy; plan shows the two-exchange shape)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.operators.examples import context_examples  # noqa: E402
from logging_spark.operators.skew import salted_agg  # noqa: E402


TURNS = [
    ("c1", 1, "user", "hi"),
    ("c1", 2, "assistant", "hello"),
    ("c1", 3, "user", "weather?"),
    ("c1", 4, "tool", "sunny"),
    ("c1", 5, "assistant", "it is sunny"),
    ("c2", 1, "assistant", "opening"),
]


def _turns(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, turn_idx int, role string, text string")


def test_context_examples_hand_computed(spark):
    out = {(r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
           for r in context_examples(_turns(spark), k=3).collect()}
    assert out[("c1", 2)] == ("user: hi", "hello")
    # k=3 window over turns 2..4, in turn order
    assert out[("c1", 5)] == (
        "assistant: hello\nuser: weather?\ntool: sunny", "it is sunny")
    # conversation-opening assistant turn: empty context, never NULL
    assert out[("c2", 1)] == ("", "opening")


def test_context_examples_k_bounds_frame(spark):
    out = {r["turn_idx"]: r["context"]
           for r in context_examples(_turns(spark), k=1).collect()}
    assert out[5] == "tool: sunny"


def test_salted_agg_matches_plain_groupby(spark):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(500)],
        "k int, uid int, v double")
    aggs = {"n": (F.count(F.lit(1)), "sum"),
            "sum_v": (F.sum(F.col("v").cast("long")), "sum"),
            "max_v": (F.max(F.col("v").cast("long")), "max")}
    salted = {r["k"]: (r["n"], r["sum_v"], r["max_v"])
              for r in salted_agg(df, ["k"], aggs, salt_from="uid",
                                  salt_buckets=8).collect()}
    plain = {r["k"]: (r["n"], r["sum_v"], r["max_v"])
             for r in df.groupBy("k").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("v").cast("long")).alias("sum_v"),
                 F.max(F.col("v").cast("long")).alias("max_v")).collect()}
    assert salted == plain


def test_salted_agg_rejects_non_decomposable(spark):
    df = spark.createDataFrame([(1, 2)], "k int, uid int")
    import pytest
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(df, ["k"], {"m": (F.median("uid"), "median")},
                   salt_from="uid")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_agg_plan_two_hash_exchanges(spark):
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k int, uid int")
    plan = _plan(salted_agg(df, ["k"], {"n": (F.count(F.lit(1)), "sum")},
                            salt_from="uid"))
    # partial (k, salt) agg + finalize (k) agg: exactly two hash
    # exchanges, and never a single-partition one
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, plan
    assert "Exchange SinglePartition" not in plan


def test_context_examples_plan_one_window_one_exchange(spark):
    plan = _plan(context_examples(_turns(spark), k=3))
    # one window sort over (conv, turn) — the bounded frame never
    # degenerates into a global sort or a second shuffle
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan
