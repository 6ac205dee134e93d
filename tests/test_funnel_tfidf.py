"""Funnel (operators/funnel.py) and TF-IDF (operators/tfidf.py) semantics."""

import datetime

from pyspark.sql import functions as F

from logging_spark.operators.funnel import funnel_counts, funnel_users
from logging_spark.operators.tfidf import tfidf_topk


def _ts(m):
    return datetime.datetime(2026, 1, 1, 0, m)


def _events(spark):
    rows = [
        # u1 completes the funnel in order
        ("u1", "signup", _ts(0)), ("u1", "click", _ts(1)),
        ("u1", "purchase", _ts(2)),
        # u2 clicks BEFORE signing up and never clicks after -> stops at step 1
        ("u2", "click", _ts(0)), ("u2", "signup", _ts(1)),
        ("u2", "purchase", _ts(2)),
        # u3's click is simultaneous with signup -> strict ordering rejects it
        ("u3", "signup", _ts(0)), ("u3", "click", _ts(0)),
        # u4 never signs up -> reaches nothing
        ("u4", "click", _ts(0)), ("u4", "purchase", _ts(1)),
        # u5: earliest click before signup, a later one after -> chains on
        # the earliest QUALIFYING click (minute 3), so the minute-2
        # purchase is too early and step 3 is not reached
        ("u5", "click", _ts(0)), ("u5", "signup", _ts(1)),
        ("u5", "purchase", _ts(2)), ("u5", "click", _ts(3)),
        # noise event types are ignored entirely
        ("u1", "error", _ts(0)),
    ]
    return spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")


def test_funnel_strict_ordering(spark):
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(_events(spark),
                                  ["signup", "click", "purchase"]).collect()}
    # signup: u1 u2 u3 u5; click-after-signup: u1 u5; purchase after that: u1
    assert got == {"signup": 4, "click": 2, "purchase": 1}


def test_funnel_stage_frames_shrink_and_chain_on_min_ts(spark):
    stages = funnel_users(_events(spark), ["signup", "click", "purchase"])
    users = [{r["user_id"] for r in s.collect()} for s in stages]
    assert users[0] >= users[1] >= users[2]
    assert users[1] == {"u1", "u5"}
    # u5's qualifying click is the minute-3 one (first after signup)
    t2 = {r["user_id"]: r["t2"] for r in stages[1].collect()}
    assert t2["u5"] == _ts(3)


def test_tfidf_topk_ranks_rare_terms_first(spark):
    df = spark.createDataFrame(
        [(0, "apple apple banana common"),
         (1, "banana common"),
         (2, "common common cherry"),
         (3, "   ")],  # tokenless doc -> no rows
        "doc_id long, text string")
    out = tfidf_topk(df, k=2)
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["df"], r["score"])
            for r in out.collect()}
    # doc 0: apple tf=2 df=1 beats banana tf=1 df=2 beats common df=3
    assert rows[(0, "apple")] == (2, 1, 2 * 4 * 1_000_000)
    assert rows[(0, "banana")] == (1, 2, (4 * 1_000_000) // 2)
    assert (0, "common") not in rows  # k=2 cut
    assert not any(d == 3 for d, _ in rows)
    # every doc contributes at most k rows
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 2 for r in per_doc)


def test_tfidf_is_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 3} shared tail{i}") for i in range(30)],
        "doc_id long, text string")
    a = sorted(map(tuple, tfidf_topk(df, k=3).collect()))
    b = sorted(map(tuple, tfidf_topk(df.repartition(7), k=3).collect()))
    assert a == b


def test_tfidf_plan_has_no_cartesian_blowup(spark):
    # the 1-row n_docs cross join must plan as a broadcast, never a
    # cartesian over the corpus-sized side
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok "), "id").alias("text"))
    plan = tfidf_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
