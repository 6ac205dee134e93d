"""as-of join + bucketized interval join (operators/asof.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from logging_spark.operators.asof import asof_join, interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 00:00:30")),   # after v1
         (2, "k", _ts("2024-01-01 00:01:00")),   # exactly at v2 -> v2
         (3, "k", _ts("2024-01-01 00:00:05")),   # before any state
         (4, "z", _ts("2024-01-01 09:00:00"))],  # key with no states
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:10"), "v1"),
         ("k", _ts("2024-01-01 00:01:00"), "v2")],
        "user_id string, state_ts timestamp, state string")
    got = {r["event_id"]: r for r in asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="state_ts",
        payload_cols=["state_ts", "state"],
    ).collect()}
    assert got[1]["state"] == "v1"
    assert got[2]["state"] == "v2"          # at-or-before includes ties
    assert got[3]["state"] is None and got[3]["state_ts"] is None
    assert got[4]["state"] is None
    assert set(got[1].asDict()) == {
        "event_id", "user_id", "ts", "state_ts", "state"}


def test_asof_join_rejects_collisions(spark):
    df = spark.createDataFrame([(1, "k", _ts("2024-01-01 00:00:00"))],
                               "v long, user_id string, ts timestamp")
    import pytest
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df.select("user_id", "ts", "v"), on="user_id")


def test_interval_join_boundaries(spark):
    events = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 00:00:00")),   # == start -> in
         (2, "k", _ts("2024-01-01 00:09:59")),   # inside, 2nd bucket
         (3, "k", _ts("2024-01-01 00:10:00")),   # == end -> out
         (4, "q", _ts("2024-01-01 00:05:00"))],  # wrong key
        "event_id long, user_id string, ts timestamp")
    iv = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:10:00"), 7)],
        "user_id string, start_ts timestamp, end_ts timestamp, iv_id long")
    got = interval_join(events, iv, on="user_id", ts="ts",
                        start="start_ts", end="end_ts", bucket_s=600)
    rows = got.select("event_id", "iv_id").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]
    # exactly once per qualifying pair even though the interval covers
    # two buckets (an event owns a single bucket)
    assert len(rows) == 2


def test_interval_join_overlapping_intervals(spark):
    events = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 00:05:00"))],
        "event_id long, user_id string, ts timestamp")
    iv = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:10:00"), 1),
         ("k", _ts("2024-01-01 00:04:00"), _ts("2024-01-01 00:14:00"), 2)],
        "user_id string, start_ts timestamp, end_ts timestamp, iv_id long")
    got = interval_join(events, iv, on="user_id", ts="ts",
                        start="start_ts", end="end_ts", bucket_s=600)
    assert sorted(r["iv_id"] for r in got.collect()) == [1, 2]


def test_asof_and_interval_plans_never_nested_loop(spark):
    # the whole point of both formulations: no range predicate ever
    # reaches a join planner, so a BroadcastNestedLoopJoin/Cartesian
    # appearing here means the operator regressed to the O(n*m) shape
    from logging_spark import contract

    q = contract.build_queries()
    for name in ("events_asof_last_error", "events_incident_rollup"):
        plan = q[name](spark, "/root/testdata/sf0.001")._jdf \
            .queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan, (
            name, plan[:1500])
