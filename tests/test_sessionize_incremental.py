"""sessionize_incremental: delta maintenance of a committed session
rollup must equal a full recompute (interval-merge identity), with
untouched keys passing through join-free."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from logging_spark.operators.sessionize import (session_rollup,
                                                sessionize_incremental)

SCHEMA = "user_id string, ts timestamp"
T0 = datetime(2025, 1, 1)


def _rows(seed=5, users=20):
    rnd = random.Random(seed)
    out = []
    for u in range(users):
        t = T0
        for _ in range(rnd.randint(3, 40)):
            t = t + timedelta(seconds=rnd.choice(
                [60, 300, 900, 2000, 4000, 80000]))
            out.append((f"u{u}", t))
    return out


def test_incremental_equals_full_recompute(spark):
    all_rows = _rows()
    cut = T0 + timedelta(days=1, hours=3)
    old = [r for r in all_rows if r[1] <= cut]
    new = [r for r in all_rows if r[1] > cut]
    assert old and new
    prior = session_rollup(spark.createDataFrame(old, SCHEMA))
    inc = sessionize_incremental(prior, spark.createDataFrame(new, SCHEMA))
    full = session_rollup(spark.createDataFrame(all_rows, SCHEMA))
    assert sorted(map(tuple, inc.collect())) == \
        sorted(map(tuple, full.collect()))


def test_delta_event_bridges_two_prior_sessions(spark):
    # sessions {0,10min} and {50min} (40 > 30min gap); a delta event
    # at 30min is within gap of BOTH -> one merged session of 4 turns
    old = [("m", T0), ("m", T0 + timedelta(minutes=10)),
           ("m", T0 + timedelta(minutes=50))]
    new = [("m", T0 + timedelta(minutes=30))]
    prior = session_rollup(spark.createDataFrame(old, SCHEMA))
    assert prior.count() == 2
    inc = sorted(map(tuple, sessionize_incremental(
        prior, spark.createDataFrame(new, SCHEMA)).collect()))
    full = sorted(map(tuple, session_rollup(
        spark.createDataFrame(old + new, SCHEMA)).collect()))
    assert inc == full
    assert len(inc) == 1 and inc[0][2] == 4


def test_untouched_keys_pass_through(spark):
    old = [("a", T0), ("a", T0 + timedelta(minutes=5)),
           ("b", T0), ("b", T0 + timedelta(hours=2))]
    new = [("b", T0 + timedelta(hours=4))]
    prior = session_rollup(spark.createDataFrame(old, SCHEMA))
    inc = sessionize_incremental(prior, spark.createDataFrame(new, SCHEMA))
    a_rows = sorted(map(tuple, inc.where("user_id = 'a'").collect()))
    a_prior = sorted(map(tuple, prior.where("user_id = 'a'").collect()))
    assert a_rows == a_prior
    assert inc.where("user_id = 'b'").count() == 3


def test_plan_untouched_side_has_no_window(spark):
    """The pass-through side must stay a LEFT ANTI broadcast join —
    if a window ever touches untouched keys, the operator degenerates
    to a full recompute at scale."""
    old = _rows(seed=9, users=6)
    prior = session_rollup(spark.createDataFrame(old, SCHEMA))
    prior = prior.localCheckpoint()  # freeze: plan below is ONLY the delta path
    new = [(u, T0 + timedelta(days=30)) for u, _ in old[:2]]
    inc = sessionize_incremental(prior, spark.createDataFrame(new, SCHEMA))
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # exactly one Window branch (the affected-key re-segmentation, two
    # window functions sharing one sort)
    assert plan.count("Window") <= 2
