"""Hampel spike flags (operators/anomaly.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from logging_spark.operators.anomaly import spike_flags

W = 604800


def _ev(spark, counts):
    # counts: dict week -> n events for one user
    rows = [(1, datetime.utcfromtimestamp(w * W + 60 * i))
            for w, n in counts.items() for i in range(n)]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_spike_flags_hampel(spark):
    # history 4,5,4,5,6 then an outage week of 40: median 5, MAD 1 ->
    # only the 40 flags; the outage does NOT drag the baseline up the
    # way a mean/stddev rule would
    ev = _ev(spark, {0: 4, 1: 5, 2: 4, 3: 5, 4: 6, 5: 40})
    got = {r["period"]: r for r in spike_flags(ev).collect()}
    assert got[5]["is_spike"] and got[5]["n"] == 40
    assert not any(got[w]["is_spike"] for w in range(5))
    assert got[5]["med"] == 5.0 and got[5]["mad"] == 1.0


def test_spike_flags_constant_history(spark):
    # constant counts: MAD 0 -> anything above the median flags
    ev = _ev(spark, {0: 3, 1: 3, 2: 3, 3: 4})
    got = {r["period"]: r["is_spike"] for r in spike_flags(ev).collect()}
    assert got == {0: False, 1: False, 2: False, 3: True}


def test_spike_plan_single_window_exchange(spark):
    from logging_spark import contract
    q = contract.build_queries()
    df = q["events_error_spikes"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one agg shuffle + one shared window shuffle: both Window nodes
    # partition on the same key, so Catalyst reuses a single exchange
    assert plan.count("Exchange") == 2, plan[:1800]
    assert plan.count("Window") == 2, plan[:1800]
