"""cohort retention (operators/cohort.py) + plan shape."""

from datetime import datetime

from logging_spark.operators.cohort import cohort_retention


def test_cohort_retention_semantics(spark):
    W = 604800
    base = datetime(2024, 1, 4)  # inside epoch-week floor(1704326400/W)
    def at(week):
        return datetime.fromtimestamp(
            (1704326400 // W + week) * W + 3600)
    ev = spark.createDataFrame(
        # u1: weeks 0,1,3 — u2: weeks 0,0 (dup events) — u3: week 1 only
        [(1, at(0)), (1, at(1)), (1, at(3)),
         (2, at(0)), (2, at(0)),
         (3, at(1))],
        "user_id long, ts timestamp")
    rows = {(r["cohort_period"] - 1704326400 // W, r["periods_since"]):
            r["n_users"]
            for r in cohort_retention(ev).collect()}
    assert rows == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_cohort_plan_two_exchanges(spark):
    from logging_spark import contract
    q = contract.build_queries()
    df = q["events_cohort_retention"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan[:1500]
    assert "partial_min" in plan or "partial_collect_set" in plan, plan[:1500]
