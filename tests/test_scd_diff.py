"""Edge cases for operators/scd.py and operators/diff.py the parquet
fixture can't exercise: consecutive-duplicate collapse, single-state
keys, 'removed' diff rows, and unchanged-row suppression."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.operators.diff import snapshot_diff  # noqa: E402
from logging_spark.operators.scd import OPEN_SENTINEL, scd2  # noqa: E402


def _log(spark, rows):
    return spark.createDataFrame(rows, "k string, state string, us long")


def test_scd2_collapses_consecutive_duplicates(spark):
    log = _log(spark, [
        ("a", "up", 10), ("a", "up", 20), ("a", "down", 30),
        ("a", "down", 40), ("a", "up", 50),
    ])
    out = scd2(log, key="k", attr="state", ts=F.col("us")).collect()
    ivs = sorted([(r.state, r.valid_from, r.valid_to, r.version,
                   r.is_current) for r in out])
    assert ivs == [
        ("down", 30, 50, 2, 0),
        ("up", 10, 30, 1, 0),
        ("up", 50, OPEN_SENTINEL, 3, 1),
    ]


def test_scd2_single_state_key_is_one_open_interval(spark):
    log = _log(spark, [("b", "steady", 5), ("b", "steady", 99)])
    out = scd2(log, key="k", attr="state", ts=F.col("us")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.valid_from, r.valid_to, r.version, r.is_current) == (
        5, OPEN_SENTINEL, 1, 1)


def test_scd2_intervals_tile_per_key(spark):
    log = _log(spark, [
        ("c", "x", 1), ("c", "y", 2), ("c", "z", 3), ("d", "x", 7),
    ])
    out = scd2(log, key="k", attr="state", ts=F.col("us"))
    rows = sorted(out.where(F.col("k") == "c").collect(),
                  key=lambda r: r.version)
    # each interval's valid_to is the next interval's valid_from
    for prev, nxt in zip(rows, rows[1:]):
        assert prev.valid_to == nxt.valid_from
    assert rows[-1].valid_to == OPEN_SENTINEL
    assert sum(r.is_current for r in rows) == 1


def test_scd2_lookup_boundary_and_prehistory(spark):
    from logging_spark.operators.scd import scd2_lookup
    log = _log(spark, [("a", "up", 10), ("a", "down", 30)])
    dim = scd2(log, key="k", attr="state", ts=F.col("us")) \
        .withColumnRenamed("state", "st")
    facts = spark.createDataFrame(
        [("a", 1, 5),    # before any interval -> NULL
         ("a", 2, 10),   # exactly at valid_from -> that interval
         ("a", 3, 29),   # last instant of interval 1
         ("a", 4, 30),   # boundary: new interval starts
         ("a", 5, 99),   # open interval
         ("b", 6, 50)],  # unknown key -> NULL
        "k string, fid long, fts long")
    got = {r.fid: r.st for r in scd2_lookup(
        facts, dim, key="k", fact_ts="fts", attr="st").collect()}
    assert got == {1: None, 2: "up", 3: "up", 4: "down", 5: "down",
                   6: None}


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_snapshot_diff_all_statuses(spark):
    old = _snap(spark, [(1, 10), (2, 20), (3, 30)])
    new = _snap(spark, [(2, 21), (3, 30), (4, 40)])
    out = {r.k: r for r in snapshot_diff(
        old, new, keys=["k"], compare=["v"]).collect()}
    assert out[1].status == "removed" and out[1].new_hash == ""
    assert out[2].status == "changed"
    assert out[2].old_hash != out[2].new_hash
    assert out[4].status == "added" and out[4].old_hash == ""
    assert 3 not in out  # unchanged suppressed by default


def test_scd2_plan_shares_one_sort(spark):
    # both window passes (change filter + interval close) must compile
    # to ONE Exchange + ONE Sort — identical partitioning and ordering
    df = _log(spark, [("a", "x", 1)]).withColumnRenamed("us", "t")
    out = scd2(df, key="k", attr="state", ts=F.col("t"), tiebreak=["t"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 1
    assert plan.count("Sort ") == 1


def test_snapshot_diff_join_reuses_agg_partitioning(spark):
    # default plain-equality keys: the full-outer join must NOT add
    # exchanges beyond the two per-side aggregates
    base = spark.createDataFrame([(1, 2)], "k long, v long")
    old = base.groupBy("k").agg(F.sum("v").alias("s"))
    new = base.groupBy("k").agg(F.max("v").alias("s"))
    out = snapshot_diff(old, new, keys=["k"], compare=["s"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 2


def test_debounce_collapses_burst_to_first_row(spark):
    from logging_spark.operators.dedup import debounce
    rows = [("u", 1, 0), ("u", 2, 100), ("u", 3, 150),  # burst
            ("u", 4, 2000),                              # clear of burst
            ("v", 5, 10)]
    df = spark.createDataFrame(rows, "k string, id long, us long")
    out = debounce(df, keys=["k"], ts_us=F.col("us"), tolerance_us=500,
                   tiebreak=["id"])
    kept = sorted(r.id for r in out.collect())
    # lag-based: row 2 within 500 of row 1 -> dropped; row 3 within
    # 500 of raw row 2 -> dropped; row 4 is 1850 past row 3 -> kept
    assert kept == [1, 4, 5]
    flagged = debounce(df, keys=["k"], ts_us=F.col("us"),
                       tolerance_us=500, tiebreak=["id"],
                       keep_flag="kept")
    assert flagged.count() == 5 and "us" in flagged.columns


def test_snapshot_diff_keep_unchanged(spark):
    old = _snap(spark, [(1, 10)])
    new = _snap(spark, [(1, 10)])
    out = snapshot_diff(old, new, keys=["k"], compare=["v"],
                        keep_unchanged=True).collect()
    assert len(out) == 1 and out[0].status == "unchanged"
    assert out[0].old_hash == out[0].new_hash != ""


def test_snapshot_diff_null_vs_empty_and_separator_values(spark):
    """NULL -> '' transitions and separator-containing values must hash
    differently (prefix-code canonicalization — round-3 ADVICE)."""
    sep = chr(31)
    old = spark.createDataFrame(
        [("a", None, "x"), ("b", "p" + sep, "q"), ("c", "s", "t")],
        "k string, c1 string, c2 string")
    new = spark.createDataFrame(
        [("a", "", "x"), ("b", "p", sep + "q"), ("c", "s", "t")],
        "k string, c1 string, c2 string")
    out = {r["k"]: r["status"] for r in snapshot_diff(
        old, new, keys=["k"], compare=["c1", "c2"],
        keep_unchanged=True).collect()}
    assert out == {"a": "changed", "b": "changed", "c": "unchanged"}


def test_schema_diff_reports_all_change_kinds(spark):
    from logging_spark.operators.diff import schema_diff
    old = spark.createDataFrame(
        [(1, "a", 1.0, [1])],
        "id LONG, gone STRING, chg DOUBLE, arr ARRAY<LONG>")
    new = spark.createDataFrame(
        [(1, 2, [1], "x")],
        "id LONG, chg LONG, arr ARRAY<LONG>, fresh STRING")
    got = {r["column"]: r for r in schema_diff(old, new).collect()}
    assert got["gone"]["status"] == "removed"
    assert got["fresh"]["status"] == "added"
    assert got["chg"]["status"] == "type_changed"
    assert got["chg"]["old_type"] == "double"
    assert got["chg"]["new_type"] == "bigint"
    assert "id" not in got and "arr" not in got  # unchanged omitted
