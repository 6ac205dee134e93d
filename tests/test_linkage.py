"""Record linkage (operators/linkage.py): blocking caps, scoring
semantics (incl. NULL = disagree), classification thresholds."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark.operators.linkage import blocked_pairs, match_scores


def _people(spark):
    rows = [
        (1, "smith", "j", "NY"),
        (2, "smith", "j", "NY"),     # exact dup of 1 -> match
        (3, "smith", "q", "LA"),     # same block, weak agreement
        (4, "jones", "j", "NY"),     # different block: never paired
        (5, "smith", None, "NY"),    # NULL field -> disagree weight
    ]
    return spark.createDataFrame(
        rows, "id int, last string, first string, city string")


def test_blocking_and_classification(spark):
    df = _people(spark)
    pairs = blocked_pairs(df, "id", "last")
    rules = [(F.col("a.first") == F.col("b.first"), 3, -2),
             (F.col("a.city") == F.col("b.city"), 2, -1)]
    scored = match_scores(pairs, "id", rules, t_match=5, t_possible=0)
    got = {(r["id_a"], r["id_b"]): (r["score"], r["match_class"])
           for r in scored.collect()}
    # 4 is in its own block: 6 pairs among {1,2,3,5}
    assert len(got) == 6 and all(a < b for a, b in got)
    assert got[(1, 2)] == (5, "match")
    assert got[(1, 3)] == (-3, "non_match")
    assert got[(1, 5)] == (0, "possible")   # NULL first: -2, city +2


def test_max_block_drops_degenerate_blocks(spark):
    df = _people(spark)
    pairs = blocked_pairs(df, "id", "last", max_block=3)
    assert pairs.count() == 0  # 'smith' block (4 rows) dropped whole


def test_fk_cardinality_buckets(spark):
    from logging_spark.operators.dq import fk_cardinality
    parent = spark.createDataFrame(
        [(i,) for i in range(4)], "pk int")
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,), (9,)], "fk int")  # 9 is an orphan
    out = {r["bucket"]: r["n"]
           for r in fk_cardinality(child, parent, "fk", "pk").collect()}
    assert out == {"0": 2, "1": 1, "2-10": 1, "orphan_child_rows": 2}


def test_lag_moments_match_numpy(spark):
    import numpy as np
    from logging_spark.operators.timeseries import lag_moments
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "h int, n int")
    out = {r["lag"]: r for r in
           lag_moments(df, "h", "n", lags=[1, 2]).collect()}
    for lag in (1, 2):
        x = np.array(xs[lag:]); y = np.array(xs[:-lag])
        r = out[lag]
        assert r["n_pairs"] == len(x)
        assert r["sum_xy"] == int((x * y).sum())
        assert r["cov_num"] == int(len(x) * (x * y).sum()
                                   - x.sum() * y.sum())
