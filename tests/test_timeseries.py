"""gapfill_hourly + locf: regular-grid densification."""

from datetime import datetime

from pyspark.sql import functions as F

from logging_spark.operators.timeseries import (gapfill_hourly,
                                                hourly_buckets, locf)


def _events(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 10), 100),
        ("a", datetime(2024, 1, 1, 0, 50), 50),
        # hour 1 and 2 missing for a
        ("a", datetime(2024, 1, 1, 3, 5), 70),
        ("b", datetime(2024, 1, 1, 5, 0), 10),  # single-bucket key
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v long")


def test_gapfill_densifies_each_key_span(spark):
    b = hourly_buckets(_events(spark), "k", "ts",
                       [F.count(F.lit(1)).alias("n"),
                        F.sum("v").alias("s")])
    g = gapfill_hourly(b, "k", zero_cols=["n"])
    rows = {(r["k"], r["hour"].hour): (r["n"], r["s"])
            for r in g.collect()}
    # a spans hours 0..3 inclusive -> 4 rows; b exactly 1
    assert len(rows) == 5
    assert rows[("a", 0)] == (2, 150)
    assert rows[("a", 1)] == (0, None)
    assert rows[("a", 2)] == (0, None)
    assert rows[("a", 3)] == (1, 70)
    assert rows[("b", 5)] == (1, 10)


def test_locf_carries_forward_within_key_only(spark):
    b = hourly_buckets(_events(spark), "k", "ts",
                       [F.sum("v").alias("s")])
    g = locf(gapfill_hourly(b, "k"), "k", "hour", "s", "s_locf")
    rows = {(r["k"], r["hour"].hour): r["s_locf"] for r in g.collect()}
    assert rows[("a", 1)] == 150 and rows[("a", 2)] == 150
    assert rows[("a", 3)] == 70
    assert rows[("b", 5)] == 10


def test_locf_leading_nulls_stay_null(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5), ("a", 3, None)],
        "k string, t long, v long")
    out = {r["t"]: r["v_locf"]
           for r in locf(df, "k", "t", "v").collect()}
    assert out == {1: None, 2: 5, 3: 5}


def test_ewma_fold_matches_python_recurrence(spark):
    from logging_spark.operators.timeseries import ewma_fold
    import random
    rnd = random.Random(7)
    rows = [("k%d" % (i % 3), i, rnd.randrange(0, 1000))
            for i in range(300)]
    df = spark.createDataFrame(rows, "k string, o long, v long")
    got = {r.k: (r.n_points, r.final_ewma, r.peak_ewma)
           for r in ewma_fold(df, "k", "o", "v", den=4).collect()}
    # python reference recurrence, same integral arithmetic
    series = {}
    for k, o, v in sorted(rows, key=lambda t: (t[0], t[1])):
        series.setdefault(k, []).append(v)
    for k, xs in series.items():
        s = mx = xs[0]
        for x in xs[1:]:
            s = (3 * s + x) // 4
            mx = max(mx, s)
        assert got[k] == (len(xs), s, mx)


def test_ewma_fold_single_point(spark):
    from logging_spark.operators.timeseries import ewma_fold
    df = spark.createDataFrame([("a", 1, 42)], "k string, o long, v long")
    r = ewma_fold(df, "k", "o", "v").collect()[0]
    assert (r.n_points, r.final_ewma, r.peak_ewma) == (1, 42, 42)


def test_cusum_fold_localizes_injected_shift(spark):
    from logging_spark.operators.timeseries import cusum_fold
    # flat rate 10 for 50 points, then a shift to 25 at index 51
    rows = [("k", i, 10 if i <= 50 else 25, 12) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, o long, v long, ref long")
    r = cusum_fold(df, "k", "o", "v", "ref").collect()[0]
    # before the shift S stays 0 (v - ref = -2); after, it climbs by
    # 13/point, peaking at the END of the series
    assert r.n_points == 100 and r.ref_k == 12
    assert r.peak_cusum == 13 * 50
    assert r.peak_pos == 100
    # python reference recurrence over the same series
    s = peak = max(0, 10 - 12); pos = 1
    for i, (_, _, v, ref) in enumerate(rows[1:], start=2):
        s = max(0, s + v - ref)
        if s > peak:
            peak, pos = s, i
    assert (r.peak_cusum, r.peak_pos) == (peak, pos)
