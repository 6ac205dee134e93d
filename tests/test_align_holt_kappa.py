"""Brute-force twins for the round-4 fourth-session operators:
cogroup LCS alignment (operators/align.py), the Holt level+trend fold
(timeseries.holt_fold), and Cohen's kappa (dq.cohen_kappa)."""

import random

import pytest

from pyspark.sql import functions as F

from logging_spark.operators.align import _lcs_len, cogroup_lcs
from logging_spark.operators.dq import cohen_kappa
from logging_spark.operators.timeseries import holt_fold


# ---------------------------------------------------------------- align

def _brute_lcs(a, b):
    """Exponential-free reference DP, independent implementation
    (full matrix, not two-row) to cross-check _lcs_len."""
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return dp[n][m]


def test_lcs_kernel_matches_reference_dp():
    rng = random.Random(41)
    for _ in range(200):
        a = [rng.choice("abcde") for _ in range(rng.randrange(0, 12))]
        b = [rng.choice("abcde") for _ in range(rng.randrange(0, 12))]
        assert _lcs_len(a, b) == _brute_lcs(a, b)


def test_cogroup_lcs_matches_brute_force(spark):
    rng = random.Random(7)
    rows_l, rows_r = [], []
    seqs = {}
    for k in range(25):
        a = [rng.choice("xyzuv") for _ in range(rng.randrange(0, 9))]
        b = [rng.choice("xyzuv") for _ in range(rng.randrange(0, 9))]
        seqs[k] = (a, b)
        rows_l += [(k, i, s) for i, s in enumerate(a)]
        rows_r += [(k, i, s) for i, s in enumerate(b)]
    left = spark.createDataFrame(rows_l, "k long, o long, s string")
    right = spark.createDataFrame(rows_r, "k long, o long, s string")
    got = {r["k"]: r for r in
           cogroup_lcs(left, right, key="k", order_col="o",
                       symbol_col="s").collect()}
    # keys present on either side appear exactly once
    want_keys = {k for k, (a, b) in seqs.items() if a or b}
    assert set(got) == want_keys
    for k, (a, b) in seqs.items():
        if not (a or b):
            continue
        lcs = _brute_lcs(a, b)
        r = got[k]
        assert (r["len_a"], r["len_b"], r["lcs_len"]) == (len(a), len(b), lcs)
        assert r["align_permille"] == (2 * lcs * 1000) // (len(a) + len(b))


def test_cogroup_lcs_caps_long_sequences(spark):
    left = spark.createDataFrame(
        [(1, i, "a") for i in range(100)], "k long, o long, s string")
    right = spark.createDataFrame(
        [(1, i, "a") for i in range(50)], "k long, o long, s string")
    r = cogroup_lcs(left, right, key="k", order_col="o", symbol_col="s",
                    max_len=24).collect()[0]
    assert (r["len_a"], r["len_b"], r["lcs_len"]) == (24, 24, 24)


# ----------------------------------------------------------------- holt

def _trunc_div(a, b):
    """Truncate-toward-zero division (Spark DIV / DuckDB //);
    Python's // floors, so negative trends need the explicit form."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _brute_holt(ys, a=300, b=100):
    l, t = ys[1] * 1000, (ys[1] - ys[0]) * 1000
    for y in ys[2:]:
        l_new = _trunc_div(a * y * 1000 + (1000 - a) * (l + t), 1000)
        t = _trunc_div(b * (l_new - l) + (1000 - b) * t, 1000)
        l = l_new
    return l, t


@pytest.mark.parametrize("series", [
    [5, 7, 9, 11, 13, 15],           # clean upward trend
    [100, 90, 80, 75, 60, 40, 20],   # downward (negative trend, trunc div)
    [3, 3],                          # minimum length: init only
    [10, 2, 30, 1, 25, 4, 40],       # oscillating
])
def test_holt_fold_matches_reference(spark, series):
    rows = [("k", i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, h long, n long")
    r = holt_fold(df, key="g", order_col="h", value_col="n").collect()[0]
    l, t = _brute_holt(series)
    assert (r["n_points"], r["level_x1000"], r["trend_x1000"],
            r["forecast_x1000"]) == (len(series), l, t, l + t)


def test_holt_fold_drops_single_point_keys(spark):
    df = spark.createDataFrame([("solo", 0, 5), ("pair", 0, 1),
                                ("pair", 1, 2)], "g string, h long, n long")
    got = holt_fold(df, key="g", order_col="h", value_col="n").collect()
    assert [r["g"] for r in got] == ["pair"]


# ---------------------------------------------------------------- kappa

def _brute_kappa(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    labels = {a for a, _ in pairs} | {b for _, b in pairs}
    pe = sum(sum(1 for x, _ in pairs if x == k)
             * sum(1 for _, y in pairs if y == k) for k in labels)
    den = n * n - pe
    kappa = 1_000_000 if den == 0 else _trunc_div(
        (n * agree - pe) * 1_000_000, den)
    return n, agree, pe, kappa


def test_cohen_kappa_matches_reference(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(4), rng.randrange(4)) for _ in range(300)]
    # inject genuine agreement so kappa is meaningfully positive
    pairs += [(k % 4, k % 4) for k in range(200)]
    df = spark.createDataFrame(pairs, "a long, b long")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["n_agree"], r["pe_num"],
            r["kappa_x1e6"]) == _brute_kappa(pairs)


def test_cohen_kappa_empty_input(spark):
    df = spark.createDataFrame([], "a long, b long")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["n_agree"], r["pe_num"]) == (0, 0, 0)
    assert r["kappa_x1e6"] == 1_000_000  # vacuous: denominator 0


def test_cohen_kappa_perfect_and_degenerate(spark):
    # perfect agreement over 2 labels -> kappa exactly 1e6
    df = spark.createDataFrame([(i % 2, i % 2) for i in range(50)],
                               "a long, b long")
    assert cohen_kappa(df, "a", "b").collect()[0]["kappa_x1e6"] == 1_000_000
    # single constant label both sides -> pe = n^2, denominator 0
    df1 = spark.createDataFrame([(1, 1)] * 10, "a long, b long")
    assert cohen_kappa(df1, "a", "b").collect()[0]["kappa_x1e6"] == 1_000_000


# ------------------------------------------------------- trend slope

def test_trend_slope_matches_reference(spark):
    from logging_spark.operators.timeseries import trend_slope
    series = {"up": [(0, 1), (1, 3), (2, 5), (3, 7)],        # slope 2
              "flat": [(10, 4), (11, 4), (12, 4)],           # slope 0
              "down": [(5, 9), (6, 7), (7, 2), (9, 1)],      # negative
              "solo": [(0, 5)]}                              # den 0
    rows = [(k, x, y) for k, pts in series.items() for x, y in pts]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in
           trend_slope(df, key="g", x_col="x", y_col="y").collect()}
    for k, pts in series.items():
        xs = [x for x, _ in pts]
        m = min(xs)
        xs = [x - m for x in xs]
        ys = [y for _, y in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = got[k]
        assert (r["n"], r["slope_num"], r["slope_den"]) == (n, num, den)
        want = 0 if den == 0 else _trunc_div(num * 1_000_000, den)
        assert r["slope_x1e6"] == want
    assert got["up"]["slope_x1e6"] == 2_000_000
    assert got["flat"]["slope_x1e6"] == 0
    assert got["down"]["slope_x1e6"] < 0


# ------------------------------------------------------------ wilson

def test_wilson_lower_bound_reference_and_edges(spark):
    import math
    from logging_spark.operators.dq import wilson_lower_bound
    data = {"good_big": (9500, 10000), "perfect_small": (3, 3),
            "zero": (0, 7), "half": (50, 100)}
    rows = [(g, 1 if i < k else 0)
            for g, (k, n) in data.items() for i in range(n)]
    df = spark.createDataFrame(rows, "g string, s long")
    got = {r["g"]: r for r in
           wilson_lower_bound(df, ["g"], "s").collect()}
    z, z2 = 1.96, 1.96 * 1.96
    for g, (k, n) in data.items():
        p = k / n
        lb = (p + z2 / (2.0 * n)
              - z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)) \
            / (1.0 + z2 / n)
        r = got[g]
        assert (r["n"], r["k"]) == (n, k)
        assert r["wilson_lb_x1e6"] == math.floor(1_000_000 * lb)
    # the whole point: 3/3 must NOT outrank 9500/10000
    assert (got["perfect_small"]["wilson_lb_x1e6"]
            < got["good_big"]["wilson_lb_x1e6"])
    assert got["zero"]["wilson_lb_x1e6"] == 0


def test_batched_lcs_identical_to_cogroup(spark):
    """lcs_drift_batched must be row-identical to cogroup_lcs on
    randomized inputs (same DP, different physical plan)."""
    from logging_spark.operators.align import lcs_drift_batched
    rng = random.Random(11)
    rows_l = [(k, i, rng.choice("pqrst"))
              for k in range(40) for i in range(rng.randrange(0, 30))]
    rows_r = [(k, i, rng.choice("pqrst"))
              for k in range(1, 41) for i in range(rng.randrange(0, 30))]
    left = spark.createDataFrame(rows_l, "k long, o long, s string")
    right = spark.createDataFrame(rows_r, "k long, o long, s string")
    a = sorted(cogroup_lcs(left, right, key="k", order_col="o",
                           symbol_col="s", max_len=24).collect())
    b = sorted(lcs_drift_batched(left, right, key="k", order_col="o",
                                 symbol_col="s", max_len=24).collect())
    assert a == b and len(a) > 0


# --------------------------------------------------- quantile sketch

def test_histogram_sketch_merge_and_quantile(spark):
    import random
    from logging_spark.operators.sketch import (
        histogram_sketch, merge_histogram_sketches, sketch_quantile_edge)
    rng = random.Random(5)
    vals = [rng.randrange(0, 5000) for _ in range(4000)] + [0, 4999]
    rows = [(i % 7, v) for i, v in enumerate(vals)]  # 7 shards
    df = spark.createDataFrame(rows, "shard int, v long")
    per_shard = histogram_sketch(df, "v", width_pow2=6,
                                 group_by=["shard"])
    merged = merge_histogram_sketches(per_shard.select("bucket", "cnt"))
    direct = histogram_sketch(df, "v", width_pow2=6)
    m = {r["bucket"]: r["cnt"] for r in merged.collect()}
    d = {r["bucket"]: r["cnt"] for r in direct.collect()}
    assert m == d and sum(m.values()) == len(vals)
    for q_num, q_den in [(1, 2), (1, 4), (3, 4), (99, 100)]:
        row = sketch_quantile_edge(direct, q_num, q_den,
                                   width_pow2=6).collect()[0]
        rank = (len(vals) * q_num + q_den - 1) // q_den
        true_q = sorted(vals)[rank - 1]
        assert row["n"] == len(vals) and row["target_rank"] == rank
        assert row["edge"] <= true_q < row["edge"] + 64
