"""Pair-overlap metrics and seasonal-naive backtest vs brute force."""

from collections import Counter

from pyspark.sql import functions as F

from logging_spark.operators.overlap import PPM, pair_overlap_metrics
from logging_spark.operators.timeseries import naive_backtest


def _clip(a, b):
    ca, cb = Counter(a), Counter(b)
    return sum(min(ca[t], cb[t]) for t in ca)


def test_pair_overlap_matches_counter_brute_force(spark):
    rows = [
        (["a", "b", "a", "c"], ["a", "a", "a", "b"]),
        (["x"], ["y"]),
        ([], ["a", "b"]),
        (["q", "q"], []),
        (["s", "t", "t"], ["t", "t", "t", "s", "u"]),
    ]
    df = spark.createDataFrame(rows, "ta ARRAY<STRING>, tb ARRAY<STRING>")
    got = pair_overlap_metrics(df, "ta", "tb").collect()
    for r, (a, b) in zip(sorted(got, key=lambda r: (r["ta"], r["tb"])),
                         sorted(rows)):
        o = _clip(a, b)
        assert r["overlap"] == o
        assert r["precision_ppm"] == o * PPM // max(len(a), 1)
        assert r["recall_ppm"] == o * PPM // max(len(b), 1)
        assert r["f1_ppm"] == 2 * o * PPM // max(len(a) + len(b), 1)


def test_naive_backtest_sparse_grid_exact(spark):
    # key k: hours 0..5 plus 24..29 with a HOLE at 26 — positional
    # lag would mispair 27 with 25; the equi-join must skip it.
    series = [("k", h, (h * 7) % 5 + 1) for h in range(6)] + \
             [("k", h, (h * 3) % 4 + 2) for h in (24, 25, 27, 28, 29)]
    df = spark.createDataFrame(series, "k STRING, h LONG, n LONG")
    row = naive_backtest(df, "k", "h", "n", season=24).collect()[0]
    vals = {h: n for _, h, n in series}
    scored = [(abs(vals[h] - vals[h - 24]), abs(vals[h] - vals[h - 1]))
              for h in vals if h - 24 in vals and h - 1 in vals]
    assert row["n_scored"] == len(scored) == 3  # 24(no 23) -> 25,28,29
    assert row["err_season"] == sum(e for e, _ in scored)
    assert row["err_naive"] == sum(e for _, e in scored)
    want = row["err_season"] * PPM // max(row["err_naive"], 1)
    assert row["mase_x1e6"] == want
