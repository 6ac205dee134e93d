"""Model-eval operators (operators/mleval.py) vs brute force."""

import pytest
from pyspark.sql import functions as F

from logging_spark.operators.mleval import (
    PPM, auc_exact, brier_score, calibration_bins, drift_index, ece,
)


def _auc_brute(pairs):
    """Tie-aware AUC via all (pos, neg) pair comparison; trunc x1e6."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return -1
    num = 0
    for p in pos:
        for n in neg:
            num += 2 if p > n else (1 if p == n else 0)
    return (num * PPM) // (2 * len(pos) * len(neg))


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(i % 3, (i * 37) % 101 * 9901, 1 if (i * 7) % 10 < 4 else 0)
            for i in range(400)]
    return spark.createDataFrame(rows, "g INT, score_ppm LONG, y LONG")


def test_auc_matches_brute_force(spark, scored):
    got = {r["g"]: r for r in auc_exact(
        scored, "score_ppm", "y", by=["g"]).collect()}
    data = scored.collect()
    for g in (0, 1, 2):
        pairs = [(r["score_ppm"], r["y"]) for r in data if r["g"] == g]
        assert got[g]["auc_x1e6"] == _auc_brute(pairs)
        assert got[g]["n_pos"] == sum(y for _, y in pairs)


def test_auc_degenerate_group_reports_minus_one(spark):
    df = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 1), ("b", 10, 0), ("b", 20, 1)],
        "g STRING, score_ppm LONG, y LONG")
    got = {r["g"]: r["auc_x1e6"] for r in
           auc_exact(df, "score_ppm", "y", by=["g"]).collect()}
    assert got["a"] == -1
    assert got["b"] == PPM  # the one pair is concordant


def test_auc_all_ties_is_half(spark):
    df = spark.createDataFrame(
        [(5, 1)] * 3 + [(5, 0)] * 2, "score_ppm LONG, y LONG")
    row = auc_exact(df, "score_ppm", "y").collect()[0]
    assert row["auc_x1e6"] == PPM // 2
    assert row["tied"] == 6 and row["concordant"] == 0


def test_calibration_bins_and_ece(spark, scored):
    bins = calibration_bins(scored, "score_ppm", "y", n_bins=10)
    rows = bins.collect()
    data = scored.collect()
    assert sum(r["n"] for r in rows) == len(data)
    for r in rows:
        members = [d for d in data
                   if min(9, d["score_ppm"] * 10 // PPM) == r["bin"]]
        assert r["n"] == len(members)
        assert r["n_pos"] == sum(d["y"] for d in members)
        conf = sum(d["score_ppm"] for d in members) // len(members)
        acc = (r["n_pos"] * PPM) // len(members)
        assert r["conf_ppm"] == conf and r["gap_ppm"] == acc - conf
    e = ece(bins).collect()[0]
    want = sum(r["n"] * abs(r["gap_ppm"]) for r in rows) \
        // sum(r["n"] for r in rows)
    assert e["ece_x1e6"] == want and e["n_total"] == len(data)


def test_brier_bigint_and_decimal_paths_agree(spark, scored):
    a = {r["g"]: r["brier_x1e6"] for r in brier_score(
        scored, "score_ppm", "y", by=["g"]).collect()}
    b = {r["g"]: r["brier_x1e6"] for r in brier_score(
        scored, "score_ppm", "y", by=["g"], exact_decimal=True).collect()}
    assert a == b
    data = scored.collect()
    for g in (0, 1, 2):
        rows = [d for d in data if d["g"] == g]
        sse = sum((d["score_ppm"] - d["y"] * PPM) ** 2 for d in rows)
        assert a[g] == sse // (len(rows) * PPM)


def test_drift_index_identity_is_zero(spark, scored):
    row = drift_index(scored, scored, "g").collect()[0]
    assert row["drift_x1e6"] == 0 and row["n_bins"] == 3


def test_drift_index_disjoint_bins(spark):
    old = spark.createDataFrame([("a",)] * 10, "b STRING")
    new = spark.createDataFrame([("z",)] * 10, "b STRING")
    row = drift_index(old, new, "b").collect()[0]
    # old side: a=1e6 -> new share 0; new side: z from old share 0
    assert row["n_bins"] == 2
    assert row["drift_x1e6"] == PPM * PPM // PPM + PPM * PPM // 1
