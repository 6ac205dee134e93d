"""operators/dq.py + operators/winsorize.py unit coverage: violation
counting on a known-dirty frame, fingerprint partitioning invariance,
winsorize NULL exclusion."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.operators.dq import dq_checks, table_fingerprint  # noqa: E402
from logging_spark.operators.winsorize import winsorized_stats  # noqa: E402


def test_dq_checks_counts_each_failure_mode(spark):
    df = spark.createDataFrame(
        [(1, "A", 0.5), (2, "B", -1.0), (None, "A", 2.0), (2, None, 0.0)],
        "k int, flag string, v double")
    dim = spark.createDataFrame([(1,), (3,)], "pk int")
    out = {r.check_name: r for r in dq_checks(
        df,
        not_null=["k"],
        ranges={"v": (0.0, 1.0)},
        accepted={"flag": ["A"]},
        unique=[["k"]],
        foreign_keys=[("k", dim, "pk")]).collect()}
    assert out["not_null:k"].n_violations == 1
    assert out["range:v"].n_violations == 2      # -1.0 and 2.0
    assert out["accepted:flag"].n_violations == 1  # 'B'; NULL skipped
    assert out["unique:k"].n_violations == 1     # k=2 twice
    # k=2 twice, both orphans; NULL k skipped entirely
    fk = out["fk:k->pk"]
    assert (fk.n_checked, fk.n_violations, fk.passed) == (3, 2, 0)
    assert out["not_null:k"].passed == 0


def test_fingerprint_is_partitioning_and_order_invariant(spark):
    rows = [(i, f"t{i % 3}") for i in range(97)]
    a = spark.createDataFrame(rows, "id long, g string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, g string") \
        .repartition(13)
    fa = {r.g: (r.fingerprint, r.n_rows)
          for r in table_fingerprint(a, ["id"], group_by=["g"]).collect()}
    fb = {r.g: (r.fingerprint, r.n_rows)
          for r in table_fingerprint(b, ["id"], group_by=["g"]).collect()}
    assert fa == fb and len(fa) == 3


def test_fingerprint_detects_single_row_change(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    b = spark.createDataFrame([(1,), (2,), (4,)], "id long")
    ha = table_fingerprint(a, ["id"]).collect()[0]
    hb = table_fingerprint(b, ["id"]).collect()[0]
    assert ha.n_rows == hb.n_rows == 3
    assert ha.fingerprint != hb.fingerprint


def test_winsorize_excludes_nulls_and_clips_both_tails(spark):
    vals = [float(v) for v in range(1, 100)] + [10000.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)], "g string, v double")
    r = winsorized_stats(df, value="v", group="g",
                         lo_p=0.05, hi_p=0.95).collect()[0]
    assert r.n == 100            # NULL excluded
    assert r.n_clip_hi >= 1      # the 10000 outlier clipped down
    assert r.n_clip_lo >= 1
    # clipped sum is far below the raw sum (outlier suppressed)
    assert r.sum_cents_winsorized < sum(vals) * 100


def test_dq_checks_empty_table_passes_all(spark):
    """Empty input: sums aggregate to NULL in SQL — every check must
    still report 0 violations / passed=1 (round-3 ADVICE)."""
    df = spark.createDataFrame([], "k int, flag string, v double")
    dim = spark.createDataFrame([(1,)], "pk int")
    out = {r["check_name"]: r for r in dq_checks(
        df, not_null=["k"], ranges={"v": (0.0, 1.0)},
        accepted={"flag": ["A", "B"]}, unique=[["k"]],
        foreign_keys=[("k", dim, "pk")]).collect()}
    assert len(out) == 5
    for name, r in out.items():
        assert r["n_violations"] == 0, name
        assert r["passed"] == 1, name


def test_fleiss_kappa_matches_textbook_float(spark):
    from logging_spark.operators.dq import fleiss_kappa
    # Fleiss (1971)-style toy: 6 subjects x 4 raters, 3 categories
    ratings = {
        0: [0, 0, 0, 1], 1: [1, 1, 1, 1], 2: [0, 1, 2, 2],
        3: [2, 2, 2, 2], 4: [0, 0, 1, 1], 5: [1, 2, 2, 2],
    }
    rows = [(s, c) for s, cs in ratings.items() for c in cs]
    df = spark.createDataFrame(rows, "s LONG, cat LONG")
    got = fleiss_kappa(df, "s", "cat").collect()[0]
    # textbook float computation
    import collections
    n, r = len(ratings), 4
    cats = sorted({c for cs in ratings.values() for c in cs})
    nij = {(s, c): collections.Counter(cs)[c]
           for s, cs in ratings.items() for c in cats}
    p_i = [(sum(nij[(s, c)] ** 2 for c in cats) - r) / (r * (r - 1))
           for s in ratings]
    p_bar = sum(p_i) / n
    pj = [sum(nij[(s, c)] for s in ratings) / (n * r) for c in cats]
    p_e = sum(p ** 2 for p in pj)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert got["n_subjects"] == n and got["n_raters"] == r == got["r_min"]
    assert got["n_categories"] == 3
    # integer fixed-point truncates toward zero; allow 1 ulp of 1e-6
    assert abs(got["kappa_x1e6"] - int(kappa * 1_000_000)) <= 1
    assert abs(got["p_bar_x1e6"] - int(p_bar * 1_000_000)) <= 1
    assert abs(got["p_e_x1e6"] - int(p_e * 1_000_000)) <= 1


def test_fleiss_kappa_flags_unbalanced_raters(spark):
    from logging_spark.operators.dq import fleiss_kappa
    rows = [(0, 0), (0, 0), (0, 1), (1, 1), (1, 1)]  # 3 vs 2 raters
    got = fleiss_kappa(
        spark.createDataFrame(rows, "s LONG, cat LONG"),
        "s", "cat").collect()[0]
    assert got["n_raters"] == 3 and got["r_min"] == 2  # surfaced
