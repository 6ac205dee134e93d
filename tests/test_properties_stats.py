"""Hypothesis properties for the seventh-session inference family:
random inputs, exact invariants — isotonic monotonicity + mass
preservation, Mann-Whitney's 2U vs direct pair counting, Pareto
frontier vs the quadratic definition."""

from __future__ import annotations

import itertools
from fractions import Fraction

from hypothesis import given, settings, strategies as st

from logging_spark.operators.mleval import isotonic_fit
from logging_spark.operators.profile import pareto_front
from logging_spark.operators.stats import binned_ks, km_survival

_small = st.integers(min_value=0, max_value=9)


@settings(max_examples=12, deadline=None)
@given(bins=st.lists(
    st.tuples(st.integers(min_value=1, max_value=8),
              st.integers(min_value=0, max_value=8)),
    min_size=1, max_size=8).filter(
        lambda bs: all(s <= w for w, s in bs)))
def test_isotonic_monotone_and_pool_exact(spark_prop, bins):
    spark = spark_prop
    df = spark.createDataFrame(
        [(i, w, s) for i, (w, s) in enumerate(bins)],
        "bin long, w long, s long")
    got = {r["bin"]: r["fit_x1e6"] for r in
           isotonic_fit(df, "bin", "w", "s").collect()}
    fits = [got[i] for i in range(len(bins))]
    # monotone nondecreasing, always
    assert fits == sorted(fits)
    # equals PAVA pool means (floored) — exact rational pools
    pools = []
    for w, s in bins:
        pools.append([w, s])
        while len(pools) > 1 and (
                Fraction(pools[-2][1], pools[-2][0])
                > Fraction(pools[-1][1], pools[-1][0])):
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    exp = []
    for w, s in pools:
        cw = 0
        while cw < w:
            exp.append((1000000 * s) // w)
            cw += bins[len(exp) - 1][0]
    assert fits == exp


@settings(max_examples=12, deadline=None)
@given(pts=st.lists(st.tuples(_small, _small), min_size=1,
                    max_size=20))
def test_pareto_front_matches_definition(spark_prop, pts):
    spark = spark_prop
    df = spark.createDataFrame(
        [(i, q, c) for i, (q, c) in enumerate(pts)],
        "id long, q long, c long")
    got = sorted(r["id"] for r in
                 pareto_front(df, "id", "q", "c").collect())
    exp = [i for i, (q, c) in enumerate(pts)
           if not any(q2 >= q and c2 <= c and (q2 > q or c2 < c)
                      for q2, c2 in pts)]
    assert got == sorted(exp)


@settings(max_examples=10, deadline=None)
@given(subj=st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),
              st.integers(min_value=0, max_value=1)),
    min_size=1, max_size=15))
def test_km_curve_monotone_and_bounded(spark_prop, subj):
    spark = spark_prop
    df = spark.createDataFrame(subj, "d long, o int")
    rows = sorted(km_survival(df, "d", "o").collect(),
                  key=lambda r: r["d"])
    s = [r["s_x1e6"] for r in rows]
    assert all(0 <= v <= 1000000 for v in s)
    assert s == sorted(s, reverse=True)  # survival never increases
    assert rows[0]["n_risk"] == len(subj)


@settings(max_examples=10, deadline=None)
@given(a=st.lists(st.tuples(_small, st.integers(1, 9)), min_size=1,
                  max_size=8, unique_by=lambda t: t[0]),
       b=st.lists(st.tuples(_small, st.integers(1, 9)), min_size=1,
                  max_size=8, unique_by=lambda t: t[0]))
def test_binned_ks_matches_brute(spark_prop, a, b):
    spark = spark_prop
    cur = spark.createDataFrame(a, "b long, c long")
    ref = spark.createDataFrame(b, "b long, c long")
    r = binned_ks(cur, ref, "b", "c").collect()[0]
    ca, cb = dict(a), dict(b)
    na, nb = sum(ca.values()), sum(cb.values())
    cum_a = cum_b = 0
    best = 0
    for bk in sorted(set(ca) | set(cb)):
        cum_a += ca.get(bk, 0)
        cum_b += cb.get(bk, 0)
        best = max(best, abs(cum_a * nb - cum_b * na))
    assert (r["n_cur"], r["n_ref"], r["d_num"]) == (na, nb, best)
