"""Quantile normalization (operators/normalize.py) vs brute force."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import Row

from logging_spark.operators.normalize import quantile_normalize


def test_quantile_normalize_matches_brute_force(spark):
    rnd = random.Random(2)
    rows = [Row(g=f"g{i % 3}", v=rnd.randint(0, 500)) for i in range(800)]
    L = 100
    res = quantile_normalize(spark.createDataFrame(rows), "g", "v",
                             levels=L).collect()
    got = {(r["g"], r["v"]): (r["n_group"], r["r"], r["q"],
                              r["norm_value"]) for r in res}
    assert len(got) == len(res)  # one row per collapsed (group, value)

    N = len(rows)
    gcnt = Counter(r.v for r in rows)

    def level_value(p):
        cum = 0
        for gv in sorted(gcnt):
            cum += gcnt[gv]
            if cum * L >= p * N:
                return gv

    for g in ("g0", "g1", "g2"):
        cnt = Counter(r.v for r in rows if r.g == g)
        n = sum(cnt.values())
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            q = (cum * L + n - 1) // n
            assert got[(g, v)] == (n, cum, q, level_value(q)), (g, v)


def test_quantile_normalize_single_group_is_near_identity(spark):
    """One group == the global distribution: with levels >= n the map
    sends every value to itself (rank-preserving identity)."""
    rows = [Row(g="all", v=v) for v in [3, 8, 8, 15, 40, 41, 99, 100]]
    res = quantile_normalize(spark.createDataFrame(rows), "g", "v",
                             levels=1000).collect()
    assert all(r["norm_value"] == r["v"] for r in res)


def test_quantile_normalize_aligns_shifted_groups(spark):
    """Group B = group A shifted by +1000: after normalization the
    same within-group rank maps to the same global level."""
    base = list(range(100))
    rows = ([Row(g="a", v=v) for v in base]
            + [Row(g="b", v=v + 1000) for v in base])
    res = quantile_normalize(spark.createDataFrame(rows), "g", "v",
                             levels=50).collect()
    qa = {r["r"]: r["norm_value"] for r in res if r["g"] == "a"}
    qb = {r["r"]: r["norm_value"] for r in res if r["g"] == "b"}
    assert qa.keys() == qb.keys()
    assert qa == qb  # identical rank -> identical normalized value
