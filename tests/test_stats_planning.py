"""Brute-force twins for operators/stats.py, operators/planning.py
and the seventh-session timeseries additions — pure-Python recomputes
on tiny frames, independent of the DuckDB oracles."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from logging_spark.operators.planning import (join_cardinality,
                                              rendezvous_stability)
from logging_spark.operators.stats import (POISSON1_CDF_PPM,
                                           km_survival,
                                           poisson_bootstrap_ci,
                                           welch_ab_test)
from logging_spark.operators.profile import pareto_front
from logging_spark.operators.seqmine import subsequence_support
from logging_spark.operators.timeseries import (acf_integer,
                                                changepoint_single,
                                                missing_hour_ranges)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- acf

def test_acf_matches_brute_force(spark):
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    xs = [3, 0, 5, 1, 4, 4, 0, 2, 7, 1, 0, 3]  # dense hourly counts
    rows = []
    eid = 0
    for h, x in enumerate(xs):
        for _ in range(x):
            rows.append((eid, "k", base + dt.timedelta(hours=h,
                                                       minutes=eid % 50)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp")
    got = {r["lag"]: r for r in
           acf_integer(df, "k", "ts", [1, 3]).collect()}
    # brute force on the n-scaled deviations; note the dense grid
    # spans only hours that HAVE events at the edges (min..max) —
    # xs[1]=0 and xs[10]=0 interior zeros are part of the grid
    lo = min(h for h, x in enumerate(xs) if x)
    hi = max(h for h, x in enumerate(xs) if x)
    series = xs[lo:hi + 1]
    n, s = len(series), sum(series)
    d = [n * x - s for x in series]
    den = sum(v * v for v in d)
    for lag in (1, 3):
        num = sum(d[i] * d[i + lag] for i in range(n - lag))
        assert got[lag]["num"] == num
        assert got[lag]["den"] == den
        sc = 1000000 * num
        trunc = sc // den if sc >= 0 else -((-sc) // den)
        assert got[lag]["acf_x1e6"] == trunc


def test_changepoint_brute_force(spark):
    vals = [5, 6, 5, 5, 20, 21, 19, 22]
    df = spark.createDataFrame(
        [("k", t, v) for t, v in enumerate(vals)],
        "k string, t int, v long")
    r = changepoint_single(df, "k", "t", "v").collect()[0]
    best = None
    tot_s, tot_n = sum(vals), len(vals)
    for cut in range(len(vals) - 1):  # boundary after index `cut`
        sl, nl = sum(vals[:cut + 1]), cut + 1
        sr, nr = tot_s - sl, tot_n - nl
        score = (sl * sl) // nl + (sr * sr) // nr
        if best is None or score > best[0]:
            best = (score, cut, sl, nl, sr, nr)
    assert r["split_t"] == best[1] == 3
    assert r["score"] == best[0]
    assert r["mean_before_x100"] == (best[2] * 100) // best[3]
    assert r["mean_after_x100"] == (best[4] * 100) // best[5]


def test_missing_ranges_complement(spark):
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    present = [0, 1, 4, 5, 6, 9, 15]
    df = spark.createDataFrame(
        [(i, "k", base + dt.timedelta(hours=h)) for i, h in
         enumerate(present)],
        "event_id long, k string, ts timestamp")
    out = sorted((r["range_start"], r["range_end"], r["n_missing"])
                 for r in missing_hour_ranges(df, "k", "ts").collect())
    exp_missing = [h for h in range(16) if h not in present]
    # expected islands: [2,3], [7,8], [10..14]
    assert [(int((a - out[0][0]).total_seconds() // 3600) + 2,
             n) for a, _, n in out] == [(2, 2), (7, 2), (10, 5)]
    assert sum(n for _, _, n in out) == len(exp_missing)


# ----------------------------------------------------------- planning

def test_join_cardinality_exact(spark):
    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, 5]], "k long")
    right = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 3, 3, 3, 4]], "k long")
    r = join_cardinality(left, right, "k").collect()[0]
    actual = left.join(right, "k").count()
    assert r["predicted_rows"] == actual == 3 + 4 + 3
    assert r["n_keys_joined"] == 3
    assert r["max_key_rows"] == 4  # key 2: 2*2
    assert r["max_key_share_ppm"] == (4 * 1000000) // 10


def test_rendezvous_moves_less_than_mod(spark):
    keys = spark.createDataFrame([(i,) for i in range(400)], "k long")
    r = rendezvous_stability(keys, "k", 8, 9).collect()[0]
    assert r["n_keys"] == 400
    # HRW guarantee: a key moves iff the new shard 8 wins its
    # rendezvous — brute-force a few keys
    for k in range(25):
        w = [_h60(f"{k}:{s}") for s in range(9)]
        old = max(range(8), key=lambda s: (w[s], s))
        new = max(range(9), key=lambda s: (w[s], s))
        moved = old != new
        assert moved == (new == 8)
    # and in aggregate it moves ~1/9 while mod moves ~8/9
    assert r["moved_hrw"] < r["moved_mod"]
    assert 40000 < r["moved_hrw_ppm"] < 250000
    assert r["moved_mod_ppm"] > 700000


# -------------------------------------------------------------- stats

def test_poisson_weights_and_ci(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 50) for i in range(300)], "id long, v long")
    r = poisson_bootstrap_ci(df, "id", "v", n_reps=40,
                             seed="boot").collect()[0]
    # replicate 0 brute force
    tot_w = tot_wv = 0
    for i in range(300):
        u = _h60(f"boot:{i}:0") % 1000000
        w = next((k for k, c in enumerate(POISSON1_CDF_PPM) if u < c),
                 len(POISSON1_CDF_PPM))
        v = 100 + (i * 37) % 50
        tot_w += w
        tot_wv += w * v
    assert r["n_rows"] == 300
    assert r["lo_x100"] <= r["est_x100"] <= r["hi_x100"]
    # the full-sample mean is exact
    exact = sum(100 + (i * 37) % 50 for i in range(300))
    assert r["est_x100"] == (100 * exact) // 300


def test_welch_t_matches_python(spark):
    rows = [(i, 100 + (i * 13) % 40 + (60 if i % 2 else 0))
            for i in range(200)]
    df = spark.createDataFrame(rows, "u long, v long")
    r = welch_ab_test(df, "u", "v", seed="ab").collect()[0]
    arms = {0: [], 1: []}
    for u, v in rows:
        arms[_h60(f"ab:{u}") % 2].append(v)
    a, b = arms[0], arms[1]
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    ssa, ssb = sum(x * x for x in a), sum(x * x for x in b)
    t = ((sa / na) - (sb / nb)) / math.sqrt(
        ((ssa - (sa * sa) / na) / (na - 1.0)) / na
        + ((ssb - (sb * sb) / nb) / (nb - 1.0)) / nb)
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["t_x1e6"] == math.floor(t * 1000000)
    assert r["significant"] == (abs(r["t_x1e6"]) >= 1960000)


def test_km_matches_python(spark):
    # (duration, observed) subjects incl. ties and censors
    subj = [(3, 1), (3, 1), (3, 0), (5, 1), (7, 0), (7, 1), (9, 1),
            (9, 1), (11, 0)]
    df = spark.createDataFrame(subj, "d long, o int")
    got = {r["d"]: r for r in km_survival(df, "d", "o").collect()}
    # python KM with the same x1e6 trunc fold
    from collections import Counter
    ev, ce = Counter(), Counter()
    for d, o in subj:
        (ev if o else ce)[d] += 1
    days = sorted(set(ev) | set(ce))
    at_risk = len(subj)
    s = 1000000
    for d in days:
        dd, cc = ev.get(d, 0), ce.get(d, 0)
        s = (s * (at_risk - dd)) // at_risk
        row = got[d]
        assert row["n_risk"] == at_risk
        assert row["d_events"] == dd
        assert row["n_censored"] == cc
        assert row["s_x1e6"] == s
        at_risk -= dd + cc
    assert got[11]["s_x1e6"] == s  # curve ends flat at last censor


# ------------------------------------------------------- pareto front

def test_pareto_front_brute_force(spark):
    import itertools
    pts = [(i, (i * 7) % 13, (i * 5) % 11) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, q long, c long")
    got = sorted(r["id"] for r in
                 pareto_front(df, "id", "q", "c").collect())
    exp = []
    for i, q, c in pts:
        dominated = any(
            q2 >= q and c2 <= c and (q2 > q or c2 < c)
            for _, q2, c2 in pts)
        if not dominated:
            exp.append(i)
    assert got == sorted(exp)
    assert len(got) > 0


# ------------------------------------------------ subsequence support

def test_subsequence_support_brute_force(spark):
    streams = {
        1: list("abcab"),
        2: list("aacb"),
        3: list("bca"),
        4: list("abb"),
    }
    rows = [(u, i, it) for u, s in streams.items()
            for i, it in enumerate(s)]
    df = spark.createDataFrame(rows, "u long, o int, it string")
    got = {(r["pattern"], r["length"]): r["support"] for r in
           subsequence_support(df, "u", "o", "it", "o",
                               min_support=1).collect()}

    def supports(s, pat):
        it = iter(enumerate(s))
        pos = -1
        for p in pat:
            found = False
            for j in range(pos + 1, len(s)):
                if s[j] == p:
                    pos = j
                    found = True
                    break
            if not found:
                return False
        return True

    import itertools
    alphabet = sorted({c for s in streams.values() for c in s})
    for ln in (2, 3):
        for pat in itertools.product(alphabet, repeat=ln):
            sup = sum(supports(s, pat) for s in streams.values())
            key = (">".join(pat), ln)
            if sup >= 1:
                assert got.get(key, 0) == sup, (key, sup)
            else:
                assert key not in got


# ------------------------------------------------- isotonic + neyman

def test_isotonic_matches_pava(spark):
    from logging_spark.operators.mleval import isotonic_fit
    bins = [(0, 10, 1), (1, 5, 4), (2, 8, 3), (3, 4, 4), (4, 6, 1),
            (5, 7, 7)]
    df = spark.createDataFrame(bins, "bin long, w long, s long")
    got = {r["bin"]: r["fit_x1e6"] for r in
           isotonic_fit(df, "bin", "w", "s").collect()}
    # classic PAVA with pool merging, exact rationals via Fraction
    from fractions import Fraction
    pools = []  # (w, s)
    for _, w, s in bins:
        pools.append([w, s])
        while len(pools) > 1 and (
                Fraction(pools[-2][1], pools[-2][0])
                > Fraction(pools[-1][1], pools[-1][0])):
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    # expand each pool back to its member bins
    i = 0
    exp = {}
    for w, s in pools:
        cw = 0
        while cw < w:
            exp[bins[i][0]] = (1000000 * s) // w
            cw += bins[i][1]
            i += 1
    assert got == exp
    # monotone nondecreasing
    vals = [got[b] for b, _, _ in bins]
    assert vals == sorted(vals)


def test_neyman_allocation_exact(spark):
    from logging_spark.operators.sample import neyman_allocation
    rows = []
    for st, (n, lo, hi) in {"a": (50, 10, 200), "b": (200, 100, 104),
                            "c": (80, 0, 1000)}.items():
        for i in range(n):
            rows.append((st, lo + (i * 7919) % (hi - lo + 1)))
    df = spark.createDataFrame(rows, "st string, v long")
    out = {r["stratum"]: r for r in
           neyman_allocation(df, "st", "v", 100).collect()}
    assert sum(r["alloc_n"] for r in out.values()) == 100
    # brute force weights + largest remainder
    import math
    from collections import defaultdict
    by = defaultdict(list)
    for st, v in rows:
        by[st].append(v)
    w = {st: math.floor(math.sqrt(
        len(vs) * sum(x * x for x in vs) - sum(vs) ** 2))
        for st, vs in by.items()}
    W = sum(w.values())
    base = {st: (100 * ww) // W for st, ww in w.items()}
    rem = {st: (100 * ww) % W for st, ww in w.items()}
    left = 100 - sum(base.values())
    order = sorted(w, key=lambda st: (-rem[st], st))
    for st in order[:left]:
        base[st] += 1
    for st in by:
        assert out[st]["weight"] == w[st]
        assert out[st]["alloc_n"] == base[st], st
    # high-variance wide stratum c out-draws the bigger flat b
    assert out["c"]["alloc_n"] > out["b"]["alloc_n"]


# -------------------------------------- raking / venn / dispersion

def test_raking_moves_marginals_toward_uniform(spark):
    from logging_spark.operators.sample import raking_weights
    rows = ([("en", "a")] * 60 + [("en", "b")] * 20 +
            [("de", "a")] * 10 + [("de", "b")] * 10)
    df = spark.createDataFrame(rows, "lang string, src string")
    out = {(r["lang"], r["src"]): r for r in
           raking_weights(df, "lang", "src", rounds=2).collect()}
    # brute-force the same integer chain
    cells = {("en", "a"): 60, ("en", "b"): 20, ("de", "a"): 10,
             ("de", "b"): 10}
    w = {k: 1000000 for k in cells}
    for rnd, dim in enumerate(("lang", "src")):
        pick = (lambda k: k[0]) if dim == "lang" else (lambda k: k[1])
        mass = {}
        for k in cells:
            mass[pick(k)] = mass.get(pick(k), 0) + cells[k] * w[k]
        tot = sum(cells[k] * w[k] for k in cells)
        nlev = len(mass)
        for k in cells:
            f = ((tot // nlev) * 1000000) // mass[pick(k)]
            w[k] = (w[k] * f) // 1000000
    for k, n in cells.items():
        assert out[k]["n"] == n
        assert out[k]["w_x1e6"] == w[k], k
    # the raked lang marginal is (near-)uniform: en mass ~= de mass
    en = sum(cells[k] * w[k] for k in cells if k[0] == "en")
    de = sum(cells[k] * w[k] for k in cells if k[0] == "de")
    raw_gap = abs(80 - 20) / 100
    raked_gap = abs(en - de) / (en + de)
    assert raked_gap < raw_gap / 4


def test_venn_masks_exact(spark):
    from logging_spark.operators.overlap import venn_masks
    ids = spark.createDataFrame([(i,) for i in range(30)], "id long")
    frames = {
        "x": ids.where("id < 20"),
        "y": ids.where("id >= 10"),
        "z": ids.where("id % 2 = 0"),
    }
    got = {r["mask"]: (r["corpora"], r["n_ids"]) for r in
           venn_masks(frames, "id").collect()}
    import collections
    exp = collections.Counter()
    for i in range(30):
        m = (1 if i < 20 else 0) | (2 if i >= 10 else 0) | \
            (4 if i % 2 == 0 else 0)
        exp[m] += 1
    assert {m: n for m, (_, n) in got.items()} == dict(exp)
    assert got[7][0] == "x+y+z"
    assert got[5][0] == "x+z"


def test_overdispersion_brute(spark):
    import datetime as dt
    base = dt.datetime(2024, 4, 1)
    # bursty: all events in 2 of 10 hours; smooth: 1/hour
    rows = []
    for j in range(20):
        rows.append(("bursty", base + dt.timedelta(hours=(j % 2) * 9,
                                                   minutes=j)))
    for j in range(10):
        rows.append(("smooth", base + dt.timedelta(hours=j)))
    from logging_spark.operators.timeseries import overdispersion
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = {r["k"]: r for r in
           overdispersion(df, "k", "ts").collect()}
    assert out["smooth"]["dispersion_ppm"] == 0  # constant series
    # bursty: x = [10,0,...,0,10] over 10 hours: mean 2, var 16
    xs = [10, 0, 0, 0, 0, 0, 0, 0, 0, 10]
    n, s, ssq = len(xs), sum(xs), sum(x * x for x in xs)
    assert out["bursty"]["dispersion_ppm"] == \
        ((n * ssq - s * s) * 1000000) // (n * s)
    assert out["bursty"]["overdispersed"] == 1


# ------------------------------------------- nonparametric inference

def test_mann_whitney_brute_force(spark):
    from logging_spark.operators.stats import mann_whitney_u
    rows = [(i, 50 + (i * 17) % 23 + (9 if i % 3 == 0 else 0))
            for i in range(120)]
    df = spark.createDataFrame(rows, "u long, v long")
    r = mann_whitney_u(df, "u", "v", seed="ab").collect()[0]
    arms = {0: [], 1: []}
    for u, v in rows:
        arms[_h60(f"ab:{u}") % 2].append(v)
    a, b = arms[0], arms[1]
    # 2U by direct pair counting: 2*#(a>b) + #(a==b)
    u2 = sum(2 for x in a for y in b if x > y) + \
        sum(1 for x in a for y in b if x == y)
    assert r["u2"] == u2
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    from collections import Counter
    ties = Counter(a + b)
    t3t = sum(t ** 3 - t for t in ties.values())
    assert r["t3t"] == t3t
    n = len(a) + len(b)
    z = ((u2 - len(a) * len(b)) / 2.0) / math.sqrt(
        (len(a) * len(b) / 12.0) *
        ((n + 1.0) - t3t / (n * (n - 1.0))))
    assert r["z_x1e6"] == math.floor(z * 1000000)


def test_logrank_brute_force(spark):
    from logging_spark.operators.stats import logrank_test
    # group 1 churns systematically earlier -> strongly significant
    subj = [(3 + (i % 4), 1, 1) for i in range(40)] + \
           [(9 + (i % 5), 1, 0) for i in range(40)] + \
           [(14, 0, 0), (14, 0, 1)]
    df = spark.createDataFrame(subj, "d long, o int, g int")
    r = logrank_test(df, "d", "o", "g").collect()[0]
    # python twin with the SAME integer x1e6 truncation
    from collections import defaultdict
    per = defaultdict(lambda: [0, 0, 0, 0])  # da, db, ta, tb
    for d, o, g in subj:
        row = per[d]
        if o and g == 0:
            row[0] += 1
        if o and g == 1:
            row[1] += 1
        row[2 if g == 0 else 3] += 1
    na = sum(1 for d, o, g in subj if g == 0)
    nb = len(subj) - na
    o_a = e6 = v6 = 0
    for d in sorted(per):
        da, db, ta, tb = per[d]
        dt, nt = da + db, na + nb
        o_a += da
        e6 += (dt * na * 1000000) // nt
        if nt > 1:
            v6 += (dt * (nt - dt) * na * nb * 1000000) // \
                (nt * nt * (nt - 1))
        na -= ta
        nb -= tb
    assert (r["o_a"], r["e_a_x1e6"], r["v_x1e6"]) == (o_a, e6, v6)
    z = (o_a * 1000000.0 - e6) / math.sqrt(v6 * 1000000.0)
    assert r["z_x1e6"] == math.floor(z * 1000000)
    assert r["significant"] == 1


def test_theil_sen_robust_to_outlier(spark):
    from logging_spark.operators.timeseries import theil_sen
    # clean slope 3/day with one wild outlier at day 5
    pts = [(d, 10 + 3 * d + (500 if d == 5 else 0))
           for d in range(12)]
    df = spark.createDataFrame([("k", x, y) for x, y in pts],
                               "k string, x long, y long")
    r = theil_sen(df, "k", "x", "y").collect()[0]
    slopes = sorted(
        ((y2 - y1) * 1000000) // (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for x2, y2 in pts[i + 1:])
    m = len(slopes)
    assert r["n_pairs"] == m == 66
    assert r["slope_x1e6"] == slopes[(m + 1) // 2 - 1]
    # the outlier does not move the median slope off 3.0
    assert r["slope_x1e6"] == 3000000


def test_crosscorr_detects_planted_lead(spark):
    import datetime as dt
    from logging_spark.operators.timeseries import cross_correlation
    base = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    # A spikes at hours {5, 15, 25, 35}; B spikes exactly 3h later
    for h in range(48):
        na = 8 if h % 10 == 5 else 1
        nb = 8 if h % 10 == 8 else 1
        for _ in range(na):
            rows.append(("error", base + dt.timedelta(hours=h)))
        for _ in range(nb):
            rows.append(("purchase", base + dt.timedelta(hours=h)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["lag"]: r for r in cross_correlation(
        df, "event_type", "ts", "error", "purchase",
        max_lag=5).collect()}
    assert len(out) == 11
    best = [lag for lag, r in out.items() if r["is_best"]]
    assert best == [3]
    assert sum(r["is_best"] for r in out.values()) == 1


def test_churn_labels_temporal_hygiene(spark):
    import datetime as dt
    from logging_spark.operators.cohort import churn_labels
    c = dt.datetime(2024, 1, 20)
    rows = [
        # u1: active before, silent after -> churned
        (1, "click", c - dt.timedelta(days=2)),
        (1, "view", c - dt.timedelta(days=1, hours=5)),
        # u2: active before AND after -> retained
        (2, "click", c - dt.timedelta(hours=3)),
        (2, "click", c + dt.timedelta(days=2)),
        # u3: only active AFTER cutoff -> excluded (no feature row)
        (3, "view", c + dt.timedelta(days=1)),
        # u4: active before the feature window only -> excluded
        (4, "view", c - dt.timedelta(days=10)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["user_id"]: r for r in churn_labels(
        df, "user_id", "ts", "2024-01-20 00:00:00").collect()}
    assert set(out) == {1, 2}
    assert out[1]["churned"] == 1 and out[2]["churned"] == 0
    assert out[1]["n_events"] == 2 and out[1]["n_types"] == 2
    # both u1 feature events fall on 2024-01-18 -> one active day
    assert out[1]["days_active"] == 1
    assert out[1]["recency_hours"] == 29
    assert out[2]["recency_hours"] == 3


def test_bootstrap_fast_partitioning_invariant(spark):
    from logging_spark.operators.stats import poisson_bootstrap_ci
    df = spark.createDataFrame(
        [(i, 200 + (i * 31) % 70) for i in range(400)], "id long, v long")
    a = poisson_bootstrap_ci(df, "id", "v", fast=True).collect()[0]
    b = poisson_bootstrap_ci(df.repartition(13), "id", "v",
                             fast=True).collect()[0]
    assert a == b
    assert a["lo_x100"] <= a["est_x100"] <= a["hi_x100"]


def test_anova_brute_force(spark):
    from logging_spark.operators.stats import anova_oneway
    rows = [("t1", g, 10 * g + (i % 3)) for g in range(4)
            for i in range(6)]
    df = spark.createDataFrame(rows, "series string, g int, y long")
    r = anova_oneway(df, "series", "g", "y").collect()[0]
    vals = {g: [10 * g + (i % 3) for i in range(6)] for g in range(4)}
    N = 24
    S = sum(sum(v) for v in vals.values())
    SSQ = sum(x * x for v in vals.values() for x in v)
    B = sum((sum(v) ** 2 * 1000000) // len(v) for v in vals.values())
    ssb = B - (S * S * 1000000) // N
    ssw = SSQ * 1000000 - B
    assert (r["n"], r["k"]) == (24, 4)
    assert r["ssb_x1e6"] == ssb
    assert r["ssw_x1e6"] == ssw
    assert r["eta2_ppm"] == (ssb * 1000000) // (ssb + ssw)
    f = (ssb / (4 - 1.0)) / (ssw / (24 - 4.0))
    assert r["f_x1e6"] == math.floor(f * 1000000)
    # group means dominate within-noise: eta^2 near 1
    assert r["eta2_ppm"] > 990000


def test_simpson_flip_detects_reversal(spark):
    from logging_spark.operators.dq import simpson_flip
    # classic construction: within each group y DECREASES with x,
    # but the high-x group has uniformly higher y -> pooled increases
    rows = ([("lo", x, 50 - x) for x in range(10)] +
            [("hi", x + 100, 250 - x) for x in range(10)])
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in simpson_flip(df, "g", "x", "y").collect()}
    assert out["lo"]["cov_num"] < 0 and out["hi"]["cov_num"] < 0
    assert out["lo"]["pooled_cov_num"] > 0
    assert out["lo"]["flip"] == 1 and out["hi"]["flip"] == 1


def test_ks_brute_force(spark):
    from logging_spark.operators.stats import ks_test
    rows = [(i, 10 + (i * 7) % 30 + (25 if i % 2 == 0 else 0))
            for i in range(150)]
    df = spark.createDataFrame(rows, "u long, v long")
    r = ks_test(df, "u", "v", seed="ab").collect()[0]
    arms = {0: [], 1: []}
    for u, v in rows:
        arms[_h60(f"ab:{u}") % 2].append(v)
    a, b = sorted(arms[0]), sorted(arms[1])
    na, nb = len(a), len(b)
    import bisect
    vals = sorted(set(a + b))
    d_num = max(abs(bisect.bisect_right(a, v) * nb
                    - bisect.bisect_right(b, v) * na) for v in vals)
    assert (r["n_a"], r["n_b"], r["d_num"]) == (na, nb, d_num)
    d = d_num / (na * nb)
    assert r["d_x1e6"] == math.floor(d * 1000000)
    thr = 1.358 * math.sqrt((na + nb) / (na * nb))
    assert r["thr_x1e6"] == math.floor(thr * 1000000)
    assert r["significant"] == (r["d_x1e6"] > r["thr_x1e6"])


def test_chi2_brute_force(spark):
    from logging_spark.operators.stats import chi2_independence
    rows = [("a", 0)] * 30 + [("a", 1)] * 10 + \
           [("b", 0)] * 12 + [("b", 1)] * 28
    df = spark.createDataFrame(rows, "r string, c int")
    out = chi2_independence(df, "r", "c", crit_x1e6=3841000).collect()[0]
    # brute force in the SAME sorted-fold order
    from collections import Counter
    cells = Counter(rows)
    rm = Counter(r for r, _ in rows)
    cm = Counter(c for _, c in rows)
    n = len(rows)
    chi2 = 0.0
    for (r, c) in sorted(cells):
        e = (rm[r] * cm[c]) / n
        chi2 = chi2 + ((cells[(r, c)] - e) * (cells[(r, c)] - e)) / e
    assert out["n"] == n and out["df"] == 1
    assert out["chi2_x1e6"] == math.floor(chi2 * 1000000)
    assert out["significant"] == 1  # strong association planted


def test_run_job_predict_flag(spark, tmp_path, capsys):
    import json
    import run_job
    rc = run_job.main([
        "--warehouse", str(tmp_path / "wh"), "--n-conversations", "50",
        "--turns-per-conv", "10", "--num-buckets", "4",
        "--snapshot", "v1", "--predict", "--no-warmup"])
    assert rc == 0
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    pred = next(ln["predict"] for ln in lines if "predict" in ln)
    assert pred["n_keys_joined"] == 50
    assert pred["predicted_rows"] > 0
    # the synthetic hot conversations dominate the join — the
    # pre-flight line is exactly what flags them
    assert pred["max_key_share_ppm"] > 100000


def test_covariate_balance_detects_imbalance(spark):
    from logging_spark.operators.stats import covariate_balance
    # biased covariate: value correlated with the md5 arm itself
    rows = []
    # n must dominate SMD sampling noise (~2/sqrt(n)): 3000 rows
    # put a truly arm-independent covariate well under the 0.1 bar
    for i in range(3000):
        arm = _h60(f"ab:{i}") % 2
        rows.append((i, 50 + (i * 13) % 20,  # balanced covariate
                     100 + 80 * arm + (i * 7) % 10))  # biased one
    df = spark.createDataFrame(rows, "u long, fair long, biased long")
    out = {r["cov"]: r for r in covariate_balance(
        df, "u", ["fair", "biased"]).collect()}
    assert out["fair"]["balanced"] == 1
    assert out["biased"]["balanced"] == 0
    assert abs(out["biased"]["smd_x1e6"]) > 1000000  # SMD >> 1
    # brute-force the fair covariate's SMD
    import statistics
    arms = {0: [], 1: []}
    for i, fair, _ in rows:
        arms[_h60(f"ab:{i}") % 2].append(fair)
    smd = (statistics.mean(arms[0]) - statistics.mean(arms[1])) / \
        math.sqrt((statistics.variance(arms[0])
                   + statistics.variance(arms[1])) / 2.0)
    assert abs(out["fair"]["smd_x1e6"] / 1e6 - smd) < 1e-3


def test_covariate_balance_constant_covariate(spark):
    from logging_spark.operators.stats import covariate_balance
    df = spark.createDataFrame([(i, 7) for i in range(100)],
                               "u long, c long")
    r = covariate_balance(df, "u", ["c"]).collect()[0]
    assert r["smd_x1e6"] == 0 and r["balanced"] == 1


def test_ab_bootstrap_delta_brute_replicate(spark):
    from logging_spark.operators.stats import (POISSON1_CDF_PPM,
                                               ab_bootstrap_delta)
    rows = [(i, 100 + (i * 19) % 60) for i in range(240)]
    df = spark.createDataFrame(rows, "u long, v long")
    r = ab_bootstrap_delta(df, "u", "v").collect()[0]
    # point delta matches the direct per-arm means
    arms = {0: [], 1: []}
    for u, v in rows:
        arms[_h60(f"ab:{u}") % 2].append(v)
    pt = (100 * sum(arms[0])) // len(arms[0]) - \
         (100 * sum(arms[1])) // len(arms[1])
    assert r["delta_x100"] == pt
    assert (r["n_a"], r["n_b"]) == (len(arms[0]), len(arms[1]))
    # replicate 0 delta brute force
    wa = wv_a = wb = wv_b = 0
    for u, v in rows:
        uu = _h60(f"boot:{u}:0") % 1000000
        w = next((k for k, c in enumerate(POISSON1_CDF_PPM)
                  if uu < c), len(POISSON1_CDF_PPM))
        if _h60(f"ab:{u}") % 2 == 0:
            wa += w
            wv_a += w * v
        else:
            wb += w
            wv_b += w * v
    d0 = (100 * wv_a) // max(wa, 1) - (100 * wv_b) // max(wb, 1)
    # d0 must be one of the sorted replicate deltas inside the CI
    # span or at its edges; at minimum the CI must bracket the
    # point estimate for this well-behaved fixture
    assert r["lo_x100"] <= r["delta_x100"] <= r["hi_x100"]
    assert r["lo_x100"] <= d0 <= r["hi_x100"] or d0 in (
        r["lo_x100"], r["hi_x100"])
