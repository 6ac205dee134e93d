"""Property-style invariants (SURVEY §5.5): pipeline outputs must not
depend on input row order or partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark import synth
from logging_spark.operators.aggregate import per_sink_counts
from logging_spark.operators.dedup import dedup_latest_wins
from logging_spark.operators.enrich import enrich
from logging_spark.operators.route import route
from logging_spark.operators.rules import load_rules


def _routed(spark, turns):
    lookup = synth.lookup(spark, n_conversations=50)
    rules = load_rules(synth.rules(spark))
    return route(enrich(dedup_latest_wins(turns), lookup), rules)


def test_outputs_invariant_under_input_order_and_partitioning(spark):
    turns = synth.transcripts(spark, n_conversations=50, turns_per_conv=20,
                              hot_conversations=1, hot_factor=10)
    variants = [
        turns,
        turns.orderBy(F.col("ts").desc(), F.col("conv_id").desc()),
        turns.repartition(3),
        turns.coalesce(1),
    ]
    results = []
    for v in variants:
        routed = _routed(spark, v)
        counts = sorted(map(tuple, per_sink_counts(routed).collect()))
        rows = sorted(map(tuple,
                          routed.select("sink_name", "conv_id", "turn_idx",
                                        "text").collect()))
        results.append((counts, rows))
    for other in results[1:]:
        assert other == results[0]


def test_sessionize_capped_matches_reference_walk(spark):
    import random
    from logging_spark.operators.sessionize import sessionize_capped
    rnd = random.Random(11)
    GAP, DUR = 100, 450
    rows = []
    for k in range(6):
        t = 0
        for i in range(rnd.randrange(1, 60)):
            t += rnd.randrange(1, 200)   # gaps straddle GAP; runs of
            rows.append((f"u{k}", len(rows), t))  # small gaps hit DUR
    df = spark.createDataFrame(rows, "k string, eid long, us long")
    got = sorted((r.k, r.us, r.session_id) for r in sessionize_capped(
        df.repartition(5), key="k", ts_us_col="us", gap_us=GAP,
        max_dur_us=DUR, tiebreak="eid").collect())
    # python reference: same sequential rule
    want = []
    series = {}
    for k, eid, us in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        series.setdefault(k, []).append(us)
    for k, uss in series.items():
        sid, start, prev = 1, uss[0], uss[0]
        for us in uss:
            if us - prev > GAP or us - start > DUR:
                sid += 1
                start = us
            want.append((k, us, sid))
            prev = us
    assert got == sorted(want)
    # with an unreachable duration cap it degrades to plain gap
    # sessionization (the lag-window operator)
    from logging_spark.operators.sessionize import sessionize
    plain = sessionize(
        df.withColumn("ts", F.col("us").cast("timestamp")),
        key="k", ts_col="ts", order_tiebreak="eid", gap_seconds=GAP)
    capped = sessionize_capped(df, key="k", ts_us_col="us",
                               gap_us=GAP,
                               max_dur_us=1 << 60, tiebreak="eid")
    a = sorted((r.eid, r.session_id) for r in plain
               .select("eid", "session_id").collect())
    b = sorted((r.eid, r.session_id) for r in capped
               .select("eid", "session_id").collect())
    assert a == b


def test_auc_partitioning_invariant_and_matches_brute(spark):
    import random
    from logging_spark.operators.mleval import PPM, auc_exact
    rnd = random.Random(23)
    rows = [("g" + str(rnd.randrange(2)),
             rnd.randrange(8) * 125_000,       # heavy ties
             rnd.randrange(2)) for _ in range(600)]
    df = spark.createDataFrame(rows, "g STRING, s LONG, y LONG")
    results = []
    for v in (df, df.orderBy(F.desc("s")), df.repartition(7),
              df.coalesce(1)):
        got = sorted(map(tuple,
                         auc_exact(v, "s", "y", by=["g"]).collect()))
        results.append(got)
    assert all(r == results[0] for r in results[1:])
    for g in ("g0", "g1"):
        pos = [s for gg, s, y in rows if gg == g and y == 1]
        neg = [s for gg, s, y in rows if gg == g and y == 0]
        num = sum(2 if p > n else (1 if p == n else 0)
                  for p in pos for n in neg)
        want = (num * PPM) // (2 * len(pos) * len(neg))
        row = next(r for r in results[0] if r[0] == g)
        assert row[-1] == want


def test_token_bucket_matches_python_simulation(spark):
    import random
    from logging_spark.operators.ratelimit import PPM, token_bucket_admit
    rnd = random.Random(7)
    RATE, BURST = 350_000, 4
    rows = []
    for k in ("a", "b", "c"):
        t = 0
        for i in range(rnd.randrange(40, 120)):
            t += rnd.randrange(0, 8_000_000)  # 0..8 s gaps, incl. 0
            rows.append((k, t, i))
    df = spark.createDataFrame(rows, "k STRING, u LONG, tb LONG")
    got = {r["k"]: r for r in token_bucket_admit(
        df.repartition(5), "k", "u", "tb", RATE, BURST).collect()}
    for k in ("a", "b", "c"):
        series = sorted((u, tb) for kk, u, tb in rows if kk == k)
        tok, last, adm = BURST * PPM - PPM, series[0][0], 1
        for u, _ in series[1:]:
            tok = min(BURST * PPM, tok + ((u - last) * RATE) // PPM)
            if tok >= PPM:
                tok -= PPM
                adm += 1
            last = u
        assert got[k]["n_events"] == len(series)
        assert got[k]["n_admitted"] == adm
