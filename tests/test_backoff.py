"""Stupid Backoff trigram scoring vs brute-force Python."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from logging_spark.operators.surprisal import backoff_trigram_score

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "the cat sat on the mat"),          # exact repeat -> tier-1 mass
    (3, "a dog runs fast today maybe"),     # mostly singleton grams
    (4, "the cat ran on the mat"),
    (5, "sat on the mat the cat"),
]


def _brute(min_count=2):
    toks = {i: t.split() for i, t in DOCS}
    uni = Counter(w for ws in toks.values() for w in ws)
    n_total = sum(uni.values())
    bi = Counter(" ".join(ws[i:i + 2]) for ws in toks.values()
                 for i in range(len(ws) - 1))
    tri = Counter(" ".join(ws[i:i + 3]) for ws in toks.values()
                  for i in range(len(ws) - 2))
    out = {}
    for d, ws in toks.items():
        tiers = Counter()
        ssum = 0
        n = 0
        for i in range(len(ws) - 2):
            w1, w2, w3 = ws[i:i + 3]
            g3 = f"{w1} {w2} {w3}"
            g2p, g2s = f"{w1} {w2}", f"{w2} {w3}"
            n += 1
            if tri[g3] >= min_count:
                tiers[1] += 1
                s = (tri[g3] * 1_000_000) // bi[g2p]
            elif bi[g2s] >= min_count:
                tiers[2] += 1
                s = (2 * bi[g2s] * 1_000_000) // (5 * uni[w2])
            else:
                tiers[3] += 1
                s = (4 * uni[w3] * 1_000_000) // (25 * n_total)
            ssum += s
        if n:
            out[d] = (n, tiers[1], tiers[2], tiers[3], ssum, ssum // n)
    return out


def test_backoff_matches_brute_force(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
    got = {r["doc_id"]: (r["n_trigrams"], r["n_tier1"], r["n_tier2"],
                         r["n_tier3"], r["score_sum_ppm"], r["mean_ppm"])
           for r in backoff_trigram_score(df).collect()}
    assert got == _brute()
    # all three tiers are actually exercised by the fixture
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0
    assert sum(v[3] for v in got.values()) > 0
