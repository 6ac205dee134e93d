"""golden_records survivorship vs brute-force union-find + Python
field selection."""

from __future__ import annotations

from pyspark.sql import Row

from logging_spark.operators.linkage import golden_records


def _uf(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def test_golden_records_matches_brute_force(spark):
    recs = [
        Row(rid=1, name="acme corp", price=10, ts=5),
        Row(rid=2, name="acme corporation", price=12, ts=9),
        Row(rid=3, name="acme", price=11, ts=7),
        Row(rid=4, name="zen co", price=30, ts=1),
        Row(rid=5, name="zen company", price=29, ts=2),
        Row(rid=6, name="solo records", price=99, ts=0),
    ]
    pairs = [(1, 2), (2, 3), (4, 5)]
    df = spark.createDataFrame(recs)
    matched = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs])
    got = {r["cluster_id"]: r for r in golden_records(
        df, "rid", matched,
        {"name": "longest", "price": "min", "ts": "max"}).collect()}

    lab = _uf(pairs)
    clusters = {}
    for r in recs:
        clusters.setdefault(lab.get(r.rid, r.rid), []).append(r)
    assert set(got) == set(clusters)
    for cid, members in clusters.items():
        g = got[cid]
        assert g["n_members"] == len(members)
        assert g["name"] == max((m.name for m in members),
                                key=lambda s: (len(s), s))
        assert g["price"] == min(m.price for m in members)
        assert g["ts"] == max(m.ts for m in members)


def test_golden_records_mode_rule(spark):
    recs = [Row(rid=i, brand=b) for i, b in
            enumerate(["x", "x", "y", "y", "y", "z"])]
    matched = spark.createDataFrame(
        [Row(id_a=0, id_b=i) for i in range(1, 6)])
    r = golden_records(spark.createDataFrame(recs), "rid", matched,
                       {"brand": "mode"}).collect()
    assert len(r) == 1
    assert r[0]["brand"] == "y" and r[0]["n_members"] == 6
    # tie goes to the smaller value
    recs2 = [Row(rid=i, brand=b) for i, b in enumerate(["b", "a"])]
    m2 = spark.createDataFrame([Row(id_a=0, id_b=1)])
    r2 = golden_records(spark.createDataFrame(recs2), "rid", m2,
                        {"brand": "mode"}).collect()
    assert r2[0]["brand"] == "a"
