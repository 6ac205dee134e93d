"""Bitmap membership index (operators/bitmap.py) and incremental
aggregate maintenance (operators/ivm.py): exactness vs brute force,
mergeability, and the delta-application identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logging_spark.operators.bitmap import (
    bitmap_cardinality, bitmap_index, bitmap_merge, bitmap_pair_audit)


@pytest.fixture(scope="module")
def members(spark):
    # sparse-ish non-negative ids, duplicates included, sets overlap
    rows = []
    for m in range(0, 500, 3):
        rows.append(("a", m))
    for m in range(0, 500, 5):
        rows.append(("b", m))
        rows.append(("b", m))  # duplicate member absorbed by bit_or
    for m in range(200, 700, 7):
        rows.append(("c", m))
    return spark.createDataFrame(rows, "set_id string, member long")


def test_cardinality_exact(members):
    got = {r["set_id"]: r["n"] for r in bitmap_cardinality(
        bitmap_index(members, "set_id", "member")).collect()}
    want = {r["set_id"]: r["n"] for r in members.distinct()
            .groupBy("set_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_pair_audit_all_exact(members):
    rows = bitmap_pair_audit(members, "set_id", "member").collect()
    assert len(rows) == 3  # (a,b) (a,c) (b,c)
    for r in rows:
        assert r["exact_match"] == 1, r
        assert r["n_union"] == r["n_a"] + r["n_b"] - r["n_inter"]
        assert 0 <= r["jaccard_ppm"] <= 1_000_000


def test_merge_is_union(members, spark):
    # index(day1) merge index(day2) == index(day1 UNION day2)
    d1 = members.where(F.col("member") < 300)
    d2 = members.where(F.col("member") >= 300)
    merged = bitmap_merge(
        bitmap_index(d1, "set_id", "member")
        .unionByName(bitmap_index(d2, "set_id", "member")))
    full = bitmap_index(members, "set_id", "member")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_block_edge_positions(spark):
    # members 0, 61, 62, 123: exercise both edges of the 62-bit block
    df = spark.createDataFrame(
        [("s", 0), ("s", 61), ("s", 62), ("s", 123)],
        "set_id string, member long")
    idx = {r["block"]: r["bits"] for r in
           bitmap_index(df, "set_id", "member").collect()}
    assert idx[0] == (1 | (1 << 61))
    assert idx[1] == (1 | (1 << 61))
    n = bitmap_cardinality(bitmap_index(df, "set_id", "member")).collect()
    assert n[0]["n"] == 4


# ---------------------------------------------------------------------
# incremental view maintenance


def _agg(df):
    return df.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("val").cast("long").alias("total"))


def test_ivm_identity_with_group_migration(spark):
    from logging_spark.operators.ivm import apply_agg_delta, changeset_full
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40),
         (5, "c", 50)],
        "id long, grp string, val long")
    # 1: value update; 3: GROUP MIGRATION b->a; 5: delete (c empties);
    # 6: insert into new group d
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "a", 20), (3, "a", 30), (4, "b", 40),
         (6, "d", 60)],
        "id long, grp string, val long")
    ch = changeset_full(old, new, ["id"], ["grp", "val"])
    ops = {r["id"]: r["op"] for r in ch.collect()}
    assert ops == {1: "update", 3: "update", 5: "delete", 6: "insert"}
    got = apply_agg_delta(_agg(old), ch, "grp", "val")
    want = _agg(new)
    assert sorted(got.collect()) == sorted(want.collect())
    # the emptied group is gone, not present with n=0
    assert "c" not in {r["grp"] for r in got.collect()}


def test_ivm_empty_changeset_is_identity(spark):
    from logging_spark.operators.ivm import apply_agg_delta, changeset_full
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, grp string, val long")
    ch = changeset_full(old, old, ["id"], ["grp", "val"])
    assert ch.count() == 0
    got = apply_agg_delta(_agg(old), ch, "grp", "val")
    assert sorted(got.collect()) == sorted(_agg(old).collect())
