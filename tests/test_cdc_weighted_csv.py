"""CDC changeset/apply round-trip, distributed weighted median, CSV
ingest with quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark.operators.diff import apply_changes, changeset
from logging_spark.operators.weighted import weighted_median


def test_changeset_apply_roundtrip(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, s string, v int")
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged
         (2, "B", 20),          # changed payload
         (4, "d", 41),          # changed payload
         (5, "e", 50)],         # added; 3 removed
        "k int, s string, v int")
    ch = changeset(old, new, ["k"], ["s", "v"])
    ops = {(r["k"], r["op"]) for r in ch.collect()}
    assert ops == {(2, "upsert"), (4, "upsert"), (5, "upsert"),
                   (3, "delete")}
    recon = apply_changes(old, ch, ["k"], ["s", "v"])
    assert sorted(map(tuple, recon.collect())) == sorted(
        map(tuple, new.collect()))


def test_apply_changes_idempotent(spark):
    old = spark.createDataFrame([(1, "a", 1), (2, "b", 2)],
                                "k int, s string, v int")
    new = spark.createDataFrame([(1, "a", 9)], "k int, s string, v int")
    ch = changeset(old, new, ["k"], ["s", "v"])
    once = apply_changes(old, ch, ["k"], ["s", "v"])
    twice = apply_changes(once, ch, ["k"], ["s", "v"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect()))


def test_weighted_median_matches_expanded_multiset(spark):
    import statistics
    rows = [(5, 1), (1, 3), (9, 2), (3, 4)]
    df = spark.createDataFrame(rows, "v int, w int")
    got = weighted_median(df, "v", "w").first()
    expanded = sorted(sum(([v] * w for v, w in rows), []))
    # lower weighted median: first value where 2*cumweight >= total
    n = len(expanded)
    lower = expanded[(n - 1) // 2] if n % 2 else expanded[n // 2 - 1]
    assert got["total_weight"] == n == 10
    assert got["median"] == lower == statistics.median_low(expanded)


def test_weighted_median_many_partitions(spark):
    df = (spark.range(10001).select(F.col("id").alias("v"),
                                    F.lit(1).alias("w"))
          .repartition(16))
    got = weighted_median(df, "v", "w", num_partitions=8).first()
    assert got["median"] == 5000 and got["total_weight"] == 10001


def test_weighted_median_empty(spark):
    df = spark.createDataFrame([], "v int, w int")
    got = weighted_median(df, "v", "w").first()
    assert got["total_weight"] == 0 and got["median"] is None


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    from logging_spark.sources.csv import (quarantine_split, read_csv,
                                           write_csv)
    schema = "k int, s string, v double"
    df = spark.createDataFrame(
        [(1, 'comma, "quote"', 1.5), (2, None, 2.5),
         (3, "", 3.5), (4, "line\nbreak? no: escaped", 4.5)],
        schema)
    # embedded newline would break splitting: writer must escape or
    # the value must not contain raw \n — we assert the round-trip
    p = str(tmp_path / "csv")
    write_csv(df.where("k <= 3"), p, n_shards=2)
    back = read_csv(spark, p, schema)
    clean, dead = quarantine_split(back)
    assert dead.count() == 0
    got = {r["k"]: (r["s"], r["v"]) for r in clean.collect()}
    assert got[1] == ('comma, "quote"', 1.5)
    assert got[2] == (None, 2.5)   # NULL survives as NULL
    assert got[3] == ("", 3.5)     # empty string survives as ''


def test_csv_malformed_rows_quarantined(spark, tmp_path):
    from logging_spark.sources.csv import quarantine_split, read_csv
    p = str(tmp_path / "raw")
    import os
    os.makedirs(p)
    with open(f"{p}/part.csv", "w") as f:
        f.write("k,s,v\n1,ok,1.5\nnot_an_int,bad,2.5\n3,ok,3.5\n")
    back = read_csv(spark, p, "k int, s string, v double")
    clean, dead = quarantine_split(back)
    assert clean.count() == 2
    assert dead.count() == 1
    assert "not_an_int" in dead.first()["raw_line"]
