"""Streaming bounded-state heavy hitters (streaming/topk.py): MG
superset + error-bound guarantees across micro-batches, state bounded
by capacity."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.streaming.topk import streaming_heavy_hitters


def _drain(spark, src_dir, out_dir, chk):
    # foreachBatch parquet append: the memory sink cannot recover from
    # a checkpoint, and the parquet sink rejects update mode
    stream = spark.readStream.schema("item string").parquet(src_dir)
    q = (streaming_heavy_hitters(stream, col="item", n_buckets=1,
                                 capacity=8)
         .writeStream
         .foreachBatch(lambda df, eid:
                       df.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _latest_snapshot(spark, out_dir):
    df = spark.read.parquet(out_dir)
    top = df.agg(F.max("n_processed").alias("m")).collect()[0]["m"]
    rows = df.where(F.col("n_processed") == top).collect()
    return {r["item"]: r["est_count"] for r in rows}, top


@pytest.mark.slow
def test_mg_guarantees_across_batches(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    # batch 1: hot x30 + 10 distinct noise; batch 2: hot x20 + warm x12
    out = str(tmp_path / "out")
    b1 = [Row(item="hot")] * 30 + [Row(item=f"n{i}") for i in range(10)]
    b2 = [Row(item="hot")] * 20 + [Row(item="warm")] * 12
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)

    snap, n = _latest_snapshot(spark, out)
    assert n == 72  # state carried across drains (checkpoint resume)
    # MG guarantees with capacity c=8: every item with freq > n/(c+1)=8
    # is present, and estimates undercount by at most n/(c+1)
    err = n // 9
    assert "hot" in snap and "warm" in snap
    assert 50 - err <= snap["hot"] <= 50
    assert 12 - err <= snap["warm"] <= 12
    # bounded state: never more than capacity candidates
    assert len(snap) <= 8


@pytest.mark.slow
def test_bucketing_splits_state(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    rows = [Row(item=f"t{i % 20}") for i in range(200)]
    spark.createDataFrame(rows).coalesce(1).write.parquet(f"{src}/p1")
    stream = spark.readStream.schema("item string").parquet(f"{src}/p*")
    q = (streaming_heavy_hitters(stream, col="item", n_buckets=4,
                                 capacity=16)
         .writeStream.format("memory").queryName("hhb")
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    df = spark.table("hhb")
    # per-bucket n_processed sums to the stream total; with uniform
    # items and per-bucket capacity 16 every item survives exactly
    per_bucket = {r["bucket"]: r["n_processed"]
                  for r in df.select("bucket", "n_processed").distinct()
                             .collect()}
    assert sum(per_bucket.values()) == 200
    assert df.select("item").distinct().count() == 20
