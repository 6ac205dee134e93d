"""Streaming KMV distinct sketch (streaming/kmv.py): snapshot after
any stream prefix is bit-identical to the batch sketch of the same
rows, across micro-batch splits and checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.kmv import kmv_estimate, kmv_sketch
from logging_spark.streaming.kmv import streaming_kmv_distinct


def _drain(spark, src_glob, out_dir, chk, key_col=None, k=16):
    stream = spark.readStream.schema("key string, v long").parquet(
        src_glob)
    q = (streaming_kmv_distinct(stream, "v", key_col=key_col, k=k)
         .writeStream
         .foreachBatch(lambda df, eid:
                       df.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    w = df.agg(F.max("n_processed").alias("m")).first()["m"]
    return df.where(F.col("n_processed") == w).first(), w


@pytest.mark.slow
def test_streaming_snapshot_equals_batch_sketch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    b1 = [Row(key="a", v=i % 500) for i in range(800)]
    b2 = [Row(key="a", v=i % 900) for i in range(900)]  # 400 new ids
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk, k=16)
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk, k=16)  # checkpoint resume

    snap, n = _latest(spark, out)
    assert n == 1700
    batch = spark.createDataFrame(b1 + b2)
    est = kmv_estimate(kmv_sketch(batch, "v", k=16)).first()
    # bit-identical to the batch sketch of the full prefix
    assert snap["k_used"] == est["k_used"] == 16
    assert snap["kth_hash"] == est["kth_hash"]
    assert snap["est_distinct"] == est["est_distinct"]


@pytest.mark.slow
def test_streaming_kmv_per_key_and_small_keys(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    rows = ([Row(key="big", v=i) for i in range(300)]
            + [Row(key="tiny", v=i % 5) for i in range(50)])
    spark.createDataFrame(rows).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk, key_col="key", k=16)
    df = spark.read.parquet(out)
    got = {r["key"]: r for r in df.collect()}
    # tiny key: fewer distinct than k -> sketch holds all 5, exact-ish
    assert got["tiny"]["k_used"] == 5
    assert got["tiny"]["n_processed"] == 50
    assert got["big"]["k_used"] == 16
    assert got["big"]["n_processed"] == 300
    # estimate within 3/sqrt(16) = 75% of truth (loose; deterministic)
    assert abs(got["big"]["est_distinct"] - 300) <= 225
