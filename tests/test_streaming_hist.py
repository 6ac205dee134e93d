"""Streaming histogram sketch (streaming/hist.py): the snapshot after
any stream prefix is bit-identical (commutative fingerprint + median
edge) to the batch sketch of the same rows, across micro-batch splits
and checkpoint resume — exact mergeability means zero streaming
drift."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.sketch import histogram_sketch
from logging_spark.streaming.hist import (streaming_histogram,
                                          summarize_sketch)


def _drain(spark, src_glob, out_dir, chk, key_col=None, w=6):
    stream = spark.readStream.schema("key string, v long").parquet(
        src_glob)
    q = (streaming_histogram(stream, "v", key_col=key_col,
                             width_pow2=w)
         .writeStream
         .foreachBatch(lambda df, eid:
                       df.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    m = df.agg(F.max("n_processed").alias("m")).first()["m"]
    return df.where(F.col("n_processed") == m).first(), m


def _batch_summary(spark, rows, w=6):
    sk = histogram_sketch(spark.createDataFrame(rows), "v",
                          width_pow2=w)
    pairs = {r["bucket"]: r["cnt"] for r in sk.collect()}
    return summarize_sketch(pairs, w)


@pytest.mark.slow
def test_streaming_snapshot_equals_batch_sketch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    b1 = [Row(key="a", v=(i * 37) % 3000) for i in range(900)]
    b2 = [Row(key="a", v=(i * 11) % 5000) for i in range(700)]
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # checkpoint resume

    snap, n = _latest(spark, out)
    assert n == 1600
    bn, bb, bmed, bfp = _batch_summary(spark, b1 + b2)
    assert (snap["n_processed"], snap["n_buckets"],
            snap["median_edge"], snap["fingerprint"]) == (bn, bb,
                                                          bmed, bfp)


@pytest.mark.slow
def test_streaming_hist_per_key(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    rows = ([Row(key="hot", v=i % 2000) for i in range(500)]
            + [Row(key="cold", v=64 * 3) for _ in range(9)])
    spark.createDataFrame(rows).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk, key_col="key")
    got = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert got["hot"]["n_processed"] == 500
    # all cold rows share one bucket; median edge is that bucket's lo
    assert got["cold"]["n_buckets"] == 1
    assert got["cold"]["median_edge"] == 64 * 3
    bn, bb, bmed, bfp = _batch_summary(
        spark, [Row(key="x", v=r["v"]) for r in rows if r["key"] == "hot"])
    assert (got["hot"]["n_buckets"], got["hot"]["median_edge"],
            got["hot"]["fingerprint"]) == (bb, bmed, bfp)
