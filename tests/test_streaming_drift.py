"""Streaming binned-KS drift monitor (streaming/drift.py): snapshot
after any prefix equals operators/stats.binned_ks of the same rows
vs the same reference — any batch split, any order, resume."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.stats import binned_ks
from logging_spark.streaming.drift import streaming_drift_ks

REF = {i: 10 for i in range(10)}  # uniform reference, buckets 0..9
BW = 100


def _drain(spark, src_glob, out_dir, chk):
    stream = spark.readStream.schema("id long, v long").parquet(
        src_glob)
    q = (streaming_drift_ks(stream, "v", REF, bucket_width=BW)
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


def _batch_twin(spark, rows):
    cur = (spark.createDataFrame(rows)
           .groupBy((F.col("v") / BW).cast("long").alias("b"))
           .agg(F.count(F.lit(1)).alias("c")))
    ref = spark.createDataFrame(
        [(b, c) for b, c in REF.items()], "b long, c long")
    return binned_ks(cur, ref, "b", "c").first()


@pytest.mark.slow
def test_streaming_drift_equals_batch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    # drifted stream: mass concentrated in the low buckets
    rows = [Row(id=i, v=(i * 37) % 500) for i in range(600)]
    b1, b2 = rows[0::2], rows[1::2]
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    mid, n_mid = _latest(spark, out)
    assert n_mid == 300
    exp_mid = _batch_twin(spark, b1)
    assert (mid["d_num"], mid["d_x1e6"]) == (exp_mid["d_num"],
                                             exp_mid["d_x1e6"])

    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # checkpoint resume
    snap, n = _latest(spark, out)
    assert n == 600
    exp = _batch_twin(spark, rows)
    assert (snap["d_num"], snap["d_x1e6"]) == (exp["d_num"],
                                               exp["d_x1e6"])
    # the planted drift (values only reach bucket 4) is detected
    assert snap["d_x1e6"] > 300000
