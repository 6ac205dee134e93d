"""Streaming Poisson-bootstrap CI (streaming/bootstrap.py): the
snapshot after any stream prefix is row-identical to the batch
operator on the same rows — commutative state, any batch split,
checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.stats import poisson_bootstrap_ci
from logging_spark.streaming.bootstrap import streaming_bootstrap_ci


def _drain(spark, src_glob, out_dir, chk, n_reps=40):
    stream = spark.readStream.schema("id long, v long").parquet(
        src_glob)
    q = (streaming_bootstrap_ci(stream, "id", "v", n_reps=n_reps)
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
def test_streaming_ci_equals_batch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    rows = [Row(id=i, v=100 + (i * 37) % 90) for i in range(600)]
    # arrival order deliberately differs from id order, split across
    # two triggers with a checkpoint stop/restart between them
    b1 = rows[1::2]
    b2 = rows[0::2]
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    mid, n_mid = _latest(spark, out)
    assert n_mid == 300
    batch_mid = poisson_bootstrap_ci(
        spark.createDataFrame(b1), "id", "v").first()
    assert (mid["est_x100"], mid["lo_x100"], mid["hi_x100"]) == (
        batch_mid["est_x100"], batch_mid["lo_x100"],
        batch_mid["hi_x100"])

    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # resume from checkpoint
    snap, n = _latest(spark, out)
    assert n == 600
    batch = poisson_bootstrap_ci(
        spark.createDataFrame(rows), "id", "v").first()
    assert (snap["est_x100"], snap["lo_x100"], snap["hi_x100"]) == (
        batch["est_x100"], batch["lo_x100"], batch["hi_x100"])
    assert snap["lo_x100"] <= snap["est_x100"] <= snap["hi_x100"]
