"""Streaming Welch monitor (streaming/abtest.py): snapshot after any
prefix is row-identical to batch welch_ab_test on the same units —
any split, any order, checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.stats import welch_ab_test
from logging_spark.streaming.abtest import streaming_welch_monitor


def _drain(spark, src_glob, out_dir, chk):
    stream = spark.readStream.schema("u long, v long").parquet(
        src_glob)
    q = (streaming_welch_monitor(stream, "u", "v")
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
def test_streaming_welch_equals_batch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    rows = [Row(u=i, v=100 + (i * 13) % 40 + (25 if i % 2 else 0))
            for i in range(400)]
    b1, b2 = rows[1::2], rows[0::2]
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    mid, n_mid = _latest(spark, out)
    assert n_mid == 200
    bm = welch_ab_test(spark.createDataFrame(b1), "u", "v").first()
    assert (mid["n_a"], mid["n_b"], mid["t_x1e6"],
            mid["significant"]) == (bm["n_a"], bm["n_b"],
                                    bm["t_x1e6"], bm["significant"])

    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # resume
    snap, n = _latest(spark, out)
    assert n == 400
    bb = welch_ab_test(spark.createDataFrame(rows), "u", "v").first()
    assert (snap["n_a"], snap["n_b"], snap["t_x1e6"],
            snap["significant"]) == (bb["n_a"], bb["n_b"],
                                     bb["t_x1e6"], bb["significant"])
