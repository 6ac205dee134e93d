"""Streaming CUSUM (streaming/anomaly.py): snapshots bit-identical to
the batch fold of the same ordered prefix; out-of-order arrivals flag
in_order=false instead of silently folding wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.timeseries import cusum_fold
from logging_spark.streaming.anomaly import streaming_cusum


def _drain(spark, src_glob, out_dir, chk):
    stream = spark.readStream.schema(
        "key string, o long, v long, k long").parquet(src_glob)
    q = (streaming_cusum(stream, "key", "o", "v", "k")
         .writeStream
         .foreachBatch(lambda df, eid:
                       df.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _latest(spark, out_dir, key):
    df = spark.read.parquet(out_dir).where(F.col("key") == key)
    m = df.agg(F.max("n_points").alias("m")).first()["m"]
    return df.where(F.col("n_points") == m).first()


def _series(key, lo, hi, shift_at=None):
    rows = []
    for i in range(lo, hi):
        v = (i * 13) % 7 + 10 + (25 if shift_at is not None
                                 and i >= shift_at else 0)
        rows.append(Row(key=key, o=i, v=v, k=13))
    return rows


@pytest.mark.slow
def test_streaming_cusum_equals_batch_fold(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    b1 = _series("svc", 0, 40, shift_at=30)
    b2 = _series("svc", 40, 90, shift_at=30)
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # checkpoint resume

    snap = _latest(spark, out, "svc")
    batch = cusum_fold(spark.createDataFrame(b1 + b2),
                       "key", "o", "v", "k").first()
    assert snap["in_order"]
    assert snap["n_points"] == batch["n_points"] == 90
    assert snap["ref_k"] == batch["ref_k"]
    assert snap["peak_cusum"] == batch["peak_cusum"]
    assert snap["peak_pos"] == batch["peak_pos"]
    assert snap["peak_pos"] == 90  # monotone climb after the shift


@pytest.mark.slow
def test_streaming_cusum_flags_out_of_order(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    spark.createDataFrame(_series("a", 10, 20)).coalesce(1) \
        .write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    # a second trigger whose rows sort BEFORE the processed prefix
    spark.createDataFrame(_series("a", 0, 5)).coalesce(1) \
        .write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)
    snap = _latest(spark, out, "a")
    assert snap["n_points"] == 15
    assert not snap["in_order"]


@pytest.mark.slow
def test_streaming_cusum_crash_restart_recovery(spark, tmp_path):
    """Injected sink failure mid-stream, then restart from the same
    checkpoint: the fold state rolls back to the committed batch and
    the recovered snapshot equals both the uninterrupted run and the
    batch fold (no double-folding of the replayed batch)."""
    src = str(tmp_path / "src")
    b1 = _series("svc", 0, 40, shift_at=30)
    b2 = _series("svc", 40, 90, shift_at=30)
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")

    def run(out, chk, crash_at=None):
        stream = spark.readStream.schema(
            "key string, o long, v long, k long") \
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*")

        def sink(df, bid):
            if crash_at is not None and bid >= crash_at:
                raise RuntimeError("injected crash")
            df.write.mode("append").parquet(out)

        q = (streaming_cusum(stream, "key", "o", "v", "k")
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", chk)
             .outputMode("update").trigger(availableNow=True).start())
        try:
            q.awaitTermination(120)
        except Exception:
            assert crash_at is not None
        finally:
            q.stop()

    out, chk = str(tmp_path / "c_out"), str(tmp_path / "c_chk")
    run(out, chk, crash_at=1)   # batch 0 commits, batch 1 dies
    run(out, chk)               # recover from checkpoint
    snap = _latest(spark, out, "svc")
    batch = cusum_fold(spark.createDataFrame(b1 + b2),
                       "key", "o", "v", "k").first()
    assert snap["in_order"]
    assert snap["n_points"] == batch["n_points"] == 90
    assert snap["peak_cusum"] == batch["peak_cusum"]
    assert snap["peak_pos"] == batch["peak_pos"]
