"""Streaming Holt-Winters (streaming/holtwinters.py): snapshots pinned
bit-identical to the batch fold of the same ordered prefix, across a
checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.timeseries import holt_winters_fold
from logging_spark.streaming.holtwinters import streaming_holt_winters


def _drain(spark, src_glob, out_dir, chk, period=7):
    stream = spark.readStream.schema(
        "key string, o long, v long").parquet(src_glob)
    q = (streaming_holt_winters(stream, "key", "o", "v", period=period)
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


def _series(key, lo, hi):
    return [Row(key=key, o=t,
                v=1000 + 5 * t + [0, 50, 100, 50, 0, -50, -100][t % 7])
            for t in range(lo, hi)]


@pytest.mark.slow
def test_streaming_hw_equals_batch_fold(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    b1 = _series("svc", 0, 10)    # still warming up (< 2m = 14)
    b2 = _series("svc", 10, 40)   # crosses init and folds on
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    warm = _latest(spark, out, "svc")
    assert warm["phase"] == "warmup" and warm["n_points"] == 10

    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # checkpoint resume
    snap = _latest(spark, out, "svc")
    batch = holt_winters_fold(spark.createDataFrame(b1 + b2),
                              "key", "o", "v", period=7).first()
    assert snap["phase"] == "fold" and snap["in_order"]
    assert snap["n_points"] == batch["n_points"] == 40
    for c in ("level_x1000", "trend_x1000", "season_next_x1000",
              "forecast_x1000"):
        assert snap[c] == batch[c], c


@pytest.mark.slow
def test_streaming_hw_flags_out_of_order(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    spark.createDataFrame(_series("svc", 0, 20)).coalesce(1) \
        .write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    # a late row BEHIND the watermark-free cursor: flagged, not wrong-folded
    spark.createDataFrame(_series("svc", 5, 6)).coalesce(1) \
        .write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)
    snap = _latest(spark, out, "svc")
    assert snap["n_points"] == 21 and snap["in_order"] is False


@pytest.mark.slow
def test_streaming_hw_crash_restart_recovery(spark, tmp_path):
    """Injected sink failure mid-stream, restart from the same
    checkpoint: warmup-buffer + fold state must roll back to the
    committed batch and the recovered snapshot must equal the batch
    fold (no double-folding of the replayed rows)."""
    src = str(tmp_path / "src")
    b1 = _series("svc", 0, 12)   # crash lands while still in warmup
    b2 = _series("svc", 12, 40)
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")

    def run(out, chk, crash_at=None):
        stream = spark.readStream.schema(
            "key string, o long, v long") \
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*")

        def sink(df, bid):
            if crash_at is not None and bid >= crash_at:
                raise RuntimeError("injected crash")
            df.write.mode("append").parquet(out)

        q = (streaming_holt_winters(stream, "key", "o", "v", period=7)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", chk)
             .outputMode("update").trigger(availableNow=True).start())
        try:
            q.awaitTermination(120)
        except Exception:
            assert crash_at is not None
        finally:
            q.stop()

    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    run(out, chk, crash_at=1)
    run(out, chk)
    snap = _latest(spark, out, "svc")
    batch = holt_winters_fold(spark.createDataFrame(b1 + b2),
                              "key", "o", "v", period=7).first()
    assert snap["in_order"] and snap["n_points"] == 40
    for c in ("level_x1000", "trend_x1000", "season_next_x1000",
              "forecast_x1000"):
        assert snap[c] == batch[c], c
