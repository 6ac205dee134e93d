"""Streaming token bucket (streaming/ratelimit.py): snapshots
row-identical to the batch fold of the same in-order prefix."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.ratelimit import token_bucket_admit
from logging_spark.streaming.ratelimit import streaming_token_bucket

RATE, BURST = 400_000, 3  # 0.4 tok/s, burst 3


def _drain(spark, src_glob, out_dir, chk):
    stream = spark.readStream.schema(
        "k string, u long, tb long").parquet(src_glob)
    q = (streaming_token_bucket(stream, "k", "u", "tb", RATE, BURST)
         .writeStream
         .foreachBatch(lambda df, eid:
                       df.write.mode("append").parquet(out_dir))
         .option("checkpointLocation", chk)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _rows(key, lo, hi, step_us):
    return [Row(k=key, u=i * step_us, tb=i) for i in range(lo, hi)]


@pytest.mark.slow
def test_streaming_bucket_equals_batch_fold(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    # bursty key (0.5 s apart: refills 0.2 tok -> drops) and a slow
    # key (10 s apart: always admitted)
    b1 = _rows("hot", 0, 40, 500_000) + _rows("slow", 0, 10, 10_000_000)
    b2 = _rows("hot", 40, 90, 500_000) + _rows("slow", 10, 25, 10_000_000)
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)  # checkpoint resume

    allr = spark.read.parquet(out)
    latest = {r["key"]: r for r in allr.collect()
              if r["n_events"] == allr.where(F.col("key") == r["key"])
              .agg(F.max("n_events")).first()[0]}
    batch = {r["k"]: r for r in token_bucket_admit(
        spark.createDataFrame(b1 + b2), "k", "u", "tb",
        RATE, BURST).collect()}
    for k in ("hot", "slow"):
        assert latest[k]["in_order"]
        assert latest[k]["n_events"] == batch[k]["n_events"]
        assert latest[k]["n_admitted"] == batch[k]["n_admitted"]
        assert latest[k]["n_dropped"] == batch[k]["n_dropped"]
    assert latest["slow"]["n_dropped"] == 0
    assert latest["hot"]["n_dropped"] > 0


@pytest.mark.slow
def test_streaming_bucket_flags_out_of_order(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    out = str(tmp_path / "out")
    spark.createDataFrame(_rows("a", 10, 20, 1_000_000)).coalesce(1) \
        .write.parquet(f"{src}/p1")
    _drain(spark, f"{src}/p*", out, chk)
    spark.createDataFrame(_rows("a", 0, 5, 1_000_000)).coalesce(1) \
        .write.parquet(f"{src}/p2")
    _drain(spark, f"{src}/p*", out, chk)
    df = spark.read.parquet(out)
    snap = df.orderBy(F.desc("n_events")).first()
    assert snap["n_events"] == 15 and not snap["in_order"]
