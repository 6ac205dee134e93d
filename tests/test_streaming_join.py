"""stream-stream interval join (streaming/joins.py): row-identical to
the batch interval_join on the same input, drained via availableNow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logging_spark.operators.asof import interval_join
from logging_spark.streaming.joins import stream_interval_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sjoin")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ev.where(F.col("event_type") != "error").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"), "user_id",
        F.col("ts").cast("timestamp").alias("start_ts"))
    p, i = str(base / "points"), str(base / "intervals")
    pts.coalesce(2).write.parquet(p)
    inc.coalesce(2).write.parquet(i)
    return p, i, str(base / "chk")


def test_stream_interval_join_matches_batch(spark, split_dirs):
    p_dir, i_dir, chk = split_dirs
    pts_s = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp").parquet(p_dir)
    inc_s = spark.readStream.schema(
        "incident_id long, user_id long, start_ts timestamp").parquet(i_dir)
    # generous watermark: this test drains a finite backlog, so nothing
    # may be dropped as late; production sets it to the real lateness
    joined = stream_interval_join(pts_s, inc_s, on="user_id",
                                  ts="ts", start="start_ts",
                                  length_s=600, watermark="365 days")
    q = (joined.select("event_id", "incident_id")
         .writeStream.format("memory").queryName("sj")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted((r["event_id"], r["incident_id"])
                 for r in spark.table("sj").collect())

    pts = spark.read.parquet(p_dir)
    inc = (spark.read.parquet(i_dir)
           .withColumn("end_ts",
                       F.col("start_ts") + F.expr("INTERVAL 600 SECONDS")))
    want = sorted((r["event_id"], r["incident_id"]) for r in interval_join(
        pts, inc, on="user_id", ts="ts", start="start_ts", end="end_ts",
        bucket_s=600).collect())
    assert got == want and len(got) > 0


def test_stream_interval_join_rejects_collisions(spark, split_dirs):
    p_dir, i_dir, _ = split_dirs
    s = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp").parquet(p_dir)
    with pytest.raises(ValueError, match="collide"):
        stream_interval_join(s, s, on="user_id", ts="ts", start="ts")


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrich emits the same rows as the batch
    left join on the same input, including the default-on-miss rows."""
    from logging_spark.streaming.joins import stream_static_enrich

    sdir, out, chk = (str(tmp_path / k) for k in ("in", "out", "chk"))
    turns = [("conv-1", 1, "hi"), ("conv-1", 2, "yo"),
             ("conv-2", 1, "miss"), ("conv-3", 1, "ok")]
    spark.createDataFrame(turns, "conv_id string, turn_idx int, text string") \
        .coalesce(1).write.parquet(sdir)
    dim = spark.createDataFrame(
        [("conv-1", "ns-a"), ("conv-3", "ns-b")],
        "conv_id string, namespace string")

    s = spark.readStream.schema(
        "conv_id string, turn_idx int, text string").parquet(sdir)
    q = (stream_static_enrich(s, dim).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = sorted((r["conv_id"], r["turn_idx"], r["namespace"])
                 for r in spark.read.parquet(out).collect())
    want = sorted((r["conv_id"], r["turn_idx"], r["namespace"])
                  for r in spark.read.parquet(sdir)
                  .join(dim, "conv_id", "left").collect())
    assert got == want and len(got) == 4


def test_stream_interval_join_left_outer_matches_batch(spark, tmp_path):
    """left_outer keeps unmatched points as NULL-padded rows once the
    combined watermark passes their last possible match time — pinned
    row-identical to the batch left join on the same condition."""
    from datetime import datetime, timedelta

    T0 = datetime(2026, 1, 1, 12, 0, 0)
    P_SCHEMA = "event_id long, user_id long, ts timestamp"
    I_SCHEMA = "incident_id long, user_id long, start_ts timestamp"
    d = {k: str(tmp_path / k) for k in ("p", "i", "out", "chk")}

    # u1: point inside its interval; u2: point 20min after the
    # interval start (outside length_s=600); u3: no interval at all
    pts = [(1, 1, T0 + timedelta(minutes=5)),
           (2, 2, T0 + timedelta(minutes=20)),
           (3, 3, T0 + timedelta(minutes=2))]
    ivs = [(10, 1, T0), (20, 2, T0)]
    spark.createDataFrame(pts, P_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["p"])
    spark.createDataFrame(ivs, I_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["i"])
    # watermark-advancing sentinels on BOTH streams (outer emission
    # waits on the min of the two source watermarks)
    far = T0 + timedelta(hours=48)
    spark.createDataFrame([(99, 99, far)], P_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["p"])
    spark.createDataFrame([(98, 99, far)], I_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["i"])

    def drain():
        ps = (spark.readStream.schema(P_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(d["p"]))
        is_ = (spark.readStream.schema(I_SCHEMA)
               .option("maxFilesPerTrigger", 1).parquet(d["i"]))
        j = stream_interval_join(ps, is_, on="user_id", ts="ts",
                                 start="start_ts", length_s=600,
                                 watermark="10 minutes", how="left_outer")
        q = (j.select("event_id", "incident_id").writeStream
             .format("parquet").option("path", d["out"])
             .option("checkpointLocation", d["chk"])
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    # second pass so the sentinel-advanced watermark fires the
    # unmatched-row eviction recorded at the end of the first
    far2 = far + timedelta(hours=1)
    spark.createDataFrame([(97, 99, far2)], P_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["p"])
    spark.createDataFrame([(96, 99, far2)], I_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d["i"])
    drain()

    got = sorted(
        (r["event_id"], r["incident_id"])
        for r in spark.read.parquet(d["out"]).collect()
        if r["event_id"] < 90)
    # batch truth: left join on the identical condition
    p = spark.createDataFrame(pts, P_SCHEMA)
    i = spark.createDataFrame(ivs, I_SCHEMA)
    cond = ((p["user_id"] == i["user_id"]) & (p["ts"] >= i["start_ts"])
            & (p["ts"] < i["start_ts"] + F.expr("INTERVAL 600 SECONDS")))
    want = sorted((r["event_id"], r["incident_id"])
                  for r in p.join(i, cond, "left").collect())
    assert got == want
    assert (2, None) in got and (3, None) in got  # the unmatched points
