"""Structured Streaming incremental mode: availableNow drain, file
resume across runs, streaming-dedup parity with the batch pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logging_spark import synth
from logging_spark.operators.dedup import dedup_latest_wins
from logging_spark.operators.enrich import enrich
from logging_spark.operators.route import route
from logging_spark.operators.rules import load_rules
from logging_spark.streaming.incremental import run_incremental


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {k: str(base / k) for k in ("input", "sink", "chk")}


def _write_slice(spark, path, lo, hi):
    t = synth.transcripts(spark, n_conversations=40, turns_per_conv=20,
                          hot_conversations=1, hot_factor=5)
    t.where((F.crc32("conv_id") % 100 >= lo) & (F.crc32("conv_id") % 100 < hi)) \
     .coalesce(1).write.mode("append").parquet(path)


def test_incremental_resume_matches_batch(spark, dirs):
    lookup = synth.lookup(spark, n_conversations=40)
    rules = load_rules(synth.rules(spark))

    # slice 1 arrives -> drain
    _write_slice(spark, dirs["input"], 0, 60)
    run_incremental(spark, dirs["input"], lookup, rules,
                    dirs["sink"], dirs["chk"])
    n_first = spark.read.parquet(dirs["sink"]).count()
    assert n_first > 0

    # slice 2 arrives -> second drain processes ONLY the new files
    _write_slice(spark, dirs["input"], 60, 100)
    run_incremental(spark, dirs["input"], lookup, rules,
                    dirs["sink"], dirs["chk"])
    routed_stream = spark.read.parquet(dirs["sink"])
    assert routed_stream.count() > n_first

    # batch reference over the full input (same dedup/enrich/route)
    full = spark.read.parquet(dirs["input"])
    batch = route(enrich(dedup_latest_wins(full), lookup), rules)

    s_counts = {(r["sink_name"],): r["n"] for r in
                routed_stream.groupBy("sink_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    b_counts = {(r["sink_name"],): r["n"] for r in
                batch.groupBy("sink_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert s_counts == b_counts

    # per-turn text equality under stable (conv_id, turn_idx) ordering
    key_cols = ["sink_name", "conv_id", "turn_idx", "text"]
    s_rows = sorted(map(tuple, routed_stream.select(*key_cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*key_cols).collect()))
    assert s_rows == b_rows


def test_rerun_without_new_files_is_noop(spark, dirs):
    lookup = synth.lookup(spark, n_conversations=40)
    rules = load_rules(synth.rules(spark))
    before = spark.read.parquet(dirs["sink"]).count()
    run_incremental(spark, dirs["input"], lookup, rules,
                    dirs["sink"], dirs["chk"])
    after = spark.read.parquet(dirs["sink"]).count()
    assert before == after


def test_cross_batch_dedup_drops_replays(spark, tmp_path):
    """With the stateful guard on, a (conv_id, turn_idx) replayed in a
    LATER drain is dropped (first-wins), so the sink holds exactly one
    copy per turn."""
    import pyspark.sql.functions as SF
    from logging_spark import synth as SY
    from logging_spark.operators.rules import load_rules

    d = {k: str(tmp_path / k) for k in ("input", "sink", "chk")}
    lookup = SY.lookup(spark, n_conversations=10)
    rules = load_rules(SY.rules(spark))

    base = SY.transcripts(spark, n_conversations=10, turns_per_conv=5,
                          hot_conversations=0, dup_pct=0.0)
    base.coalesce(1).write.mode("append").parquet(d["input"])
    run_incremental(spark, d["input"], lookup, rules, d["sink"], d["chk"],
                    cross_batch_dedup=True, watermark="10 hours")

    # replay EVERY turn with a later ts and marker text in a second file
    replay = (base.withColumn("ts", SF.expr("ts + INTERVAL 2 SECONDS"))
              .withColumn("text", SF.concat(SF.col("text"), SF.lit(" REPLAY"))))
    replay.coalesce(1).write.mode("append").parquet(d["input"])
    run_incremental(spark, d["input"], lookup, rules, d["sink"], d["chk"],
                    cross_batch_dedup=True, watermark="10 hours")

    sink = spark.read.parquet(d["sink"])
    # one routed copy per (sink, conv, turn): no REPLAY text made it through
    assert sink.where(SF.col("text").contains("REPLAY")).count() == 0
    dup_turns = (sink.groupBy("sink_name", "conv_id", "turn_idx").count()
                 .where("count > 1").count())
    assert dup_turns == 0


def test_compaction_resolves_cross_batch_replays_latest_wins(spark, tmp_path):
    """compact=True closes the streaming_dedup caveat: a (conv_id,
    turn_idx) replayed with a NEWER ts in a LATER micro-batch ends with
    the newer text as the ONLY row for that turn in each sink — exact
    batch-W1 latest-wins, not first-wins."""
    import pyspark.sql.functions as SF
    from logging_spark import synth as SY
    from logging_spark.operators.dedup import dedup_latest_wins
    from logging_spark.operators.enrich import enrich as op_enrich
    from logging_spark.operators.route import route as op_route
    from logging_spark.operators.rules import load_rules
    from logging_spark.streaming.incremental import read_sink_deduped

    d = {k: str(tmp_path / k) for k in ("input", "sink", "chk")}
    lookup = SY.lookup(spark, n_conversations=10)
    rules = load_rules(SY.rules(spark))

    base = SY.transcripts(spark, n_conversations=10, turns_per_conv=5,
                          hot_conversations=0, dup_pct=0.0)
    base.coalesce(1).write.mode("append").parquet(d["input"])
    run_incremental(spark, d["input"], lookup, rules, d["sink"], d["chk"])

    # later micro-batch replays every turn with a NEWER ts + marker text
    replay = (base.withColumn("ts", SF.expr("ts + INTERVAL 2 SECONDS"))
              .withColumn("text", SF.concat(SF.col("text"), SF.lit(" REPLAY"))))
    replay.coalesce(1).write.mode("append").parquet(d["input"])

    # dedup-on-read view gives exact semantics even without compaction
    run_incremental(spark, d["input"], lookup, rules, d["sink"], d["chk"])
    view = read_sink_deduped(spark, d["sink"])
    assert view.where(~SF.col("text").contains("REPLAY")).count() == 0

    # physical compaction: trigger via a third (empty-of-new-work) drain
    run_incremental(spark, d["input"], lookup, rules, d["sink"], d["chk"],
                    compact=True)
    sink = spark.read.parquet(d["sink"])
    assert sink.where(~SF.col("text").contains("REPLAY")).count() == 0
    dup_turns = (sink.groupBy("sink_name", "conv_id", "turn_idx").count()
                 .where("count > 1").count())
    assert dup_turns == 0

    # byte-for-byte parity with the batch pipeline over the full input
    full = spark.read.parquet(d["input"])
    batch = op_route(op_enrich(dedup_latest_wins(full), lookup), rules)
    key_cols = ["sink_name", "conv_id", "turn_idx", "text"]
    s_rows = sorted(map(tuple, sink.select(*key_cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*key_cols).collect()))
    assert s_rows == b_rows
