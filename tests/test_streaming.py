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


def test_streaming_tumbling_counts_watermark(spark, tmp_path):
    """Windowed agg with watermark: a late-but-within-horizon row counts
    toward its (closed) window; a row older than the watermark is
    dropped; append mode emits each window exactly once, final."""
    from logging_spark.streaming.incremental import (read_turns_stream,
                                                     streaming_tumbling_counts)

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")

    def _file(rows, name):
        # flat append (one file per call): the file source lists the
        # input dir non-recursively and orders by modification time,
        # so call order IS batch order under maxFilesPerTrigger=1
        del name
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(inp)
        import time as _t
        _t.sleep(0.05)  # distinct mtimes -> deterministic file order

    # batch 1: two on-time rows in the 10:00 and 10:10 windows, plus an
    # 11:00 row that advances the watermark (10m watermark -> 10:50)
    _file([("c1", 1, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 10, 1)),
           ("c1", 2, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 10, 11)),
           ("c2", 1, "assistant", "t", None, __import__("datetime").datetime(2024, 1, 1, 11, 0))],
          "f1")
    # batch 2: a late row at 10:55 (watermark is 10:50 after batch 1 —
    # late-but-within-horizon, counted in its 10:50 window) and a 12:00
    # row advancing the watermark to 11:50
    _file([("c3", 1, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 10, 55)),
           ("c5", 1, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 12, 0))],
          "f2")
    # batch 3: a too-late 10:05 row — its 10:00 window was emitted and
    # EVICTED when the watermark passed 10:10 (end of batch 1), so the
    # row must be dropped, not revive the window (measured Spark 4.1
    # semantics: a late row arriving in the SAME batch that first moves
    # the watermark past its window still merges before eviction; one
    # batch later it is gone — hence the row sits two batches after its
    # window). The 13:00 row advances the final watermark to 12:50.
    _file([("c4", 1, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 10, 5)),
           ("c6", 1, "user", "t", None, __import__("datetime").datetime(2024, 1, 1, 13, 0))],
          "f3")

    stream = read_turns_stream(spark, inp, max_files_per_trigger=1)
    agg = streaming_tumbling_counts(stream, window="10 minutes",
                                    watermark="10 minutes")
    q = (agg.writeStream.format("memory").queryName("tumble")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(str(r["window_start"]), r["role"]): r["n_turns"]
           for r in spark.sql("select * from tumble").collect()}

    assert got[("2024-01-01 10:00:00", "user")] == 1
    assert got[("2024-01-01 10:10:00", "user")] == 1
    assert got[("2024-01-01 11:00:00", "assistant")] == 1
    # late-but-within-horizon row landed in its 10:50 window
    assert got[("2024-01-01 10:50:00", "user")] == 1
    # 12:00 window flushed by availableNow's final no-data batch
    # (watermark 12:50 > window end)
    assert got[("2024-01-01 12:00:00", "user")] == 1
    # too-late 10:05 row was dropped: the 10:00 window stays at 1 and
    # was emitted exactly once (append = exactly-once per window)
    assert sum(1 for (ws, _r) in got if ws == "2024-01-01 10:00:00") == 1
    # the final 13:00 window can never close (the watermark never
    # passes the max event time): absent from append output
    assert not any(ws == "2024-01-01 13:00:00" for (ws, _r) in got)


def test_streaming_sliding_counts_match_batch(spark, tmp_path):
    """Hopping-window streaming agg is row-identical to the batch
    F.window(slide=...) over the same data, for every window the
    watermark closed. A +2h sentinel row advances the watermark past
    all real windows; its own (never-closable) windows are the only
    rows append mode withholds."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from logging_spark.streaming.incremental import (
        read_turns_stream, streaming_sliding_counts)

    inp = str(tmp_path / "in_slide")
    os.makedirs(inp)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    rows = [
        ("c1", 1, "user", "t", None, datetime(2024, 1, 1, 10, 1)),
        ("c1", 2, "assistant", "t", None, datetime(2024, 1, 1, 10, 5)),
        ("c2", 1, "user", "t", None, datetime(2024, 1, 1, 10, 11)),
        ("c2", 2, "user", "t", None, datetime(2024, 1, 1, 10, 21)),
        ("c3", 1, "assistant", "t", None, datetime(2024, 1, 1, 10, 25)),
        ("cz", 1, "user", "t", None, datetime(2024, 1, 1, 13, 0)),
    ]
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("append").parquet(inp)

    stream = read_turns_stream(spark, inp, max_files_per_trigger=1)
    agg = streaming_sliding_counts(stream, window="20 minutes",
                                   slide="10 minutes",
                                   watermark="10 minutes")
    q = (agg.writeStream.format("memory").queryName("slide")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(str(r["window_start"]), r["role"]): r["n_turns"]
           for r in spark.sql("select * from slide").collect()}

    wm_final = datetime(2024, 1, 1, 12, 50)  # max ts - 10m watermark
    batch = (df.groupBy(F.window("ts", "20 minutes", "10 minutes")
                        .alias("win"), "role")
             .agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("win.end") <= F.lit(wm_final)))
    want = {(str(r["win"]["start"]), r["role"]): r["n"]
            for r in batch.collect()}

    assert got == want
    # sanity: overlap means the 10:01 row shows up in two windows
    assert ("2024-01-01 09:50:00", "user") in got
    assert ("2024-01-01 10:00:00", "user") in got
