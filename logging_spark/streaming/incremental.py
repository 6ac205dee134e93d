"""Structured Streaming incremental mode: the reference's
list-then-watch tail (SURVEY S3/T1; pkg/datasource/datasource.go:167-204,
pkg/api/slack_task.go:98-116) re-expressed as a file-source stream.

The batch pipeline (plans/job.py) is the primary surface per the
north_rule; this module gives the same parse→enrich→route semantics a
continuous/incremental form:

- `readStream` over the transcripts directory — Spark's file source
  tracks processed files in the checkpoint, the analog of the
  reference's resourceVersion/offset bookkeeping. New files since the
  last trigger = the "watch events".
- `withWatermark + dropDuplicates` is the streaming W1: replayed
  (conv_id, turn_idx) rows within the watermark horizon are dropped
  exactly once per key; the watermark bounds the dedup state so it
  cannot grow unboundedly at 10^12-turn scale.
- `foreachBatch` reuses the SAME pure transform as batch (rule
  compile → parse → enrich → route), writing per-sink partitions.
  One code path, two execution modes — no drift between them.
- `trigger(availableNow=True)` drains everything pending then stops:
  incremental batch runs (cron-style) with streaming bookkeeping,
  which is exactly the reference's reconcile-loop cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logging_spark import schema as S
from logging_spark.functions.parse import parse_turns
from logging_spark.operators.enrich import enrich
from logging_spark.operators.route import route
from logging_spark.operators.rules import Rule


def read_turns_stream(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of transcript turns. maxFilesPerTrigger
    bounds micro-batch size (backpressure at scale)."""
    reader = spark.readStream.schema(S.TRANSCRIPTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def streaming_dedup(turns: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Cross-micro-batch replay guard: drop (conv_id, turn_idx) keys
    already seen within the watermark horizon. State is bounded by the
    watermark so it cannot grow unboundedly.

    CAVEAT: stateful dropDuplicates keeps the FIRST arrival, not the
    latest-by-ts — W1's latest-wins resolution only holds for
    duplicates arriving in the same micro-batch (run_incremental
    applies dedup_latest_wins per batch). Use this guard when replays
    cross trigger boundaries and first-wins is acceptable; exact
    latest-wins across batches needs a compaction pass on the sink
    (dedup-on-read, the batch path's job)."""
    return turns.withWatermark("ts", watermark).dropDuplicates(
        ["conv_id", "turn_idx"])


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    lookup_df: DataFrame,
    rules: list[Rule],
    sink_dir: str,
    checkpoint_dir: str,
    cross_batch_dedup: bool = False,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> None:
    """Drain all unprocessed input files through parse→enrich→route and
    append routed rows to sink_dir partitioned by sink_name. Re-running
    with the same checkpoint_dir processes only NEW files (offset
    resume, reference server.go:68-76). Duplicates within a micro-batch
    resolve latest-wins (exact W1 parity with the batch pipeline);
    set cross_batch_dedup for the stateful replay guard (first-wins
    across batches — see streaming_dedup)."""
    turns = read_turns_stream(spark, input_dir)
    if cross_batch_dedup:
        turns = streaming_dedup(turns, watermark)

    from logging_spark.operators.dedup import dedup_latest_wins

    def process(batch: DataFrame, batch_id: int) -> None:
        df = parse_turns(dedup_latest_wins(batch))
        df = df.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
            F.col("parsed.level").alias("level"),
            F.col("parsed.component").alias("component"),
            F.col("parsed.message").alias("message"),
            F.col("parsed.attrs").alias("attrs"),
        )
        df = enrich(df, lookup_df)
        routed = route(df, rules)
        (routed.write.mode("append").partitionBy("sink_name").parquet(sink_dir))

    writer = (turns.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q.awaitTermination()
