"""streaming_debounce (dropDuplicatesWithinWatermark): replays within
the watermark horizon drop, the key's state evicts once the watermark
passes, and the key can then legitimately reappear — the property
plain stateful dropDuplicates does NOT have."""

import glob
import os
import sys
import time
from datetime import datetime

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.streaming.incremental import streaming_debounce  # noqa: E402


def _write_file(spark, path, rows, n):
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/f{n}")
    # the file source orders micro-batches by modification time; pin
    # it explicitly so batch order is deterministic
    for i, p in enumerate(sorted(glob.glob(f"{path}/f{n}/*.parquet"))):
        os.utime(p, (n * 1000 + i, n * 1000 + i))


def _drain(spark, input_glob, sink, chk):
    stream = (spark.readStream.schema("k string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(input_glob))
    out = streaming_debounce(stream, keys=["k"], watermark="30 minutes")
    q = (out.writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


@pytest.mark.slow
def test_streaming_debounce_drops_replays_but_allows_reappearance(
        spark, tmp_path):
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    inp, sink, chk = (str(tmp_path / d) for d in ("in", "sink", "chk"))
    # file order drives micro-batch order (maxFilesPerTrigger=1).
    # Measured semantics (pinned here): watermark updates at batch END
    # and state eviction runs AFTER that batch's dedup, so a key
    # freed by the watermark reappears from the NEXT batch onward.
    _write_file(spark, inp, [("A", t(10)), ("A", t(10)), ("B", t(10))], 1)
    _write_file(spark, inp, [("A", t(10)), ("C", t(12))], 2)  # replay + advance
    _write_file(spark, inp, [("D", t(12, 30))], 3)  # eviction batch
    _write_file(spark, inp, [("A", t(12, 10))], 4)  # freed -> survives
    _drain(spark, f"{inp}/f*", sink, chk)

    rows = sorted((r.k, r.ts) for r in spark.read.parquet(sink).collect())
    ks = [k for k, _ in rows]
    # A kept twice: once at 10:00 (in-batch + cross-batch replays
    # dropped), once at 12:10 after its state evicted; B, C, D once
    assert ks == ["A", "A", "B", "C", "D"]
    assert (rows[0], rows[1]) == (("A", t(10)), ("A", t(12, 10)))
