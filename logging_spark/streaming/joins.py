"""Watermarked stream-stream interval join.

The continuous form of operators/asof.py:interval_join — correlate a
stream of point events with a stream of interval-opening events
(incidents, deploys, sessions) of the same key, while both sides are
still arriving. Reference behavior anchor: the reference correlates
log records against controller state updates arriving on a second
watch channel (SURVEY S3; pkg/datasource/datasource.go watch loop);
this is that correlation with BOTH channels unbounded.

Spark's stream-stream inner join buffers each side in state until the
other side's watermark passes the join-condition time bound — which is
why the interval length here is a bounded parameter, not a per-row
column: an unbounded range would mean unbounded state. With the
equality key + the two-sided time-range predicate, Spark derives the
state eviction watermark automatically; state per key is
O(events within watermark + interval length), independent of stream
history. The same containment predicate as the batch operator
([start, start + length)) keeps the two forms row-identical on equal
input, which tests/test_streaming_join.py pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start_ts",
    length_s: int = 600,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """points ⨝ intervals where points.ts in [start, start + length_s)
    and keys match; both inputs are streaming DataFrames. Column names
    other than `on` must not collide (rename upstream).

    ``how="left_outer"`` keeps every point: the
    attribution-with-missing-match case (an impression whose incident/
    click never arrives). Outer NULL-padded rows are emitted only once
    the COMBINED watermark (min across both sources) passes the
    point's last possible match time — Spark must prove no matching
    interval can still arrive before declaring the point unmatched —
    so emission lags by the watermark delay, and a finite drain needs
    a watermark-advancing sentinel on BOTH streams
    (tests/test_streaming_join.py pins batch left-join identity)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"stream_interval_join: unsupported how={how!r}")
    clash = (set(intervals.columns) - {on}) & set(points.columns) - {on}
    if clash:
        raise ValueError(f"interval columns collide with points: {sorted(clash)}")
    p = points.withWatermark(ts, watermark)
    i = (intervals.withWatermark(start, watermark)
         .withColumnRenamed(on, "_ikey"))
    cond = (
        (p[on] == i["_ikey"])
        & (p[ts] >= i[start])
        & (p[ts] < i[start] + F.expr(f"INTERVAL {int(length_s)} SECONDS"))
    )
    return p.join(i, cond, how).drop("_ikey")


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str = "conv_id") -> DataFrame:
    """Stream-static broadcast enrich: every micro-batch left-joins
    the (bounded) dimension exactly like the batch enrich operator —
    Spark plans a BroadcastHashJoin per micro-batch with NO streaming
    state (the static side is re-broadcast on change, giving
    slowly-changing-dimension pickup between triggers for free). The
    streaming twin of operators/enrich.py; row-identical to it on
    equal input (tests/test_streaming_join.py)."""
    return stream.join(F.broadcast(dim), on, "left")
