"""Custom stateful streaming operator: session assembly with
applyInPandasWithState.

The batch pipeline sessionizes with two window functions
(operators/sessionize.py); a continuous tail needs per-key STATE that
survives micro-batches — the reference's watch loop keeps exactly this
kind of in-memory resume point per resource (datasource.go:167-204).
Spark-first form: groupBy(conv_id).applyInPandasWithState with

- state = (sessions_emitted, pending event-times) per conversation.
  The pending buffer holds every event whose session membership the
  watermark has not yet FROZEN — on each trigger the buffer is
  re-sorted and re-segmented from scratch, so a late-but-within-
  watermark row lands in exactly the session the batch operator's
  global sort would give it (round-3 VERDICT item 3: the previous
  cursor-only state placed such rows in the CURRENT session);
- a session is emitted (append-mode friendly) only when
  ``session_end + gap < watermark``: any row Spark could still admit
  has ts >= watermark > end + gap, which under the gap rule starts a
  NEW session, so the emitted group's membership is final. Emission
  therefore lags the watermark by one gap — the price of exactness;
- state size is bounded by the watermark horizon: the buffer holds
  only events newer than (watermark - gap) plus the open tail, and
  keys expire via event-time timeout once everything is emitted.

Emitted rows match the batch operator: contiguous session_id per
conversation starting at 1, gap rule ``ts - prev_ts > gap``, optional
duration cap ``ts - session_start > max_dur`` (sessionize_capped).
(Batch epochs are second-floored by unix_timestamp; the stream works
in ms — identical splits for any data without sub-second gaps
straddling the boundary.)

The per-group python loop runs over one conversation's pending rows
(a watermark-bounded window, typically a handful); batches arrive
Arrow-vectorized. At web scale the shuffle key is conv_id — same skew
story as the batch dedup window.

CAVEAT (inherent to event-time timeouts): sessions still open when the
stream stops are not emitted until a later trigger advances the
watermark past their horizon. An availableNow drain therefore reports
only CLOSED sessions — ``open_sessions_snapshot`` closes the gap: it
reads the stopped query's state store with the Spark 4 state data
source and flushes the pending buffers as ``closed = false`` rows, so
drain output + snapshot equals the batch operator's full point-in-time
sessionization (pinned in tests/test_streaming_stateful.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("conv_id string, session_id long, n_turns long, "
                  "session_start timestamp, session_end timestamp")
_STATE_SCHEMA = "sid long, buf array<long>"


def _to_ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def _row(conv_id: str, sid: int, group: list[int]) -> dict:
    return {
        "conv_id": conv_id,
        "session_id": sid,
        "n_turns": len(group),
        "session_start": pd.Timestamp(group[0], unit="ms"),
        "session_end": pd.Timestamp(group[-1], unit="ms"),
    }


def _segment(buf: list[int], gap_ms: int,
             max_dur_ms: int | None) -> list[list[int]]:
    """Batch-identical segmentation of sorted event-times: split when
    the gap to the previous event exceeds gap_ms OR (capped variant)
    the event lands more than max_dur_ms after the session's first."""
    groups: list[list[int]] = []
    cur = [buf[0]]
    for ms in buf[1:]:
        if (ms - cur[-1] > gap_ms
                or (max_dur_ms is not None and ms - cur[0] > max_dur_ms)):
            groups.append(cur)
            cur = [ms]
        else:
            cur.append(ms)
    groups.append(cur)
    return groups


def _make_fn(gap_ms: int, max_dur_ms: int | None = None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        conv_id = key[0]
        wm = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            sid, buf = state.get
            buf = sorted(buf)
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if not len(rows):
                return
            new = [_to_ms(ts) for ts in rows["ts"]]
            if state.exists:
                sid, buf = state.get
                buf = sorted(list(buf) + new)
            else:
                sid, buf = 0, sorted(new)

        # re-segment the full pending buffer, then emit the prefix of
        # groups the watermark has frozen: end + gap < wm means no
        # admissible future row (ts >= wm) can join the group (diff
        # would exceed gap) or precede it (Spark drops sub-watermark
        # rows before the operator), so membership is final. Groups
        # are time-ordered, so final groups are always a prefix and
        # session numbering stays contiguous.
        groups = _segment(buf, gap_ms, max_dur_ms)
        emitted = []
        n_final = 0
        for g in groups:
            if g[-1] + gap_ms < wm:
                sid += 1
                emitted.append(_row(conv_id, sid, g))
                n_final += 1
            else:
                break
        keep = [ms for g in groups[n_final:] for ms in g]
        if keep:
            state.update((sid, keep))
            # wake when the earliest pending group becomes final (its
            # end + gap passes the watermark) even if no new rows
            # arrive for this key; timeout must sit above the current
            # watermark or Spark rejects it
            first_end = groups[n_final][-1]
            state.setTimeoutTimestamp(max(first_end + gap_ms + 1, wm + 1))
        else:
            state.remove()
        if emitted:
            yield pd.DataFrame(emitted)

    return fn


def streaming_sessionize(turns: DataFrame, gap_minutes: int = 30,
                         watermark: str = "1 hour",
                         max_duration_minutes: int | None = None) -> DataFrame:
    """Append-mode stream of CLOSED sessions per conversation,
    row-identical to the batch operator for any within-watermark
    arrival order (see module docstring).

    `turns` is a streaming DataFrame with (conv_id, turn_idx, ts, ...).
    The watermark bounds late-data admission, state size, and emission
    latency. ``max_duration_minutes`` adds the sessionize_capped split
    rule (session also closes when an event lands more than the cap
    after the session's first event).
    """
    gap_ms = gap_minutes * 60 * 1000
    max_dur_ms = (max_duration_minutes * 60 * 1000
                  if max_duration_minutes is not None else None)
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_fn(gap_ms, max_dur_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def open_sessions_snapshot(spark, checkpoint_dir: str,
                           gap_minutes: int = 30,
                           max_duration_minutes: int | None = None
                           ) -> DataFrame:
    """Flush the sessions still PENDING in a stopped/drained query's
    state store as a batch DataFrame with ``closed = false``.

    An append-mode drain emits only watermark-frozen sessions (module
    CAVEAT); this reads the checkpoint's state with the Spark 4 state
    data source (`format("statestore")` — a committed batch must
    exist) and re-segments each conversation's pending buffer with the
    SAME gap/cap rule the operator applies, numbering sessions from
    the per-key emitted count — so

        drained rows (closed = true)  UNION  this snapshot

    equals the batch operator's full point-in-time sessionization.
    Rows here are provisional: a late-but-within-watermark arrival can
    still reshape them, which is exactly what closed=false declares.

    One state row per conversation crosses the Python boundary (3
    narrow columns); the flush is mapInPandas over the state table,
    no shuffle.
    """
    from pyspark.sql import functions as F

    gap_ms = gap_minutes * 60 * 1000
    max_dur_ms = (max_duration_minutes * 60 * 1000
                  if max_duration_minutes is not None else None)
    st = (spark.read.format("statestore").load(checkpoint_dir)
          .select(F.col("key.conv_id").alias("conv_id"),
                  F.col("value.groupState.sid").alias("sid"),
                  F.col("value.groupState.buf").alias("buf")))

    cols = ["conv_id", "session_id", "n_turns",
            "session_start", "session_end"]

    def flush(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = []
            for conv, sid, buf in zip(pdf["conv_id"], pdf["sid"],
                                      pdf["buf"]):
                pending = sorted(int(x) for x in buf)
                if not pending:
                    continue
                for i, g in enumerate(_segment(pending, gap_ms,
                                               max_dur_ms)):
                    out.append(_row(conv, int(sid) + 1 + i, g))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame(columns=cols))

    return (st.mapInPandas(flush, schema=SESSION_SCHEMA)
            .withColumn("closed", F.lit(False)))
