"""Custom stateful streaming operator: session assembly with
applyInPandasWithState.

The batch pipeline sessionizes with two window functions
(operators/sessionize.py); a continuous tail needs per-key STATE that
survives micro-batches — the reference's watch loop keeps exactly this
kind of in-memory resume point per resource (datasource.go:167-204).
Spark-first form: groupBy(conv_id).applyInPandasWithState with

- state = (next_session_id, n_turns, start_ms, last_ms) per
  conversation — O(1) per key, bounded: keys expire via event-time
  timeout, so state size tracks ACTIVE conversations, not history;
- a session CLOSES (emits one row, append-mode sink friendly) when a
  turn arrives more than `gap` after the previous one, or when the
  watermark passes last_ts + gap (event-time timeout) with no new
  turns;
- emitted rows match the batch operator's semantics: contiguous
  session_id per conversation starting at 1, gap rule `ts - prev_ts >
  gap`.

The per-group python loop runs over one conversation's rows in one
micro-batch (tiny); batches arrive Arrow-vectorized. At web scale the
shuffle key is conv_id — same skew story as the batch dedup window.

CAVEAT (inherent to event-time timeouts): sessions still open when the
stream stops are not emitted until a later trigger advances the
watermark past their horizon. An availableNow drain therefore reports
only CLOSED sessions; the batch operator is the source of truth for a
point-in-time full snapshot.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("conv_id string, session_id long, n_turns long, "
                  "session_start timestamp, session_end timestamp")
_STATE_SCHEMA = "sid long, n long, start_ms long, last_ms long"


def _to_ms(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000_000)


def _row(conv_id: str, sid: int, n: int, start_ms: int, last_ms: int) -> dict:
    return {
        "conv_id": conv_id,
        "session_id": sid,
        "n_turns": n,
        "session_start": pd.Timestamp(start_ms, unit="ms"),
        "session_end": pd.Timestamp(last_ms, unit="ms"),
    }


def _make_fn(gap_ms: int, max_dur_ms: int | None = None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        conv_id = key[0]
        if state.hasTimedOut:
            # watermark passed last_ms + gap with no new turns: the
            # open session is definitively closed; key state dropped
            sid, n, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame([_row(conv_id, sid, n, start_ms, last_ms)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["ts", "turn_idx"])
        if state.exists:
            sid, n, start_ms, last_ms = state.get
        else:
            sid, n, start_ms, last_ms = 0, 0, None, None
        closed = []
        for ts in rows["ts"]:
            ms = _to_ms(ts)
            if last_ms is None:
                sid, n, start_ms, last_ms = 1, 1, ms, ms
            elif (ms - last_ms > gap_ms
                  or (max_dur_ms is not None
                      and ms - start_ms > max_dur_ms)):
                # split on inactivity OR on the duration cap — the
                # streaming twin of sessionize_capped. (A late row
                # that extends start_ms downward can leave an already-
                # open session slightly over the cap until its next
                # on-time row splits it; same one-batch-grace flavor
                # as the other stateful approximations here.)
                closed.append(_row(conv_id, sid, n, start_ms, last_ms))
                sid, n, start_ms, last_ms = sid + 1, 1, ms, ms
            else:
                # Late-but-within-watermark rows (ms < last_ms, i.e.
                # out-of-order ACROSS micro-batches) join the open
                # session but must never move the cursor backward: an
                # unclamped last_ms = ms would shrink the timeout
                # horizon and could falsely split the session on the
                # next on-time turn. Monotone clamp both ends instead
                # (start extends down, cursor only advances). Residual
                # approximation vs batch: a late row older than the
                # previous session's close re-opens nothing — it counts
                # into the CURRENT session, while the batch operator
                # (global sort) would have placed it in the earlier one.
                n += 1
                start_ms = min(start_ms, ms)
                last_ms = max(last_ms, ms)
        state.update((sid, n, start_ms, last_ms))
        # bounded state: expire this key once the watermark passes the
        # point where the open session could still be extended
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(closed)

    return fn


def streaming_sessionize(turns: DataFrame, gap_minutes: int = 30,
                         watermark: str = "1 hour",
                         max_duration_minutes: int | None = None) -> DataFrame:
    """Append-mode stream of CLOSED sessions per conversation.

    `turns` is a streaming DataFrame with (conv_id, turn_idx, ts, ...).
    The watermark bounds both late data admission and state lifetime.
    ``max_duration_minutes`` adds the sessionize_capped split rule
    (session also closes when an event lands more than the cap after
    the session's first event).
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
