"""Streaming CUSUM change-point detection with O(1) state per key.

Streaming twin of ``operators/timeseries.cusum_fold`` (Page 1954
upward-shift detector): the batch op collects each key's full series
and folds S_t = max(0, S_{t-1} + x_t - k); a stream cannot collect
itself, but the SAME fold carries forward as four BIGINTs of state
(running S, peak S, peak position, points seen) — so the snapshot
after any ordered stream prefix is bit-identical to the batch fold of
that prefix (pinned in tests/test_streaming_anomaly.py), at O(1)
state per key forever.

Ordering contract: CUSUM is order-dependent. Rows are sorted by
``order_col`` WITHIN each micro-batch; across batches the fold is
exact when every trigger's rows sort after everything already
processed (the append-ordered pattern of file/Kafka time-series
sources). Out-of-order arrivals are NOT silently folded wrong: state
tracks the max order seen and flags the key's snapshots with
``in_order = false`` the moment a violation occurs — consumers can
re-run the batch fold over that key's history to repair.

The reference level k rides each row (``ref_col``, constant per key,
e.g. the key's known base rate) and is captured on first sight.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_points long, ref_k long, "
                 "peak_cusum long, peak_pos long, in_order boolean")
_STATE_SCHEMA = ("s long, peak long, pos long, i long, k long, "
                 "max_o long, ok boolean")


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        s, peak, pos, i, k, max_o, ok = state.get
        s, peak, pos, i, max_o = (int(s), int(peak), int(pos), int(i),
                                  int(max_o))
        k = int(k)
        ok = bool(ok)
        started = True
    else:
        s = peak = pos = i = 0
        k = max_o = 0
        ok, started = True, False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("o", kind="mergesort")
        if not started:
            k = int(pdf["k"].iloc[0])
        for o, x in zip(pdf["o"].astype("int64"),
                        pdf["v"].astype("int64")):
            if started and o < max_o:
                ok = False  # fold continues, flagged approximate
            max_o = max(max_o, int(o)) if started else int(o)
            started = True
            i += 1
            s = max(0, s + int(x) - k)
            if i == 1 or s > peak:
                peak, pos = s, i
    state.update((s, peak, pos, i, k, max_o, ok))
    yield pd.DataFrame({"key": [key[0]], "n_points": [i], "ref_k": [k],
                        "peak_cusum": [peak], "peak_pos": [pos],
                        "in_order": [ok]})


def streaming_cusum(events: DataFrame, key_col: str, order_col: str,
                    value_col: str, ref_col: str) -> DataFrame:
    """Per-key CUSUM snapshots (update output mode). Emits one row per
    touched key per trigger; keep the max-n_points row per key."""
    tagged = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).cast("long").alias("o"),
        F.col(value_col).cast("long").alias("v"),
        F.col(ref_col).cast("long").alias("k"))
    return tagged.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
