"""Streaming approximate distinct-count with BOUNDED state: per-key
KMV sketches via applyInPandasWithState.

Native streaming `approx_count_distinct` works per aggregation group
but its HLL state is opaque; native exact distinct needs one state
row per distinct value — unbounded on an open id space. This is the
streaming twin of `operators/kmv.py`: each key keeps the k smallest
distinct 56-bit hashes ever seen, O(k) state forever.

The min-k set is ORDER-INDEPENDENT — after any prefix of the stream,
the state is bit-identical to `kmv_sketch` of that prefix run as a
batch, regardless of how rows were split into triggers (pinned in
tests/test_streaming_kmv.py). That makes the streaming estimate
exactly the batch estimate at every snapshot: no approximation drift
on top of the sketch's own error.

Emits one snapshot row per touched key per trigger, stamped with
n_processed; consumers keep the max-n_processed row per key (update
output mode), same convention as streaming/topk.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logging_spark.operators.kmv import KMV_SPACE, MAX_K, hash56

OUTPUT_SCHEMA = ("key string, k_used int, kth_hash long, "
                 "est_distinct long, n_processed long")
_STATE_SCHEMA = "hvs array<long>, n long"


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState, k: int) -> Iterator[pd.DataFrame]:
    if state.exists:
        hvs, n = state.get
        seen = {int(v) for v in hvs}
        n = int(n)
    else:
        seen, n = set(), 0
    for pdf in pdfs:
        n += len(pdf)
        seen.update(int(v) for v in pdf["hv"])
    mink = sorted(seen)[:k]
    state.update((mink, n))
    k_used = len(mink)
    kth = mink[-1] if mink else 0
    est = ((k_used - 1) * KMV_SPACE) // kth if kth > 0 else 0
    yield pd.DataFrame({"key": [key[0]], "k_used": [k_used],
                        "kth_hash": [kth], "est_distinct": [est],
                        "n_processed": [n]})


def streaming_kmv_distinct(events: DataFrame, value_col: str,
                           key_col: str | None = None, k: int = 64,
                           seed: str = "kmv") -> DataFrame:
    """Per-key approximate distinct-count snapshots from O(k) state.
    `key_col=None` tracks one global sketch (key = '_all'); hashes
    are operators/kmv.hash56, so snapshots are pin-comparable to the
    batch sketch of the same rows. Run in update output mode."""
    if not 2 <= k <= MAX_K:
        raise ValueError(f"k must be in [2, {MAX_K}], got {k}")
    key = (F.col(key_col).cast("string") if key_col
           else F.lit("_all"))
    tagged = events.select(key.alias("key"),
                           hash56(value_col, seed).alias("hv"))
    return tagged.groupBy("key").applyInPandasWithState(
        lambda kk, pdfs, state: _update(kk, pdfs, state, k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
