"""Streaming heavy hitters with BOUNDED state: Misra-Gries summaries
per hash bucket via applyInPandasWithState.

Spark's native streaming `groupBy(item).count()` keeps one state row
per DISTINCT item — unbounded on an open vocabulary (exactly what a
token/url/error-code stream is). The batch side already solves the
bounded version (operators/heavy.py: per-partition Misra-Gries +
exact recount); this is its streaming twin, with the recount replaced
by the MG estimate because a stream cannot re-scan itself.

Shape: items are hashed into `n_buckets` groups (the grouping key —
uniform by construction, so no hot-key state row), and each bucket
keeps ONE Misra-Gries summary of at most `capacity` counters. Per
trigger, each touched bucket merges its batch's counts into the
summary (summary merge: add, then subtract the (capacity+1)-th
largest count from all and drop the non-positive — the standard MG
reduction) and emits its full current candidate set, stamped with
n_processed so consumers keep the latest snapshot per bucket.

Guarantees (classic MG, per bucket): any item with true frequency
> n_bucket/(capacity+1) is PRESENT in the candidate set, and each
estimate undercounts its true frequency by at most
n_bucket/(capacity+1). State is O(n_buckets x capacity) forever —
independent of stream length and vocabulary size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("bucket int, item string, est_count long, "
                 "n_processed long")
_STATE_SCHEMA = "items array<string>, counts array<long>, n long"


def _mg_merge(summary: dict[str, int], batch: dict[str, int],
              capacity: int) -> dict[str, int]:
    for item, c in batch.items():
        summary[item] = summary.get(item, 0) + int(c)
    while len(summary) > capacity:
        # subtract the (capacity+1)-th largest count from everyone;
        # at least one entry reaches zero, so this terminates
        dec = sorted(summary.values(), reverse=True)[capacity]
        summary = {k: v - dec for k, v in summary.items() if v - dec > 0}
    return summary


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState, capacity: int) -> Iterator[pd.DataFrame]:
    if state.exists:
        items, counts, n = state.get
        summary = dict(zip(list(items), [int(c) for c in counts]))
        n = int(n)
    else:
        summary, n = {}, 0
    for pdf in pdfs:
        vc = pdf["item"].value_counts()
        n += int(vc.sum())
        summary = _mg_merge(summary, vc.to_dict(), capacity)
    state.update((list(summary.keys()),
                  [int(v) for v in summary.values()], n))
    yield pd.DataFrame({
        "bucket": key[0],
        "item": list(summary.keys()),
        "est_count": [int(v) for v in summary.values()],
        "n_processed": n,
    })


def streaming_heavy_hitters(events: DataFrame, col: str = "item",
                            n_buckets: int = 8,
                            capacity: int = 16) -> DataFrame:
    """Per-trigger candidate snapshots (bucket, item, est_count,
    n_processed) from bounded Misra-Gries state. Consumers keep the
    max-n_processed snapshot per bucket; run in update output mode."""
    tagged = events.select(
        F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
        .alias("bucket"),
        F.col(col).cast("string").alias("item"))
    return tagged.groupBy("bucket").applyInPandasWithState(
        lambda key, pdfs, state: _update(key, pdfs, state, capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
