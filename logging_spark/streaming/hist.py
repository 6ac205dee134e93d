"""Streaming mergeable quantile sketch: per-key power-of-two
histogram state via applyInPandasWithState — the streaming twin of
`operators/sketch.histogram_sketch`.

Because the batch sketch merges by union + re-sum EXACTLY, the
streaming state after any prefix is bit-identical to the batch sketch
of that prefix, regardless of trigger splits or checkpoint resume —
the same no-drift guarantee streaming/kmv.py gives for distinct
counts, here for quantiles. Pinned in tests/test_streaming_hist.py by
comparing a commutative sketch fingerprint (XOR of md5(bucket:cnt)
per bucket) plus the recovered median edge against the batch sketch.

State per key is one (bucket, cnt) pair per occupied bucket — bounded
by value-domain / bucket-width, independent of row count (unlike an
exact-quantile buffer). Emits one snapshot summary row per touched
key per trigger (update mode): (key, n_processed, n_buckets,
median_edge, fingerprint).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_processed long, n_buckets long, "
                 "median_edge long, fingerprint long")
_STATE_SCHEMA = "buckets array<long>, cnts array<long>, n long"


def sketch_fingerprint(pairs: dict[int, int]) -> int:
    """Commutative, order-independent checksum of a sketch: XOR of a
    60-bit md5 prefix of 'bucket:cnt' per occupied bucket."""
    fp = 0
    for b, c in pairs.items():
        fp ^= int(hashlib.md5(f"{b}:{c}".encode()).hexdigest()[:15], 16)
    return fp


def summarize_sketch(pairs: dict[int, int], width_pow2: int) -> tuple:
    """(n, n_buckets, median_edge, fingerprint) for a bucket->cnt map
    — the same summary the streaming snapshots emit, usable on a
    collected batch sketch for pin-comparisons."""
    n = sum(pairs.values())
    rank = (n + 1) // 2 if n else 0
    cum, median_edge = 0, 0
    for b in sorted(pairs):
        cum += pairs[b]
        if cum >= rank:
            median_edge = b * (1 << width_pow2)
            break
    return n, len(pairs), median_edge, sketch_fingerprint(pairs)


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState, width_pow2: int) -> Iterator[pd.DataFrame]:
    if state.exists:
        buckets, cnts, n = state.get
        pairs = {int(b): int(c) for b, c in zip(buckets, cnts)}
        n = int(n)
    else:
        pairs, n = {}, 0
    for pdf in pdfs:
        n += len(pdf)
        for b in pdf["bucket"]:
            b = int(b)
            pairs[b] = pairs.get(b, 0) + 1
    bs = sorted(pairs)
    state.update((bs, [pairs[b] for b in bs], n))
    total, n_buckets, median_edge, fp = summarize_sketch(pairs,
                                                         width_pow2)
    yield pd.DataFrame({"key": [key[0]], "n_processed": [n],
                        "n_buckets": [n_buckets],
                        "median_edge": [median_edge],
                        "fingerprint": [fp]})


def streaming_histogram(events: DataFrame, value_expr: str,
                        key_col: str | None = None,
                        width_pow2: int = 7) -> DataFrame:
    """Per-key streaming quantile-sketch snapshots. `value_expr`
    must render a non-negative BIGINT (same contract as the batch
    histogram_sketch). Run in update output mode."""
    key = (F.col(key_col).cast("string") if key_col
           else F.lit("_all"))
    tagged = events.select(
        key.alias("key"),
        F.expr(f"CAST(({value_expr}) AS BIGINT) "
               f"DIV {1 << width_pow2}").alias("bucket"))
    return tagged.groupBy("key").applyInPandasWithState(
        lambda kk, pdfs, state: _update(kk, pdfs, state, width_pow2),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
