"""Streaming distribution-drift monitor: binned two-sample KS
distance of the live stream against a frozen reference histogram,
with bounded state and snapshots pinned identical to the batch twin.

The serving-drift question — "does today's metric distribution still
look like the training distribution?" — is a two-sample KS test
where one sample never stops growing. State per key is the stream's
bucket histogram (bounded by value-domain / bucket_width, not row
count); the reference histogram rides the closure as a plain dict
(broadcast). Counts are commutative, so after any prefix, in any
arrival order and across checkpoint resume, the emitted D equals
operators/stats.binned_ks of the same rows (pinned in
tests/test_streaming_drift.py).

Emits one snapshot per touched key per trigger (update mode):
(key, n_processed, d_num, d_x1e6) — alert when d_x1e6 crosses the
asymptotic threshold for your sizes.
"""

from __future__ import annotations

from typing import Iterator, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_processed long, d_num long, "
                 "d_x1e6 long")
_STATE_SCHEMA = "buckets array<long>, cnts array<long>, n long"


def _d_num(cur: dict, ref: Mapping[int, int]) -> int:
    n_cur = sum(cur.values())
    n_ref = sum(ref.values())
    cum_c = cum_r = 0
    best = 0
    for b in sorted(set(cur) | set(ref)):
        cum_c += cur.get(b, 0)
        cum_r += ref.get(b, 0)
        best = max(best, abs(cum_c * n_ref - cum_r * n_cur))
    return best


def _update_factory(ref: Mapping[int, int], bucket_width: int):
    ref = {int(k): int(v) for k, v in ref.items()}
    n_ref = sum(ref.values())

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            bs, cs, n = state.get
            cur = dict(zip((int(b) for b in bs), (int(c) for c in cs)))
            n = int(n)
        else:
            cur, n = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            # trunc-toward-zero bucketing to match the batch twin's
            # Spark DIV (pandas // floors: -1 would land in bucket -1
            # there but bucket 0 in batch); abs-then-resign is exact
            # int64 arithmetic, no float round-trip
            v = pdf["v"].astype("int64")
            vc = (np.where(v < 0, -(np.abs(v) // bucket_width),
                           v // bucket_width)).astype("int64")
            vc = pd.Series(vc).value_counts()
            for b, c in vc.items():
                cur[int(b)] = cur.get(int(b), 0) + int(c)
            n += len(pdf)
        state.update((list(cur.keys()), list(cur.values()), n))
        d = _d_num(cur, ref)
        n_cur = sum(cur.values())
        yield pd.DataFrame({
            "key": [key[0]], "n_processed": [n], "d_num": [d],
            "d_x1e6": [(1000000 * d) // max(n_cur * n_ref, 1)]})

    return update


def streaming_drift_ks(events: DataFrame, value_col: str,
                       reference: Mapping[int, int],
                       bucket_width: int = 100,
                       key_col: str | None = None) -> DataFrame:
    """Stateful binned-KS drift vs a frozen reference histogram
    (bucket -> count, buckets = value DIV bucket_width). Keep the
    max-n_processed row per key, as with the other streaming twins.

    Note d_x1e6 here floors (1e6*d_num) DIV (n_cur*n_ref) — matching
    binned_ks's floor(double) for all realistic magnitudes (exact
    integer division vs correctly-rounded double agree unless
    n_cur*n_ref overflows 2^53; the pinned test compares d_num, the
    exact integer, plus the quantized statistic)."""
    key = (F.col(key_col).cast("string") if key_col
           else F.lit("all"))
    tagged = events.select(key.alias("key"),
                           F.col(value_col).cast("long").alias("v"))
    return tagged.groupBy("key").applyInPandasWithState(
        _update_factory(reference, bucket_width), OUTPUT_SCHEMA,
        _STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
