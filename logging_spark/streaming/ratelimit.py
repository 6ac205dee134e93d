"""Streaming token-bucket rate limiter: the live twin of
``operators/ratelimit.token_bucket_admit``, as O(1) state per key
(micro-token balance, last event-time, admitted/total counters).

Identical integer recurrence — refill ``(delta_us * rate) DIV 1e6``,
cap ``burst * 1e6``, spend 1e6 on admit — so the snapshot after any
in-order stream prefix is row-identical to the batch fold of that
prefix (pinned in tests/test_streaming_ratelimit.py). Same ordering
contract as streaming/anomaly.py: rows sort within each micro-batch;
cross-batch violations flag ``in_order = false`` rather than folding
wrong.

Emits one snapshot row per touched key per trigger (update mode);
consumers keep the max-n_events row per key. For per-EVENT
admit/deny decisions at enforcement time, emit from the loop instead
— the census form here is the analytics surface (drop rates by key),
which is what a batch-replayable contract can pin.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PPM = 1_000_000

OUTPUT_SCHEMA = ("key string, n_events long, n_admitted long, "
                 "n_dropped long, in_order boolean")
_STATE_SCHEMA = ("tok long, last_us long, n long, adm long, "
                 "max_o long, ok boolean")


def _make_update(rate: int, burst: int):
    cap = burst * PPM

    def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            tok, last_us, n, adm, max_o, ok = state.get
            tok, last_us, n, adm, max_o = (
                int(tok), int(last_us), int(n), int(adm), int(max_o))
            ok = bool(ok)
            started = True
        else:
            tok = last_us = n = adm = max_o = 0
            ok, started = True, False
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["u", "tb"], kind="mergesort")
            for u in pdf["u"].astype("int64"):
                u = int(u)
                n += 1
                if not started:
                    started = True
                    tok, last_us, max_o, adm = cap - PPM, u, u, 1
                    continue
                if u < max_o:
                    ok = False
                max_o = max(max_o, u)
                tok = min(cap, tok + ((u - last_us) * rate) // PPM)
                if tok >= PPM:
                    tok -= PPM
                    adm += 1
                last_us = u
        state.update((tok, last_us, n, adm, max_o, ok))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                            "n_admitted": [adm],
                            "n_dropped": [n - adm],
                            "in_order": [ok]})

    return _update


def streaming_token_bucket(events: DataFrame, key_col: str,
                           us_col: str, tiebreak_col: str,
                           rate_x1e6_per_s: int,
                           burst: int) -> DataFrame:
    """Per-key admission-census snapshots (update output mode)."""
    if burst < 1:
        raise ValueError("burst must be >= 1")
    tagged = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(us_col).cast("long").alias("u"),
        F.col(tiebreak_col).cast("long").alias("tb"))
    return tagged.groupBy("key").applyInPandasWithState(
        _make_update(int(rate_x1e6_per_s), int(burst)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
