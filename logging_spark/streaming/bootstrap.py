"""Streaming Poisson-bootstrap CI: a live confidence interval for a
mean metric with O(n_reps) state, snapshots pinned identical to the
batch operator.

The batch Poisson bootstrap (operators/stats.py) reduces each
replicate to (sum w*v, sum w) — both plain sums, so the state is
COMMUTATIVE: after any stream prefix, in any arrival order, the
per-replicate accumulators equal the batch operator's on the same
rows, hence so do est/lo/hi (pinned in
tests/test_streaming_bootstrap.py). The per-row replicate weights
are computed JVM-side (the same md5-through-Poisson-CDF expressions
as the batch path) BEFORE the stateful op — the Python state handler
only adds numpy arrays, touching no hashing code that could drift
from the batch twin.

Keyed by a constant here (one metric = one state row); shard by a
(metric, segment) key column for parallel CIs — state stays
O(n_reps) per key either way.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logging_spark.operators.stats import _poisson_weight

OUTPUT_SCHEMA = ("key string, n_processed long, est_x100 long, "
                 "lo_x100 long, hi_x100 long")
_STATE_SCHEMA = "wv array<long>, wn array<long>, n long, sv long"


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division, matching Spark DIV /
    DuckDB ``//`` — Python's ``//`` floors toward -inf, which differs
    by 1 on negative numerators (the repo's documented trunc-vs-floor
    trap; weights are nonnegative but a metric can be)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _update_factory(n_reps: int):
    lo_i = math.ceil(0.025 * n_reps) - 1   # 0-indexed order stats
    hi_i = math.ceil(0.975 * n_reps) - 1

    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            wv, wn, n, sv = state.get
            wv = np.array(wv, dtype=np.int64)
            wn = np.array(wn, dtype=np.int64)
            n, sv = int(n), int(sv)
        else:
            wv = np.zeros(n_reps, dtype=np.int64)
            wn = np.zeros(n_reps, dtype=np.int64)
            n, sv = 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            w = np.stack(pdf["ws"].values).astype(np.int64)  # rows x B
            v = pdf["v"].values.astype(np.int64)
            wv += (w * v[:, None]).sum(axis=0)
            wn += w.sum(axis=0)
            n += len(pdf)
            sv += int(v.sum())
        state.update((wv.tolist(), wn.tolist(), n, sv))
        means = sorted(_tdiv(100 * a, max(b, 1))
                       for a, b in zip(wv.tolist(), wn.tolist()))
        yield pd.DataFrame({
            "key": [key[0]], "n_processed": [n],
            "est_x100": [_tdiv(100 * sv, max(n, 1))],
            "lo_x100": [means[lo_i]], "hi_x100": [means[hi_i]]})

    return update


def streaming_bootstrap_ci(events: DataFrame, id_col: str,
                           value_col: str, n_reps: int = 40,
                           seed: str = "boot",
                           key_col: str | None = None) -> DataFrame:
    """Stateful streaming twin of poisson_bootstrap_ci. Emits one
    snapshot row per touched key per trigger (update mode); keep the
    max-n_processed row, same convention as streaming/kmv.py."""
    key = (F.col(key_col).cast("string") if key_col
           else F.lit("all"))
    ws = F.array(*[
        _poisson_weight(F.expr(
            f"CAST(conv(substring(md5(concat('{seed}:', "
            f"CAST({id_col} AS STRING), ':', CAST({b} AS STRING))), "
            f"1, 15), 16, 10) AS BIGINT) % 1000000"))
        for b in range(n_reps)])
    tagged = events.select(key.alias("key"), ws.alias("ws"),
                           F.col(value_col).cast("long").alias("v"))
    return tagged.groupBy("key").applyInPandasWithState(
        _update_factory(n_reps), OUTPUT_SCHEMA, _STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
