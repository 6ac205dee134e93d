"""Streaming A/B monitor: a live Welch t statistic per trigger with
O(1) state, snapshots pinned row-identical to the batch
operators/stats.welch_ab_test on the same prefix.

The whole test statistic depends on six commutative integer sums per
arm (n, sum, sum of squares), so the state is twelve BIGINTs per key
— the experiment dashboard that updates every micro-batch without
ever rescanning history. Arms are assigned JVM-side with the SAME
md5-parity expression as the batch operator; the Python state
handler only adds integers and evaluates the t formula with the
batch expression's exact parenthesization (IEEE binary64 ops are
correctly rounded in both runtimes, so floor(t*1e6) matches
bit-for-bit — the same equivalence test_welch_t_matches_python
already pins for the batch side).

NOTE: peeking at a live t statistic every trigger inflates the false
positive rate (the classic sequential-testing sin) — this monitor is
for guardrails and sanity, not for stopping decisions; use fixed
horizons or a sequential correction for those.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("key string, n_processed long, n_a long, n_b long, "
                 "t_x1e6 long, significant int")
_STATE_SCHEMA = ("na long, sa long, ssa long, nb long, sb long, "
                 "ssb long")


def _t_x1e6(na, sa, ssa, nb, sb, ssb):
    # the batch operator's parenthesization, verbatim — and its
    # ROUNDING: the batch side CASTs each BIGINT sum to DOUBLE before
    # any arithmetic, so sa*sa there is double*double (rounded) where
    # Python unbounded-int sa*sa would be exact. Convert every input
    # to binary64 up front so each op is the same IEEE op; past
    # sa ~ 2^26.5 the two orders differ by 1 ulp and can flip
    # floor(t*1e6).
    na, sa, ssa = float(na), float(sa), float(ssa)
    nb, sb, ssb = float(nb), float(sb), float(ssb)
    t = (((sa / na) - (sb / nb)) /
         math.sqrt(((ssa - (sa * sa) / na) / (na - 1.0)) / na +
                   ((ssb - (sb * sb) / nb) / (nb - 1.0)) / nb))
    return math.floor(t * 1000000)


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        na, sa, ssa, nb, sb, ssb = (int(x) for x in state.get)
    else:
        na = sa = ssa = nb = sb = ssb = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        for arm, v in zip(pdf["arm"].astype("int64"),
                          pdf["v"].astype("int64")):
            if arm == 0:
                na += 1
                sa += int(v)
                ssa += int(v) * int(v)
            else:
                nb += 1
                sb += int(v)
                ssb += int(v) * int(v)
    state.update((na, sa, ssa, nb, sb, ssb))
    if na >= 2 and nb >= 2:
        t6 = _t_x1e6(na, sa, ssa, nb, sb, ssb)
    else:
        t6 = 0  # not enough units to test yet
    yield pd.DataFrame({
        "key": [key[0]], "n_processed": [na + nb],
        "n_a": [na], "n_b": [nb], "t_x1e6": [t6],
        "significant": [int(abs(t6) >= 1960000)]})


def streaming_welch_monitor(events: DataFrame, unit_col: str,
                            value_col: str, seed: str = "ab",
                            key_col: str | None = None) -> DataFrame:
    """Stateful streaming twin of welch_ab_test over ALREADY
    unit-level rows (one row per experimental unit, e.g. the output
    of a per-user upstream aggregation or one-shot unit events).
    Emits one snapshot per touched key per trigger (update mode)."""
    key = (F.col(key_col).cast("string") if key_col
           else F.lit("all"))
    arm = F.expr(
        f"CAST(conv(substring(md5(concat('{seed}:', "
        f"CAST({unit_col} AS STRING))), 1, 15), 16, 10) AS BIGINT) "
        f"% 2")
    tagged = events.select(key.alias("key"), arm.alias("arm"),
                           F.col(value_col).cast("long").alias("v"))
    return tagged.groupBy("key").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, _STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
