"""Per-key sequence alignment across two tables — the repo's cogroup
surface (`DataFrame.groupBy(...).cogroup(...).applyInPandas`).

A training-data pipeline constantly compares two ORDERED per-entity
sequences that live in different tables: a user's event trail this
week vs last week (behavior drift), a conversation's turn sequence
before vs after a cleaning pass, predicted vs logged action traces.
The natural join shape is a cogroup: both sides shuffle ONCE on the
key, and each key's pair of groups meets in a single Arrow batch —
no quadratic join, no collect, and the Python kernel sees exactly one
(left_group, right_group) pair at a time.

`cogroup_lcs` computes the longest-common-subsequence length between
the two sides' ordered symbol sequences per key (capped at `max_len`
symbols per side so the per-key DP is O(max_len^2) regardless of data
skew) and emits an alignment ratio in permille. LCS is inherently
sequential DP — not expressible as ANSI SQL short of a quadratic
recursive CTE — so the contract entry is rows-only; correctness is
pinned by a brute-force pytest twin (itertools DP) over randomized
inputs instead.

Scale shape: one hash shuffle per side on the key (the same wide dep
any per-key aggregate pays), Arrow-batched transfer of only
(key, order, symbol), per-key work bounded by the cap. 10^8 users on
1000 executors is 10^5 keys per task with ~576-step DPs — comfortably
CPU-bound, no state beyond one key pair.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lcs_len(a: list, b: list) -> int:
    """Classic O(len(a)*len(b)) two-row DP."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, start=1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def cogroup_lcs(left: DataFrame, right: DataFrame, key: str,
                order_col: str, symbol_col: str,
                max_len: int = 24) -> DataFrame:
    """LCS alignment of two per-key ordered symbol sequences.

    Output: (key, len_a, len_b, lcs_len, align_permille) with
    align_permille = 2*lcs*1000 DIV (len_a+len_b) (Dice-style), one
    row per key present on EITHER side (absent side => empty sequence,
    lcs 0). Order ties are broken by the symbol itself so the result
    is partitioning-independent.
    """
    lp = left.select(F.col(key).alias("k"), F.col(order_col).alias("o"),
                     F.col(symbol_col).cast("string").alias("s"))
    rp = right.select(F.col(key).alias("k"), F.col(order_col).alias("o"),
                      F.col(symbol_col).cast("string").alias("s"))
    key_dtype = dict(lp.dtypes)["k"]

    def kernel(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        side = l if len(l) else r
        k = side["k"].iloc[0]
        a = list(l.sort_values(["o", "s"], kind="mergesort")["s"])[:max_len]
        b = list(r.sort_values(["o", "s"], kind="mergesort")["s"])[:max_len]
        lcs = _lcs_len(a, b)
        denom = len(a) + len(b)
        permille = (2 * lcs * 1000) // denom if denom else 1000
        return pd.DataFrame({"k": [k], "len_a": [len(a)], "len_b": [len(b)],
                             "lcs_len": [lcs],
                             "align_permille": [permille]})

    out_schema = (f"k {key_dtype}, len_a bigint, len_b bigint, "
                  f"lcs_len bigint, align_permille bigint")
    res = (lp.groupBy("k").cogroup(rp.groupBy("k"))
           .applyInPandas(kernel, schema=out_schema))
    return res.withColumnRenamed("k", key)


def lcs_drift_batched(left: DataFrame, right: DataFrame, key: str,
                      order_col: str, symbol_col: str,
                      max_len: int = 24) -> DataFrame:
    """Batched twin of cogroup_lcs — identical output (pinned row-
    for-row in tests/test_align_holt_kappa.py), different physical
    shape: the two sides UNION with a side tag, shuffle ONCE on the
    key, and `mapInPandas` walks each partition's keys inside a
    single Python call (pandas groupby over the concatenated Arrow
    batches). Per-key cost falls from a ~4.5 ms Python/Arrow
    round-trip (measured: 1500 users / 100k events = 6.9 s via
    cogroup) to a groupby slice (~0.5 s same input), and the plan
    has ONE data exchange instead of one per side.

    Trade-off vs cogroup: a partition's rows must fit in memory at
    once (standard shuffle-partition sizing bounds this); cogroup
    streams one key pair at a time. Keep cogroup_lcs for wide-row
    payloads, this for event-scale drift sweeps."""
    lp = left.select(F.col(key).alias("k"), F.col(order_col).alias("o"),
                     F.col(symbol_col).cast("string").alias("s"),
                     F.lit(0).cast("int").alias("side"))
    rp = right.select(F.col(key).alias("k"), F.col(order_col).alias("o"),
                      F.col(symbol_col).cast("string").alias("s"),
                      F.lit(1).cast("int").alias("side"))
    key_dtype = dict(lp.dtypes)["k"]
    tagged = lp.unionByName(rp).repartition(F.col("k"))

    def kernel(batches):
        parts = list(batches)
        if not parts:          # empty shuffle partition
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(["k", "side", "o", "s"], kind="mergesort")
        ks, la, lb, lc, ap = [], [], [], [], []
        for k, g in pdf.groupby("k", sort=False):
            sides = g["side"].to_numpy()
            syms = g["s"].tolist()
            a = [s for s, sd in zip(syms, sides) if sd == 0][:max_len]
            b = [s for s, sd in zip(syms, sides) if sd == 1][:max_len]
            lcs = _lcs_len(a, b)
            denom = len(a) + len(b)
            ks.append(k); la.append(len(a)); lb.append(len(b))
            lc.append(lcs)
            ap.append((2 * lcs * 1000) // denom if denom else 1000)
        yield pd.DataFrame({"k": ks, "len_a": la, "len_b": lb,
                            "lcs_len": lc, "align_permille": ap})

    out_schema = (f"k {key_dtype}, len_a bigint, len_b bigint, "
                  f"lcs_len bigint, align_permille bigint")
    return tagged.mapInPandas(kernel, schema=out_schema) \
                 .withColumnRenamed("k", key)
