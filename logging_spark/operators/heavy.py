"""Exact heavy hitters without shuffling the full item stream.

The classic two-pass composition from the streaming literature
(Misra–Gries 1982; merged-summary guarantee per Agarwal et al.,
"Mergeable Summaries", PODS 2012):

  pass 1  per-partition Misra–Gries candidate summaries over Arrow
          batches (mapInPandas) — k counters per partition, NO shuffle
          of the item stream; only ≤ k×partitions candidate rows move
  pass 2  exact count of the candidate set only (broadcast semi-join
          against the scan), then the threshold filter

MG guarantee (why the result is EXACT, not approximate): an item with
global count > n/(k+1) must exceed n_p/(k+1) in at least one partition
(pigeonhole over partition totals), and a Misra–Gries summary with k
counters retains every item whose local count exceeds n_p/(k+1) — so
the union of partition summaries is a SUPERSET of every item at or
above the threshold, and the exact recount trims it to precisely
{x : count(x) · 10⁶ ≥ phi_ppm · n}. Output is therefore deterministic
and independent of partitioning, which is what makes the operator
oracle-checkable (plain GROUP BY ... HAVING in DuckDB).

Scale shape at 100 TB: the naive plan (groupBy item → filter) shuffles
one row per DISTINCT item — at web-corpus vocabulary sizes that is the
dominant exchange. Here the stream is scanned twice but the only wide
dependencies are a ≤ k×partitions candidate union and the final
candidate-restricted aggregate. Choose phi_ppm so k = ceil(10⁶ /
phi_ppm) counters fit comfortably per task (k ≤ ~10⁵).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    """Misra–Gries with k counters over a partition's Arrow batches.

    Emits the surviving candidate keys plus ONE marker row (candidate
    NULL) carrying the partition's row count, so the caller gets the
    global total from the same single scan."""
    counters: dict = {}
    n_p = 0
    for pdf in batches:
        n_p += len(pdf)
        for v, c in pdf.iloc[:, 0].value_counts().items():
            counters[v] = counters.get(v, 0) + int(c)
        if len(counters) > k:
            # batched decrement: subtracting the (k+1)-th largest count
            # from every counter zeroes out at least len-k of them;
            # each subtracted unit is matched across ≥ k+1 distinct
            # items, preserving the n_p/(k+1) deficiency bound
            cuts = sorted(counters.values(), reverse=True)
            d = cuts[k]
            counters = {v: c - d for v, c in counters.items() if c > d}
    yield pd.DataFrame({
        "candidate": list(counters.keys()) + [None],
        "n_part": [0] * len(counters) + [n_p],
    })


def heavy_hitters(df: DataFrame, col: str = "item",
                  phi_ppm: int = 1000) -> DataFrame:
    """(item, n) for every item occurring in ≥ phi_ppm/10⁶ of rows.

    `df` is one row per occurrence of a STRING item (explode
    upstream). Exact counts; deterministic threshold arithmetic
    (n · 10⁶ ≥ phi_ppm · total over longs, no float ratios). Exactly
    two scans of the stream: the summaries (≤ k×partitions + 1 rows
    each) are materialized once with localCheckpoint and feed both the
    candidate broadcast and the total.
    """
    k = (1_000_000 + phi_ppm - 1) // phi_ppm  # counters per partition
    # NULL rows are neither countable items nor part of the total
    # (pandas value_counts would silently skip them while len() counted
    # them toward n_p, skewing the threshold)
    items = df.select(F.col(col).alias("item")) \
              .where(F.col("item").isNotNull())
    summ = items.mapInPandas(
        lambda it: _mg_partition(it, k),
        schema="candidate string, n_part long").localCheckpoint()
    total = summ.agg(F.sum("n_part").alias("_total"))
    cand = summ.where(F.col("candidate").isNotNull()) \
               .select("candidate").distinct()
    counted = (items.join(F.broadcast(cand),
                          items["item"] == cand["candidate"], "inner")
               .groupBy("item")
               .agg(F.count(F.lit(1)).alias("n")))
    return (counted.crossJoin(F.broadcast(total))
            .where(F.col("n") * 1_000_000 >= F.lit(phi_ppm) * F.col("_total"))
            .select("item", "n"))
