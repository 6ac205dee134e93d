"""Distributed weighted median — two-phase prefix sum, no
single-partition window.

The lower weighted median: the smallest value v whose cumulative
weight (over values <= v) reaches half the total weight. The classic
use: "median request latency weighted by request count", "median
price weighted by quantity" — a plain median over the EXPANDED
multiset, computed without expanding it.

The naive Spark spelling — sum(w) OVER (ORDER BY v) — funnels every
distinct value through ONE task. This reuses sample.budget_head's
two-phase shape instead:

1. one groupBy(value) collapses the input to (value, weight) —
   the only data-sized shuffle;
2. range-partition + sort by value, localCheckpoint to PIN the
   sampled partition bounds (both downstream actions must see the
   same partitions — the budget_head lesson);
3. per-partition weight totals (one tiny collect, one row per
   partition) -> exclusive prefix offsets on the driver; the median
   lives in the single partition whose offset first reaches W/2;
4. an Arrow cumsum over THAT partition only (narrow
   spark_partition_id filter) finds the first value with
   2 * cum >= W.

Weights must be non-negative integers (quantize upstream). The
result is exact and partitioning-independent — the oracle runs the
naive window plan and must agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_median(df: DataFrame, value_col: str | Column,
                    weight_col: str | Column,
                    num_partitions: int | None = None) -> DataFrame:
    """One row (total_weight, median): lower weighted median of
    `value_col` under integer `weight_col`."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    per = (df.select(v.alias("_v"), w.cast("long").alias("_w"))
           .groupBy("_v").agg(F.sum("_w").alias("_w")))
    parted = (per.repartitionByRange(num_partitions, "_v")
              if num_partitions else per.repartitionByRange("_v"))
    d = parted.sortWithinPartitions("_v").localCheckpoint()

    totals = (d.groupBy(F.spark_partition_id().alias("_pid"))
              .agg(F.sum("_w").alias("_t")).collect())
    offsets: dict[int, int] = {}
    run = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = run
        run += int(row["_t"])
    total_w = run
    if total_w <= 0:  # empty input (or all-zero weights): NULL median
        return (df.sparkSession.range(1)
                .select(F.lit(0).cast("long").alias("total_weight"),
                        F.lit(None).cast(d.schema["_v"].dataType)
                        .alias("median")))
    # the partition holding the first value with 2*cum >= W
    target = None
    for pid in sorted(offsets):
        nxt = offsets[pid] + next(int(r["_t"]) for r in totals
                                  if r["_pid"] == pid)
        if 2 * nxt >= total_w:
            target = pid
            break

    def kernel(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        cum = offsets.get(pid, 0)
        for pdf in batches:
            c = pdf["_w"].cumsum().astype("int64") + cum
            hit = pdf[2 * c >= total_w]
            if len(hit):
                yield hit.iloc[[0]][["_v"]]
                return
            cum = int(c.iloc[-1]) if len(c) else cum

    med = (d.where(F.spark_partition_id() == F.lit(target))
           .mapInPandas(kernel, d.select("_v").schema)
           .limit(1))
    return (med.select(F.lit(total_w).cast("long")
                       .alias("total_weight"),
                       F.col("_v").alias("median")))
