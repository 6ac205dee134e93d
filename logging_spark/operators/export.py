"""Training-export sharding: deterministic shard assignment + a
verifiable manifest.

A training run doesn't read "a table" — it reads N shard files whose
assignment must be stable across pipeline re-runs (resumable
downloads, reproducible data order) and whose content a consumer can
verify without re-reading the corpus. Standard practice (WebDataset /
tfrecord sharding) done Spark-first:

- shard id = hash60(seed, doc_id) mod n_shards — a pure function of
  the id, so re-runs, repartitions, and engines agree; no
  round-robin-by-partition (which bakes the accidental partitioning
  into the artifact);
- the manifest is one row per shard: row count + the commutative
  bit_xor fingerprint over canonicalized row renderings (same
  construction as dq.table_fingerprint, so a DuckDB consumer can
  re-verify a shard with one query);
- `write_shards` materializes the shards as a partitioned parquet
  tree; writer-side the repartition is BY THE SHARD COLUMN, so each
  task writes exactly one shard file and the job never fans out into
  n_shards x n_tasks small files.

At 100 TB the manifest aggregate is map-side combined down to
n_shards rows, and the write shuffles each row exactly once to its
shard's writer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logging_spark.operators.dq import table_fingerprint
from logging_spark.operators.sample import hash60


def shard_id(id_col: str | Column, n_shards: int,
             seed: str = "shard") -> Column:
    """Deterministic shard in [0, n_shards): pure fn(seed, id)."""
    return F.pmod(hash60(id_col, seed), F.lit(n_shards)).cast("int")


def shard_manifest(df: DataFrame, cols: Sequence[Column | str],
                   id_col: str = "doc_id", n_shards: int = 64,
                   seed: str = "shard") -> DataFrame:
    """(shard, fingerprint, n_rows): the consumer-verifiable manifest
    of a deterministic shard split. ``cols`` is the canonical row
    rendering (integer-exact expressions, per table_fingerprint)."""
    tagged = df.withColumn("_shard", shard_id(id_col, n_shards, seed))
    # distinct hash seed for content vs assignment so the two uses of
    # hash60 can never correlate (cols=[id] would otherwise reuse it)
    out = table_fingerprint(tagged, cols, group_by=["_shard"],
                            seed=f"{seed}:fp")
    return out.withColumnRenamed("_shard", "shard")


def write_shards(df: DataFrame, path: str, cols: Sequence[str],
                 id_col: str = "doc_id", n_shards: int = 64,
                 seed: str = "shard") -> DataFrame:
    """Write `df` as `path/shard=K/` parquet (one file per shard via
    shard-keyed repartition) and return the manifest the written tree
    must verify against."""
    tagged = df.withColumn("shard", shard_id(id_col, n_shards, seed))
    (tagged.repartition(n_shards, "shard")
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    return shard_manifest(df, list(cols), id_col, n_shards, seed)


def write_range_shards(df: DataFrame, path: str, sort_col: str,
                       n_shards: int = 64) -> DataFrame:
    """RANGE-sharded export: shard K holds a contiguous slice of the
    ``sort_col`` domain and is sorted within — the layout merge
    readers and binary-search consumers want (contrast hash shards,
    which optimize balance, not order). One RangePartitioning
    exchange (sampled boundaries) + in-task sort; no global sort ever
    materializes on one node.

    The returned manifest (shard, lo, hi, n_rows) is recomputed FROM
    THE COMMITTED TREE (repo invariant: never trust the pre-write
    plan — range boundary sampling could re-draw between actions),
    so ranges are provably non-overlapping for any consumer that
    re-checks. Ordering contract: (shard, sort_col) ascending ==
    global sort_col order.
    """
    tagged = (df.repartitionByRange(n_shards, F.col(sort_col))
              .sortWithinPartitions(sort_col)
              .withColumn("shard", F.spark_partition_id()))
    tagged.write.mode("overwrite").partitionBy("shard").parquet(path)
    committed = df.sparkSession.read.parquet(path)
    return (committed.groupBy("shard")
            .agg(F.min(sort_col).alias("lo"),
                 F.max(sort_col).alias("hi"),
                 F.count(F.lit(1)).cast("long").alias("n_rows"))
            .orderBy("shard"))
