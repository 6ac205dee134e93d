"""Per-partition checkpoint + resume (SURVEY T2/T3, J3).

Reference behavior: agents resume tailing from the recorded byte
offset per (service, pod) (pkg/api/server.go:68-76,
pkg/apis/yamecloud/v1/slack_type.go:28-31); reconcile loops retry
and skip completed work.

Batch formalization: the input is bucketed by pmod(xxhash64(conv_id), B).
A completed bucket writes one lineage row (bucket, input_snapshot,
row_count, parse_errors, state, ts). On re-run, completed buckets of
the SAME input snapshot are anti-joined away; each bucket's sink
output is written with overwrite-by-partition, so a bucket that
crashed mid-write is simply rewritten — idempotence without
read-side dedup.

Scale: B should be sized so one bucket's turns fit a worker wave
(e.g. B=4096 at 10^12 turns -> ~250M turns/bucket). Bucket id is a
pure function of conv_id, so all turns of a conversation live in one
bucket and per-conv semantics (dedup, ordering) never cross buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.sources.catalog import Catalog

CHECKPOINT_TABLE = "meta.checkpoint"


def with_bucket(df: DataFrame, num_buckets: int, key: str = "conv_id") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)).cast("int")
    )


def completed_buckets(catalog: Catalog, input_snapshot: str) -> DataFrame | None:
    if not catalog.table_exists(CHECKPOINT_TABLE):
        return None
    cp = catalog.read(CHECKPOINT_TABLE)
    return (
        cp.where((F.col("input_snapshot") == input_snapshot) & (F.col("state") == "done"))
        .select("bucket").distinct()
    )


def pending(df_bucketed: DataFrame, catalog: Catalog, input_snapshot: str) -> DataFrame:
    """Anti-join completed buckets away. The completed-bucket set is
    tiny (<= B rows) -> broadcast anti-join, no shuffle of the fact."""
    done = completed_buckets(catalog, input_snapshot)
    if done is None:
        return df_bucketed
    return df_bucketed.join(F.broadcast(done), on="bucket", how="left_anti")


def record_done(
    catalog: Catalog,
    buckets_stats: DataFrame,
    input_snapshot: str,
) -> None:
    """buckets_stats: (bucket, row_count, parse_errors). Appends 'done'
    lineage rows stamped with the driver clock."""
    rows = (
        buckets_stats.withColumn("input_snapshot", F.lit(input_snapshot))
        .withColumn("state", F.lit("done"))
        .withColumn("updated_ts", F.current_timestamp())
        .select("bucket", "input_snapshot", "row_count", "parse_errors",
                "state", "updated_ts")
    )
    # <= num_buckets rows: one file per append, not shuffle_partitions
    catalog.append(rows.coalesce(1), CHECKPOINT_TABLE)


def clear(catalog: Catalog) -> None:
    catalog.drop(CHECKPOINT_TABLE)
