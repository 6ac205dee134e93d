"""Warehouse catalog: Iceberg when the runtime jar is present,
Parquet-directory fallback otherwise.

STATUS OF THE ICEBERG BRANCH: designed-for, NOT exercised — this image
ships no iceberg-spark-runtime jar and has no network to fetch one, so
every `self.iceberg` path below (snapshot reads, overwritePartitions,
MERGE INTO) is written against the published Iceberg-Spark API but has
never run here. The tested, supported backend in this repo is the
parquet fallback; treat the Iceberg code as a deployment template to
be validated when a jar is available (drop it on the classpath and the
same Catalog calls switch over).

The pipeline only uses four verbs, all of which exist in both
backends with the same semantics:

- read(table)
- append(df, table)
- overwrite_partitions(df, table, partition_cols)  # idempotent resume
- table_exists(table)  # the topic-exists probe analog
  (reference pkg/utils/kafka.go:9-28)

On Iceberg, overwrite_partitions maps to
``df.writeTo(t).overwritePartitions()`` (snapshot-isolated, atomic);
on Parquet it maps to dynamic partition overwrite, which this module
configures per-write. Sink tables are created on first write — the
analog of auto topic creation (kafka.go:30-56).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_frames(existing: DataFrame, updates: DataFrame, keys: list[str],
                 order_col: str | None = None) -> DataFrame:
    """Field-wise merge of `updates` into `existing` (same schema):
    per key, a NON-NULL update field replaces the existing value and a
    NULL update field PRESERVES it; keys only in updates insert, keys
    only in existing survive untouched. This is the reference Apply's
    per-field merge contract (datasource.go:206-276), where a partial
    update object must not clobber sibling fields.

    `order_col`: when updates may carry several rows per key, the row
    with the highest order_col wins (latest-wins pre-dedup); without
    it the caller guarantees one row per key.

    Plan shape: one equi full-outer join on the keys (broadcast when
    the update side is small, AQE otherwise) + a coalesce projection —
    no UDFs, no collects."""
    if order_col is not None:
        from pyspark.sql import Window
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        updates = (updates.withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") == 1).drop("_rn"))
    value_cols = [c for c in existing.columns if c not in keys]
    joined = existing.alias("_e").join(updates.alias("_u"), on=keys, how="full_outer")
    return joined.select(
        *[F.col(k) for k in keys],
        *[F.coalesce(F.col(f"_u.{c}"), F.col(f"_e.{c}")).alias(c)
          for c in value_cols],
    )


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str, catalog_name: str = "local"):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog_name = catalog_name
        self.iceberg = _iceberg_available(spark)
        if self.iceberg:
            spark.conf.set(f"spark.sql.catalog.{catalog_name}",
                           "org.apache.iceberg.spark.SparkCatalog")
            spark.conf.set(f"spark.sql.catalog.{catalog_name}.type", "hadoop")
            spark.conf.set(f"spark.sql.catalog.{catalog_name}.warehouse", warehouse)
        else:
            os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, *table.split("."))

    def _ident(self, table: str) -> str:
        return f"{self.catalog_name}.{table}"

    # -- verbs ---------------------------------------------------------
    def table_exists(self, table: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._ident(table))
        p = self._path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith(("part-", "_SUCCESS", "bucket="))
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.format("iceberg").load(self._ident(table))
        return self.spark.read.parquet(self._path(table))

    def append(self, df: DataFrame, table: str, partition_cols: list[str] | None = None) -> None:
        if self.iceberg:
            writer = df.writeTo(self._ident(table))
            if not self.table_exists(table):
                if partition_cols:
                    from pyspark.sql import functions as F
                    writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
                writer.create()
            else:
                writer.append()
            return
        w = df.write.mode("append")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(self._path(table))

    def overwrite_partitions(self, df: DataFrame, table: str,
                             partition_cols: list[str]) -> None:
        """Replace exactly the partitions present in df (idempotent
        re-run of a resumed bucket never double-writes)."""
        if self.iceberg:
            writer = df.writeTo(self._ident(table))
            if not self.table_exists(table):
                from pyspark.sql import functions as F
                writer.partitionedBy(*[F.col(c) for c in partition_cols]).create()
            else:
                writer.overwritePartitions()
            return
        # dynamic overwrite: session conf is set in session.py; assert
        # rather than silently clobbering the whole table
        mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        if mode.lower() != "dynamic":
            raise RuntimeError(
                "partitionOverwriteMode must be 'dynamic' for idempotent resume"
            )
        (df.write.mode("overwrite").partitionBy(*partition_cols)
         .parquet(self._path(table)))

    def merge_upsert(self, df: DataFrame, table: str, keys: list[str],
                     order_col: str | None = None) -> None:
        """S5 Apply with the reference's FIELD-WISE merge semantics
        (datasource.go:206-276): see merge_frames. Intended for
        control-plane-sized tables (rule/config/dimension) — the hot
        data path stays on overwrite_partitions. On Iceberg this is a
        single atomic MERGE INTO; the parquet fallback writes the
        merged frame to a temp sibling directory and swaps it over the
        table path with two renames — the source data survives on disk
        (as `<path>.old`) until the new copy is fully written, so a
        crash or lost executor mid-write can never lose the table
        (mode('overwrite') in place would delete the old files BEFORE
        the write, leaving only non-reliable localCheckpoint blocks).
        Residual non-atomicity: between the two renames the table path
        is briefly absent — acceptable for the control-plane tables
        this verb serves; the data path uses overwrite_partitions."""
        if not self.table_exists(table):
            if order_col is not None:
                df = merge_frames(df.limit(0), df, keys, order_col)
            self.append(df, table)
            return
        if self.iceberg:
            value_cols = [c for c in df.columns if c not in keys]
            tmp = f"_merge_src_{table.replace('.', '_')}"
            df.createOrReplaceTempView(tmp)
            on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            sets = ", ".join(f"t.{c} = coalesce(s.{c}, t.{c})" for c in value_cols)
            self.spark.sql(
                f"MERGE INTO {self._ident(table)} t USING {tmp} s ON {on} "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT *")
            return
        import shutil

        path = self._path(table)
        tmp = f"{path}.tmp-{os.getpid()}"
        old = f"{path}.old"
        merged = merge_frames(self.read(table), df, keys, order_col)
        merged.write.mode("overwrite").parquet(tmp)  # old files still live
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def compact(self, table: str, target_file_bytes: int = 128 << 20,
                partition_cols: list[str] | None = None) -> int:
        """Rewrite `table` into ~target-sized files and return the new
        file count. THE streaming-sink maintenance verb: every
        availableNow drain / micro-batch appends a few small files, and
        a month of that turns scans into open-file storms (and, on
        object stores, LIST storms). Sizing uses the table's actual
        on-disk bytes (no sampling); with `partition_cols` the rewrite
        repartitions on them so each hive partition lands contiguous
        files. Crash-safe exactly like merge_upsert's fallback: write
        to a temp sibling, two-rename swap, old data live until the new
        copy is complete. On Iceberg, prefer the engine's own
        rewrite_data_files action; this verb is the parquet-fallback
        equivalent."""
        import shutil

        path = self._path(table)
        files = [os.path.join(dp, f) for dp, _, fs in os.walk(path)
                 for f in fs if f.endswith(".parquet")]
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, -(-total // target_file_bytes))
        df = self.read(table)
        if partition_cols:
            out = df.repartition(int(n_out), *partition_cols)
        else:
            out = df.repartition(int(n_out))
        tmp = f"{path}.tmp-{os.getpid()}"
        old = f"{path}.old"
        w = out.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        return len([os.path.join(dp, f) for dp, _, fs in os.walk(path)
                    for f in fs if f.endswith(".parquet")])

    def erase_rows(self, table: str, predicate: str) -> int:
        """Targeted erasure (right-to-be-forgotten / S6 Delete at row
        granularity): rewrite `table` WITHOUT the rows matching
        `predicate` (a SQL boolean over the table's columns) and
        return how many were erased. Crash-safe like merge_upsert's
        fallback: the survivors are fully written to a temp sibling
        before the two-rename swap, so the original data outlives any
        mid-write failure. On Iceberg this is a single
        `DELETE FROM ... WHERE` (position/equality deletes); the
        parquet fallback pays one full rewrite — at 100 TB, partition
        the table on the erasure key (e.g. user bucket) so the
        rewrite touches only matching partitions via
        overwrite_partitions instead.

        Counts come from one pass (conditional agg), survivors from a
        second — two scans total, no collect of data rows."""
        if self.iceberg:
            df = self.read(table)
            n = df.where(predicate).count()
            self.spark.sql(
                f"DELETE FROM {self._ident(table)} WHERE {predicate}")
            return n
        import shutil

        path = self._path(table)
        df = self.read(table)
        n = df.where(predicate).count()
        if n == 0:
            return 0
        survivors = df.where(f"NOT ({predicate})")
        tmp = f"{path}.tmp-{os.getpid()}"
        old = f"{path}.old"
        survivors.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        # between these two renames the table path is briefly absent
        # for concurrent readers; acceptable for this single-writer
        # verb (Iceberg's DELETE branch above is the atomic path)
        os.rename(path, old)
        os.rename(tmp, path)
        # erasure verb: the pre-erasure copy MUST actually be gone —
        # a swallowed rmtree failure would silently keep the "erased"
        # rows on disk (round-3 ADVICE), so verify and raise.
        shutil.rmtree(old)
        if os.path.exists(old):
            raise OSError(
                f"erase_rows: pre-erasure copy still present at {old}; "
                "erased rows remain on disk — remove it manually")
        return n

    def drop(self, table: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(table)}")
            return
        import shutil
        shutil.rmtree(self._path(table), ignore_errors=True)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist `df` as a BUCKETED managed table: files are
    hash-clustered by `bucket_cols` into `n_buckets` buckets (and
    optionally sorted within each), so any join or aggregation keyed on
    those columns reads co-located data and plans WITHOUT a shuffle on
    either bucketed side — the prepaid-exchange strategy for the
    tables a 100 TB pipeline joins repeatedly (fact↔fact on conv_id).
    Plan-proofed in tests/test_bucketed.py: a self-join of two bucketed
    tables on the bucket key has zero Exchange nodes.

    Spark-native bucketing requires saveAsTable (the bucket spec lives
    in the session catalog/metastore; spark.read.parquet on the bare
    path would not know it). Iceberg's equivalent is a
    `bucket(n, col)` partition transform on writeTo — same co-location,
    engine-tracked metadata (sources/catalog.py Iceberg branch)."""
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
