"""Warehouse catalog: Iceberg when the runtime jar is present,
Parquet-directory fallback otherwise (this image ships no Iceberg
jar — SURVEY.md §7 mandates the fallback).

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

    def drop(self, table: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._ident(table)}")
            return
        import shutil
        shutil.rmtree(self._path(table), ignore_errors=True)
