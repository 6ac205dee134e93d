"""ORC source/sink — the second Spark-native columnar format.

Parquet is the repo's primary table format (sources/catalog.py), but
real estates are mixed: Hive-era warehouses hand ORC to every new
pipeline, and a drop-in engine must read and write it with the same
scan hygiene (predicate pushdown, column pruning, partition pruning)
it gets from parquet. Spark's ORC reader is JVM-native and vectorized
(`spark.sql.orc.impl=native` is the default since 2.4), so none of
this touches Python.

Round-trip fidelity is proven in tests/test_orc.py with
dq.table_fingerprint equality against the parquet original — the same
commutative bit_xor fingerprint the audit family uses — plus plan
assertions that filters reach the ORC scan (PushedFilters) and that
hive-style partition writes prune (PartitionFilters).

Scale notes: zstd compression to match the parquet side;
`maxPartitionBytes` governs split sizing the same way for both
formats, so the sf-tuned session defaults carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None,
              compression: str = "zstd") -> None:
    """Overwrite-write `df` as ORC, optionally hive-partitioned."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
