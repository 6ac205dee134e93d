"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in logging_spark.contract: each query calls the
package operators (parse/enrich/route/dedup/aggregate + the
training-data dedup/similarity/text family) and each oracle is the
same derivation in DuckDB SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logging_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedup→parse→enrich→route→aggregate pipeline
    (per-sink exact counts) over the sf0.001 events-derived turns."""
    return contract.build_queries()["pipe_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.build_queries()


def oracle_sql() -> dict[str, str]:
    return contract.build_oracles()
