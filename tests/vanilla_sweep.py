"""Driver-environment dry run: execute every contract query under a
VANILLA SparkSession (none of logging_spark.session's tunings — default
mapKeyDedupPolicy=EXCEPTION, no Arrow conf, default shuffle partitions)
and value-compare oracle-checked queries against DuckDB, replicating
the driver's gate as closely as possible.

Not collected by pytest (no test_ prefix); run manually:

    python tests/vanilla_sweep.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .appName("vanilla-sweep")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    bad = []
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, sf)
            scols = sorted(sdf.columns)
            srows = sorted(tuple(_norm(row[c]) for c in scols)
                           for row in sdf.collect())
            if name not in oracles:
                print(f"{name:<28} rows-only  {len(srows)} rows")
                continue
            res = duck.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            idx = [ocols.index(c) for c in scols]
            orows = sorted(tuple(_norm(r[i]) for i in idx)
                           for r in res.fetchall())
            ok = srows == orows
            print(f"{name:<28} {'OK' if ok else 'VALUE MISMATCH'}  {len(srows)} rows")
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:<28} ERROR {type(exc).__name__}: {exc}")
            bad.append(name)
    df = entry_mod.entry(spark)
    print("entry():", df.count(), "rows")
    spark.stop()
    print("FAILURES:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
