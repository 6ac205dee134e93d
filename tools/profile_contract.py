"""Profile every contract query the way the driver's correctness sweep
runs them: Spark eval (collect) + DuckDB oracle, timed per query.

Usage: python tools/profile_contract.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from logging_spark import contract
from logging_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = build_session("profile-contract")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    queries = contract.build_queries()
    oracles = contract.build_oracles()
    rows = []
    for name, fn in queries.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.monotonic()
        try:
            n_spark = len(fn(spark, sf_dir).collect())
            t_spark = time.monotonic() - t0
            err = None
        except Exception as exc:  # noqa: BLE001
            t_spark = time.monotonic() - t0
            n_spark = -1
            err = str(exc)[:120]
        t_oracle = 0.0
        n_oracle = -1
        if name in oracles and err is None:
            t1 = time.monotonic()
            try:
                n_oracle = len(con.execute(oracles[name]).fetchall())
            except Exception as exc:  # noqa: BLE001
                err = "oracle: " + str(exc)[:120]
            t_oracle = time.monotonic() - t1
        rows.append((name, t_spark, t_oracle, n_spark, n_oracle, err))
        print(
            f"{name:28s} spark={t_spark:7.2f}s oracle={t_oracle:7.2f}s "
            f"rows={n_spark}/{n_oracle} {err or ''}",
            flush=True,
        )
    total_s = sum(r[1] for r in rows)
    total_o = sum(r[2] for r in rows)
    print(f"\nTOTAL spark={total_s:.1f}s oracle={total_o:.1f}s n={len(rows)}")
    top = sorted(rows, key=lambda r: -(r[1] + r[2]))[:12]
    print("slowest:", json.dumps([(r[0], round(r[1] + r[2], 2)) for r in top]))
    spark.stop()


if __name__ == "__main__":
    main()
