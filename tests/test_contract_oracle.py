"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query and its DuckDB oracle at a small sf and compare
row count + column names + order-insensitive values exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def _rows(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = [[row[c] for c in scols] for row in sdf.collect()]

    res = duck.execute(ORACLES[name])
    ocols_all = [d[0] for d in res.description]
    orows_raw = res.fetchall()
    assert sorted(ocols_all) == scols, f"{name}: columns differ"
    idx = [ocols_all.index(c) for c in scols]
    orows = [[r[i] for i in idx] for r in orows_raw]

    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    sn, on = _rows(srows), _rows(orows)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b][:5]
    assert sn == on, f"{name}: value mismatch, first diffs: {mismatches}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"sink_name", "n_rows", "n_distinct_conv"}
