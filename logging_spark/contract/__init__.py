"""Driver-contract queries: every SURVEY §2 operator as a
(spark_query, duckdb_oracle_sql) pair over the driver's parquet tables.

The reference pipeline operates on transcript turns
(conv_id, turn_idx, role, text, tool, ts) — BASELINE.json input_hint.
The driver's tables have no such table, so both engines derive an
IDENTICAL turns view from `events` (and the enrichment dimension from
`customer`): same string building, same casts, same null behavior.
Every derivation below is written twice — once in DataFrame API (the
implementation under test, calling into logging_spark operators) and
once in ANSI-ish SQL DuckDB runs — and the driver hash-compares them.

Engine-portability rules used throughout (learned the hard way):
- doubles are never summed as doubles: money math is cast to
  decimal(18,2), aggregated exactly, and the RESULT cast to double;
- DuckDB `CAST(double AS BIGINT)` rounds while Spark truncates →
  always floor() first on both sides;
- DuckDB epoch() returns fractional seconds; Spark unix_timestamp()
  floors → oracle uses CAST(floor(epoch(ts)) AS BIGINT);
- Spark concat() is null-propagating, DuckDB's is not → every
  nullable concat operand is wrapped in coalesce(x, '');
- md5 (lowercase hex) is the only hash both engines share → the
  `portable=True` paths of dedup/minhash use it;
- integral ratios: compute both operands as x100/x10000 longs, then
  Spark `a DIV b` == DuckDB `a // b` for non-negative operands —
  never decimal division (engine-specific scale/rounding). Measured
  round 4: BOTH engines truncate toward zero for BIGINT negatives
  (-7 DIV 2 == -7 // 2 == -3), so negative numerators agree too —
  but PYTHON's // floors (-4): pure-Python brute-force twins in
  tests must use trunc division, and keeping numerators non-negative
  stays the safe default;
- bit_xor is an aggregate in BOTH engines → portable commutative
  fingerprints (sum of hashes would overflow / throw under ANSI);
- null-safe compares: Spark eqNullSafe ↔ DuckDB IS [NOT] DISTINCT
  FROM — mirror them in pairs or NULL attrs drift;
- DuckDB integer literals are INT32: `3600 * 1000000` overflows at
  parse time → write big literals pre-multiplied or CAST AS BIGINT;
- F.session_window's boundary is end-EXCLUSIVE: the oracle's split
  test is `diff >= gap` (the sessionize operator's is `> gap`)."""

from __future__ import annotations

from importlib import import_module
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from logging_spark.contract._fixtures import *  # noqa: F401,F403
from logging_spark.contract._fixtures import (  # noqa: F401
    _read, _memo, _case, _spread, _LEVEL_CASE, _ROLE_CASE,
    _lsh_body, _lsh_ctes, _lsh_pairs, _m)
from logging_spark.contract._window import (  # noqa: F401
    _FLAGSHIP_ORDER, _PINNED_IN_WINDOW, _rotation_offset, _stratify)

# import_module, not `from ... import`: the star-import above binds
# fixture names (text, mm, sample, ...) as package attributes, and
# `from package import name` would return those instead of the
# same-named family submodules
_FAMILY_MODULES = tuple(
    import_module(f'logging_spark.contract.{m}')
    for m in ("pipe", "events", "docs", "tpch", "text", "dedup", "sample", "sim", "mm", "agg", "window", "dim", "dq", "audit"))
_ORACLE_MODULES = tuple(
    import_module(f'logging_spark.contract.{m}')
    for m in ("pipe", "events_sql", "events_sql2", "docs", "tpch", "text", "dedup", "sample", "sim", "mm", "agg", "window", "dim", "dq", "audit"))


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for _mod in _FAMILY_MODULES:
        _mod.register(q)
    return _stratify(q, set(build_oracles()))


def build_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    for _mod in _ORACLE_MODULES:
        _mod.register_oracles(o)
    return o
