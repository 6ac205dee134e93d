"""Dotted-path Get / Set / Delete over struct and JSON-string columns.

Reference parity: pkg/core/dict.go:8-68 implements NestedGet /
NestedSet / NestedDelete over a map[string]any, walking a dotted path
and mutating in place. Re-expressed Spark-first:

- typed STRUCT columns use Catalyst's native field algebra —
  ``Column.withField`` (Set, creates or replaces, nested paths
  supported via dots) and ``Column.dropFields`` (Delete). Both stay
  inside whole-stage codegen and the optimizer prunes untouched
  sibling fields, so a Set/Delete over a 100-field struct never
  rewrites the other 99 through Python.
- untyped JSON STRING columns (e.g. the parser's ``attrs`` payload)
  go through ``from_json`` to ``map<string,string>``, a map-level
  edit, and back through ``to_json`` — one expression tree, no UDF.

Null behavior matches the reference's missing-key semantics: Get of an
absent path is NULL, Delete of an absent path is a no-op, Set on a
NULL JSON document stays NULL (use ``coalesce(col, '{}')`` upstream to
treat missing documents as empty ones).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def get_path(col: Column, path: str) -> Column:
    """Dotted-path Get from a struct column (dict.go:8-20): NULL when
    any intermediate field is NULL."""
    out = col
    for part in path.split("."):
        out = out.getField(part)
    return out


def set_path(col: Column, path: str, value: Column) -> Column:
    """Dotted-path Set on a struct column (dict.go:23-38): creates or
    replaces the leaf field, preserving every sibling."""
    return col.withField(path, value)


def delete_path(col: Column, path: str) -> Column:
    """Dotted-path Delete on a struct column (dict.go:41-57): removes
    the leaf field; absent paths are a no-op."""
    return col.dropFields(path)


def get_json_key(col: Column, key: str) -> Column:
    """Get a key from a flat JSON-object string column."""
    return F.get_json_object(col, f"$.{key}")


def set_json_key(col: Column, key: str, value: Column) -> Column:
    """Set (create or replace) a key in a flat JSON-object string of
    strings. Existing keys keep their first-occurrence position;
    a new key appends — same resolution as the parser's attrs map."""
    m = F.from_json(col, "map<string,string>")
    replaced = F.transform_values(
        m, lambda k, v: F.when(k == key, value.cast("string")).otherwise(v))
    out = F.when(F.array_contains(F.map_keys(m), key), replaced).otherwise(
        F.map_concat(m, F.create_map(F.lit(key), value.cast("string"))))
    return F.to_json(out)


def delete_json_key(col: Column, key: str) -> Column:
    """Delete a key from a flat JSON-object string; no-op if absent."""
    m = F.from_json(col, "map<string,string>")
    return F.to_json(F.map_filter(m, lambda k, v: k != key))
