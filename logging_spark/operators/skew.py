"""Skew handling: hot-key detection + salted repartition.

The reference has no skew story — hot services simply get a busy
Kafka topic. At 10^12 turns a hot conv_id would bottleneck any
shuffle keyed on conv_id alone, so (north_rule) we handle it
explicitly:

1. AQE skew-join/partition splitting is always on (session.py) —
   catches moderate skew for free.
2. For shuffles we author ourselves (repartition before sink write,
   per-conversation state ops), `salted_repartition` spreads each
   conv across `salt_buckets` partitions using a salt DERIVED FROM
   turn_idx — deterministic, so a re-run lands rows in the same
   partition (required for idempotent per-partition overwrite).
3. `hot_keys` finds heavy hitters with a cheap two-phase count so
   callers can salt only the hot keys (keeping cold conversations
   co-located, which preserves single-partition per-conv locality
   for downstream per-conv work).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(salt_buckets: int, from_col: str = "turn_idx") -> Column:
    return F.pmod(F.hash(F.col(from_col)), F.lit(salt_buckets)).cast("int")


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "conv_id",
    salt_buckets: int = 16,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Repartition by (key, salt) where salt is nonzero only for hot
    keys (all keys if `hot` is None). Deterministic across re-runs."""
    if hot is None:
        salted = df.withColumn("_salt", salt_col(salt_buckets))
    else:
        hot_marked = F.broadcast(hot.select(F.col(key).alias("_hk"),
                                            F.lit(True).alias("_is_hot")))
        salted = (
            df.join(hot_marked, df[key] == hot_marked["_hk"], "left")
            .withColumn(
                "_salt",
                F.when(F.col("_is_hot"), salt_col(salt_buckets)).otherwise(F.lit(0)),
            )
            .drop("_hk", "_is_hot")
        )
    return salted.repartition(num_partitions, key, "_salt").drop("_salt")


def hot_keys(df: DataFrame, key: str = "conv_id", threshold: int = 100_000) -> DataFrame:
    """Heavy hitters: keys with > threshold rows. One aggregation with
    map-side partial combine; output is heavy-hitter-sized (tiny)."""
    return df.groupBy(key).count().where(F.col("count") > threshold).select(key)


def skew_split_join(fact: DataFrame, dim: DataFrame, key: str,
                    hot_threshold: int = 100_000,
                    how: str = "inner") -> DataFrame:
    """Row-identical to ``fact.join(dim, key, how)`` but immune to a
    hot join key: fact rows are split on membership in the measured
    hot-key set, the hot slice joins against a BROADCAST of the dim
    rows for those few keys (no shuffle can skew — the fact side
    never moves), and only the cold remainder pays a shuffle join,
    which is uniform by construction after the split.

    This is the join twin of `salted_agg`: AQE's skew-join splitting
    handles moderate cases at runtime, but it only subdivides
    oversized partitions AFTER shuffling the fact side; with a
    pathological key (one user with 10^9 events) the split-broadcast
    form never shuffles those rows at all. The hot set comes from
    `hot_keys` (one map-side-combined count), is heavy-hitter-sized
    by definition, and both semi/anti probes broadcast it.

    Supports inner and left joins (the shapes whose hot/cold slices
    union losslessly)."""
    if how not in ("inner", "left"):
        raise ValueError(f"skew_split_join: unsupported how={how!r}")
    hot = F.broadcast(hot_keys(fact, key, hot_threshold))
    fact_hot = fact.join(hot, key, "left_semi")
    fact_cold = fact.join(hot, key, "left_anti")
    dim_hot = dim.join(hot, key, "left_semi")
    hot_side = fact_hot.join(F.broadcast(dim_hot), key, how)
    cold_side = fact_cold.join(dim, key, how)
    return hot_side.unionByName(cold_side)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_from: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: partial-agg by
    (keys..., salt), then finalize by keys. `aggs` maps each output
    name to (partial aggregate expression, re-aggregation kind) with
    kind one of sum / min / max / bit_xor — the decomposable
    aggregates (count decomposes as a partial count re-aggregated by
    sum). Result is row-identical to the plain groupBy.

    Spark's map-side partial aggregation usually makes this manual
    form unnecessary — but when a single reduce key is hot enough
    that its FINAL partition is the straggler (one conv_id with 10^9
    turns), the salt splits that key across `salt_buckets` reducers
    and the finalize pass touches only #keys x salt_buckets rows.
    The salt derives from a data column (never rand()) so re-runs are
    deterministic, and AQE skew handling does not cover aggregations
    (it only splits join partitions) — this is the aggregation twin.
    """
    _refn = {"sum": F.sum, "min": F.min, "max": F.max,
             "bit_xor": lambda c: F.expr(f"bit_xor({c})")}
    for name, (_, kind) in aggs.items():
        if kind not in _refn:
            raise ValueError(f"salted_agg: {name}: non-decomposable "
                             f"re-aggregation kind {kind!r}")
    partial = (df.withColumn("_salt", salt_col(salt_buckets, salt_from))
               .groupBy(*keys, "_salt")
               .agg(*[e.alias(f"_p_{n}") for n, (e, _) in aggs.items()]))
    return partial.groupBy(*keys).agg(
        *[_refn[kind](f"_p_{n}").alias(n)
          for n, (_, kind) in aggs.items()])
