"""Type-2 slowly-changing-dimension intervals from a change log.

The reference keeps only the latest state per key (latest-wins
compaction, pkg/core dedup path); an auditable pipeline also wants the
HISTORY — for each key, the sequence of distinct attribute values with
[valid_from, valid_to) intervals. This is the standard SCD2 build:

1. order the change log per key,
2. keep only rows where the tracked attribute actually changed
   (lag() null-safe compare — consecutive duplicates collapse),
3. close each interval with the next change's timestamp (lead()),
   the last interval staying open (is_current).

Scale: two window passes over the SAME (key, ts) sort — Catalyst
reuses one shuffle+sort for both (the change-filter window and the
interval window have identical partitioning/ordering), so the whole
operator costs a single exchange of (key, attr, ts) triples; payload
columns can be joined back afterwards by (key, valid_from).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from logging_spark.operators.asof import asof_join

OPEN_SENTINEL = -1  # valid_to for the current (open) interval


def scd2(
    df: DataFrame,
    key: str,
    attr: str,
    ts: Column,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 interval rows.

    ``ts`` must be a bigint column expression (e.g. microseconds) so
    the output is engine-portable. ``tiebreak`` columns make the
    per-key ordering total when timestamps can collide.

    Output: (key, attr, valid_from, valid_to, version, is_current) —
    ``valid_to`` is the next change's ts or ``OPEN_SENTINEL``,
    ``version`` counts intervals per key from 1, ``is_current`` is
    1 on the open interval.
    """
    tb = [c for c in (tiebreak or []) if c not in (key, attr)]
    w_log = Window.partitionBy(key).orderBy(
        F.col("valid_from").asc(), *[F.col(c).asc() for c in tb])
    changed = (
        df.select(key, attr, ts.alias("valid_from"), *tb)
        .withColumn("_prev", F.lag(attr).over(w_log))
        # null-safe: the first row per key (prev NULL) always starts
        # an interval; later rows only when the attribute moved
        .where(~F.col(attr).eqNullSafe(F.col("_prev")))
    )
    # identical partitioning AND ordering to w_log so Catalyst plans
    # ONE Exchange + ONE Sort for both window passes (plan-tested)
    w_iv = Window.partitionBy(key).orderBy(
        F.col("valid_from").asc(), *[F.col(c).asc() for c in tb])
    nxt = F.lead("valid_from").over(w_iv)
    return changed.select(
        key, attr, "valid_from",
        F.coalesce(nxt, F.lit(OPEN_SENTINEL)).alias("valid_to"),
        F.row_number().over(w_iv).cast("int").alias("version"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0))
         .cast("int").alias("is_current"),
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    attr: str = None,
) -> DataFrame:
    """Temporal dimension join: attach the SCD2 attribute that was
    valid at each fact's timestamp — the read side of scd2().

    Because scd2 intervals tile each key's timeline ([valid_from,
    valid_to) with the last interval open), "the interval containing
    ts" IS "the greatest valid_from <= ts", so the lookup is exactly
    an as-of join on valid_from — one equi-shuffle via asof_join's
    union-tag plan, never a range join. Facts before the key's first
    interval (or with no dim key) get a NULL attribute.

    ``fact_ts`` must be a bigint column name in the same unit as the
    dim's valid_from (microseconds for the events derivation).
    """
    cols = [attr] if attr else [
        c for c in dim.columns
        if c not in (key, "valid_from", "valid_to", "version",
                     "is_current")]
    if not cols:
        raise ValueError("scd2_lookup: no attribute columns in dim")
    d = dim.select(key, F.col("valid_from").alias("_vf"), *cols)
    return asof_join(facts, d, on=key, left_ts=fact_ts,
                     right_ts="_vf", payload_cols=cols)
