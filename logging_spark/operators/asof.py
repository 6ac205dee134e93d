"""As-of (backward) joins and bucketized interval joins over event time.

Two operators the DataFrame API lacks as primitives, each expressed so
the physical plan is an equi-shuffle — never a range/cross join, which
Spark would otherwise plan as BroadcastNestedLoopJoin (quadratic, the
classic event-table scale-killer):

asof_join — for every left row, attach the payload of the most recent
right row with the same key and right_ts <= left_ts (SQL's ASOF JOIN,
kdb's aj). Formulated as the union trick: tag the sides, sort each key
group once by (ts, side), and carry the right payload forward with
last(ignorenulls) over an unbounded-preceding running window. ONE
shuffle keyed on the join key, state flows within each sorted
partition, and equal timestamps resolve right-before-left so "as of"
includes ties. At 100 TB both sides stream through a single
sort-merge-shaped pass; per-key volume is the only skew axis (same as
any sessionization), so pathological keys are the caller's salt/cap
decision, not a plan change.

interval_join — match point events to [start, end) intervals with the
same key. Formulated as the bucketized interval join: each interval
explodes into the fixed-width time buckets it covers, each event maps
to its single bucket, and the match is an equi-join on (key, bucket)
plus the exact containment predicate. Because an event owns exactly
one bucket, every qualifying (event, interval) pair is produced
exactly once — no post-join distinct. Bucket width trades fan-out
(intervals emit ceil(len/width)+1 rows) against join selectivity; set
it near the typical interval length.

Reference behavior anchor: the reference pipeline correlates log
records to the controller state in effect at record time
(pkg/datasource/datasource.go list/watch snapshot semantics); asof_join
is that correlation as a batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """left rows + the latest right payload at-or-before each left row.

    `payload_cols` (default: every right column except `on`/`right_ts`)
    must not collide with left column names. Right rows should be
    unique per (on, right_ts) — pre-aggregate otherwise; with
    duplicates the carried row is the last in (ts) order within the
    key, which is not total. Left rows with no prior right row get
    NULL payload (ASOF LEFT JOIN semantics). NULL timestamps sort
    FIRST (Spark window default): a NULL-ts right row acts as an
    earlier-than-everything state, a NULL-ts left row sees only such
    states — filter NULL event times upstream if that's not intended.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, right_ts)]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left: {sorted(clash)}")

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload_cols) + ">").alias("_r"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    # right sorts before left at equal ts (_side 0 < 1), so a state row
    # stamped exactly at event time is already visible to that event
    w = (Window.partitionBy("_k").orderBy("_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (l_tag.unionByName(r_tag)
               .withColumn("_state", F.last("_r", ignorenulls=True).over(w)))
    out = carried.where(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_state.{c}").alias(c) for c in payload_cols],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_s: int = 600,
) -> DataFrame:
    """events ⨝ intervals where ts in [start, end), same key.

    Output: every event column + every interval column (caller ensures
    no collisions). Equi-join on (key, time bucket); the containment
    predicate rides the join so Catalyst evaluates it inside the join,
    not as a post-filter over a wider result.
    """
    clash = (set(intervals.columns) - {on}) & set(events.columns)
    if clash:
        raise ValueError(f"interval columns collide with events: {sorted(clash)}")
    e_b = events.withColumn(
        "_bkt", (F.unix_timestamp(ts) / bucket_s).cast("long"))
    i_b = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            (F.unix_timestamp(start) / bucket_s).cast("long"),
            (F.unix_timestamp(end) / bucket_s).cast("long"),
        )))
    cond = ((e_b[on] == i_b[on]) & (e_b["_bkt"] == i_b["_bkt"])
            & (e_b[ts] >= i_b[start]) & (e_b[ts] < i_b[end]))
    keep_i = [c for c in intervals.columns if c != on]
    return (e_b.join(i_b, cond, "inner")
            .select(*[e_b[c] for c in events.columns],
                    *[i_b[c] for c in keep_i]))
