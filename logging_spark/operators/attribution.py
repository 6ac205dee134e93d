"""Marketing-style touch attribution over an event stream.

For every conversion event, find the FIRST and LAST qualifying touch
event of the same user inside a lookback window, and roll conversion
value up by attribution model — the canonical funnel-credit question
("which channel gets the purchase?").

Spark-first plan: both models ride ONE per-user time sort. A single
RANGE-framed window (order = event-time micros, frame =
[-lookback, -1]) computes max(struct(us, event_id, type)) and
min(struct(...)) over the conditional touch rows — struct ordering
gives the latest/earliest touch with its type riding along, and the
strict -1 upper bound keeps same-instant touches out (ties inside the
frame break on event_id, deterministically). No self-join: at 10^12
events the naive conversions-x-touches join explodes on active users,
while the window is one shuffle + one sorted pass. The rollup unpivots
(model, touch_type) with stack() so both models aggregate in one
grouped count.

The DuckDB oracle intentionally RUNS the naive join plan
(conversions LEFT JOIN touches + two row_numbers) — agreeing outputs
prove the window semantics against first principles.

Conversions with no in-window touch attribute to 'none' (kept, never
dropped — unattributed spend is the signal people forget).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def touch_attribution(events: DataFrame, user_col: str, us_col: str,
                      type_col: str, cents_col: str,
                      conversion_type: str,
                      touch_types: Sequence[str],
                      lookback_us: int) -> DataFrame:
    """Per-conversion first/last-touch assignment. Output: user,
    event_id, us, cents, first_touch, last_touch ('none' when no
    touch in [us - lookback_us, us - 1])."""
    is_touch = F.col(type_col).isin(*touch_types)
    tagged = events.select(
        F.col(user_col).alias("user"),
        F.col(us_col).cast("long").alias("us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col(type_col).alias("etype"),
        F.col(cents_col).cast("long").alias("cents"),
        F.when(is_touch, F.struct(
            F.col(us_col).cast("long").alias("us"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col(type_col).alias("t"))).alias("_tch"))
    w = (Window.partitionBy("user").orderBy("us")
         .rangeBetween(-int(lookback_us), -1))
    scored = (tagged
              .withColumn("_first", F.min("_tch").over(w))
              .withColumn("_last", F.max("_tch").over(w)))
    return (scored.where(F.col("etype") == conversion_type)
            .select("user", "event_id", "us", "cents",
                    F.coalesce(F.col("_first.t"), F.lit("none"))
                    .alias("first_touch"),
                    F.coalesce(F.col("_last.t"), F.lit("none"))
                    .alias("last_touch")))


def attribution_rollup(per_conversion: DataFrame) -> DataFrame:
    """(model, touch_type) credit table from touch_attribution output:
    one stack() unpivot + one grouped agg for BOTH models."""
    long_ = per_conversion.selectExpr(
        "cents",
        "stack(2, 'first', first_touch, 'last', last_touch) "
        "AS (model, touch_type)")
    return (long_.groupBy("model", "touch_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"),
                 F.sum("cents").cast("long").alias("cents")))
