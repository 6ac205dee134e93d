"""Ordered-step funnel analysis over an event stream.

Classic product-analytics operator (the reference pipeline's events
feed dashboards downstream; see SURVEY.md §2.4 on aggregation scope):
given an ordered list of step event types, count how many users reach
each step, where "reach step i" means the user has a step-i event
STRICTLY LATER than their earliest qualifying step-(i-1) event
(min-timestamp chaining — the standard strict-funnel semantics, exact
and engine-portable; no windowing approximations).

Scale shape (10^12 events): the first move filters the stream to the
funnel's event types — that predicate pushes to the scan, and funnels
typically select a tiny fraction of the stream. Every subsequent wide
dep is keyed on user_id: one min-agg per step plus one join per step
against the previous step's (user, ts) frame, whose size only ever
shrinks (users drop out monotonically). k steps = k small shuffles on
the same key; AQE co-locates the repeats. No driver-side loops over
data — the per-step counts union into one lazy plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_users(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> list[DataFrame]:
    """One (user, t_i) frame per step: users who reached step i, with
    the earliest timestamp at which they did under strict min-ts
    chaining. Frame i+1 is always a subset of frame i's users."""
    ev = (events.where(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col).alias("_u"), F.col(type_col).alias("_t"),
                  F.col(ts_col).alias("_ts")))
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        mine = ev.where(F.col("_t") == step)
        if prev is not None:
            mine = (mine.join(prev.select("_u", F.col("_mts").alias("_pts")),
                              "_u")
                    .where(F.col("_ts") > F.col("_pts")))
        cur = mine.groupBy("_u").agg(F.min("_ts").alias("_mts"))
        out.append(cur.select(F.col("_u").alias(user_col),
                              F.col("_mts").alias(f"t{i + 1}")))
        prev = cur
    return out


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """(step_idx, step, n_users): how many users reach each funnel
    step. n_users is non-increasing in step_idx by construction."""
    stages = funnel_users(events, steps, user_col=user_col,
                          ts_col=ts_col, type_col=type_col)
    counted = [
        s.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(step).alias("step"), "n_users")
        for i, (step, s) in enumerate(zip(steps, stages))
    ]
    return reduce(lambda a, b: a.unionByName(b), counted)
