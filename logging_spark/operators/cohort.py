"""Cohort retention over an event stream.

Standard product-analytics rollup (the counterpart of the funnel in
operators/funnel.py): bucket users into cohorts by their FIRST active
period, then count how many of each cohort are active k periods later.

Scale shape: ONE per-user hash aggregate assembles (first period,
active-period set) straight off the scan — collect_set dedups, and its
partial (map-side) aggregation already collapses each input partition
to ≤#periods entries per user before the shuffle, so a separate
distinct pass would only add a second full-volume exchange for
nothing. Per-user state is bounded by the timeline length (#periods),
not by event count. The cohort×offset rollup after the explode is a
second, tiny exchange. Period ids are integer epoch-week indices
(floor(epoch_seconds / 604800)) rather than engine date_trunc, so the
DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEEK_S = 7 * 24 * 3600


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", period_s: int = WEEK_S) -> DataFrame:
    """(cohort_period, periods_since, n_users): for every cohort
    (period of first activity) and offset k, the number of its users
    active exactly k periods after their first. Offset 0 rows equal
    cohort sizes by construction."""
    period = F.floor(
        F.unix_timestamp(F.col(ts_col).cast("timestamp")) / period_s
    ).cast("long")
    up = events.select(F.col(user_col).alias("_u"), period.alias("_p"))
    per_user = up.groupBy("_u").agg(
        F.min("_p").alias("_p0"),
        F.collect_set("_p").alias("_ps"))
    active = per_user.select(
        "_p0", F.explode("_ps").alias("_p"))
    return (active.groupBy(F.col("_p0").alias("cohort_period"),
                           (F.col("_p") - F.col("_p0")).alias("periods_since"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def churn_labels(df: DataFrame, user_col: str, ts_col: str,
                 cutoff: str, horizon_days: int = 7,
                 feature_days: int = 7) -> DataFrame:
    """Leakage-free churn training set: one row per user active in
    the FEATURE window [cutoff - feature_days, cutoff), with integer
    behavioral features from that window only and label churned = 1
    iff the user has NO event in the LABEL window
    [cutoff, cutoff + horizon_days).

    The temporal split is the whole point: every feature is computed
    strictly before `cutoff` and the label strictly after, so the
    set can't leak future information — the hygiene mistake that
    makes offline churn models look great and ship terribly. One
    scan builds both windows' aggregates (conditional sums), one
    row per user, no joins.
    """
    c = F.to_timestamp(F.lit(cutoff))
    lo = c - F.expr(f"INTERVAL {feature_days} DAYS")
    hi = c + F.expr(f"INTERVAL {horizon_days} DAYS")
    ev = df.where((F.col(ts_col) >= lo) & (F.col(ts_col) < hi))
    in_feat = F.col(ts_col) < c
    per = (ev.groupBy(F.col(user_col))
           .agg(F.sum(in_feat.cast("long")).alias("n_events"),
                F.countDistinct(F.when(in_feat, F.col("event_type")))
                .cast("long").alias("n_types"),
                F.countDistinct(
                    F.when(in_feat, F.col(ts_col).cast("date")))
                .cast("long").alias("days_active"),
                F.max(F.when(in_feat, F.col(ts_col))).alias("_last"),
                F.sum((~in_feat).cast("long")).alias("_n_after")))
    # recency in whole hours via integer micros DIV — DuckDB's
    # date_diff counts boundary CROSSINGS, not elapsed units, so a
    # unit-diff function would silently diverge between engines
    return (per.where(F.col("n_events") > 0)  # active in feature win
            .select(F.col(user_col), "n_events", "n_types",
                    "days_active",
                    F.expr(
                        f"(unix_micros(CAST(to_timestamp('{cutoff}') "
                        f"AS TIMESTAMP)) - unix_micros(CAST(_last AS "
                        f"TIMESTAMP))) DIV 3600000000")
                    .cast("long").alias("recency_hours"),
                    (F.col("_n_after") == 0).cast("int")
                    .alias("churned")))
