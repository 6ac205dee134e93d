"""Incremental view maintenance: keep an aggregate current from a CDC
stream without rescanning the fact table.

`diff.changeset` answers "replay the TABLE"; this answers "replay the
AGGREGATE" — the classic IVM delta rule for count/sum views: every
change contributes -before to its before-group and +after to its
after-group (group-migration updates included, handled by construction
because the two contributions land on different keys), the per-group
deltas fold into the materialized aggregate with one churn-sized
full-outer join, and groups whose count reaches zero vanish. avg/ratio
views derive from (count, sum) pairs downstream; min/max are NOT
incrementally maintainable under deletes and are deliberately out of
scope.

The correctness claim is an identity, not an approximation:
``apply_agg_delta(agg(old), changeset_full(old, new)) == agg(new)``
row for row — the contract query `events_ivm_agg` proves exactly that
with the oracle computing ``agg(new)`` directly.

Scale shape at 10^12 rows: the maintained aggregate is group-sized,
the changeset is churn-sized, and nothing here touches the fact
table — total work O(churn + groups) per refresh, vs O(table) for
the recompute it replaces. `changeset_full`'s join cost is the same
keyed full-outer `snapshot_diff` already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logging_spark.operators.diff import snapshot_diff


def changeset_full(old: DataFrame, new: DataFrame, keys: list[str],
                   payload: list[str]) -> DataFrame:
    """Debezium-style full-image CDC stream between two snapshots:
    key columns + ``op`` ('insert'|'update'|'delete') + ``before_<c>``
    / ``after_<c>`` for every payload column (NULL on the absent
    side). Carries enough state to maintain any distributive
    aggregate downstream — `diff.changeset` (new-image only) cannot
    subtract a deleted/overwritten row's old contribution."""
    d = snapshot_diff(old, new, keys, payload).select(
        *keys,
        F.when(F.col("status") == "added", "insert")
        .when(F.col("status") == "removed", "delete")
        .otherwise("update").alias("op"))
    o = old.select(*keys, *[F.col(c).alias(f"before_{c}")
                            for c in payload])
    n = new.select(*keys, *[F.col(c).alias(f"after_{c}")
                            for c in payload])
    return (d.join(o, keys, "left").join(n, keys, "left")
            .select(*keys, "op",
                    *[f"before_{c}" for c in payload],
                    *[f"after_{c}" for c in payload]))


def apply_agg_delta(base_agg: DataFrame, changes: DataFrame,
                    group_col: str, value_col: str,
                    count_alias: str = "n",
                    sum_alias: str = "total") -> DataFrame:
    """Fold a `changeset_full` stream into a (group, n, total) view.

    ``base_agg`` columns: (group_col, count_alias, sum_alias) — the
    materialized view being maintained. ``changes`` must carry
    ``before_{group_col}/before_{value_col}`` and the ``after_`` twins.
    Returns the refreshed view; groups whose maintained count drops
    to 0 are removed (and a negative count would mean the stream and
    the view disagree — surfaced, not hidden, by keeping the row
    with its negative count rather than silently clamping)."""
    bg, bv = f"before_{group_col}", f"before_{value_col}"
    ag, av = f"after_{group_col}", f"after_{value_col}"
    # every change row -> up to two signed contributions
    minus = (changes.where(F.col(bg).isNotNull())
             .select(F.col(bg).alias(group_col),
                     F.lit(-1).cast("long").alias("_dn"),
                     (-F.col(bv)).cast("long").alias("_dv")))
    plus = (changes.where(F.col(ag).isNotNull())
            .select(F.col(ag).alias(group_col),
                    F.lit(1).cast("long").alias("_dn"),
                    F.col(av).cast("long").alias("_dv")))
    delta = (minus.unionByName(plus)
             .groupBy(group_col)
             .agg(F.sum("_dn").cast("long").alias("_dn"),
                  F.sum("_dv").cast("long").alias("_dv")))
    merged = (base_agg.join(delta, group_col, "full_outer")
              .select(group_col,
                      (F.coalesce(F.col(count_alias), F.lit(0))
                       + F.coalesce(F.col("_dn"), F.lit(0)))
                      .cast("long").alias(count_alias),
                      (F.coalesce(F.col(sum_alias), F.lit(0))
                       + F.coalesce(F.col("_dv"), F.lit(0)))
                      .cast("long").alias(sum_alias)))
    return merged.where(F.col(count_alias) != 0)
