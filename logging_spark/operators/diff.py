"""Snapshot diff (CDC): keyed added/removed/changed between two
table versions.

The reference's reconcile loop (checkpoint skip-done) answers "which
buckets are new"; a data platform also needs the row-level answer:
given yesterday's snapshot and today's, which keys appeared,
disappeared, or changed? This is the standard CDC diff:

- canonicalize each row to an md5 over its compared columns
  (unit-separator-joined, null-safe),
- full outer join the two snapshots on the key,
- classify by null-ness and hash inequality.

Scale: one shuffle per side on the key (the full outer join); the
hash collapses arbitrarily wide rows to 32 bytes BEFORE the shuffle,
so the exchange carries (key, hash), never the payload. At 100 TB
both snapshots partition-prune to the compared date and the join is
a plain sort-merge on the snapshot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = chr(31)  # unit separator: can't occur in numeric renderings


def row_hash(df: DataFrame, cols: list[str]) -> DataFrame:
    """md5 over the canonical string of ``cols``.

    Each column renders as ``len(value):value`` and NULL as a bare
    ``\\x00`` marker, so (a) NULL and '' hash differently and (b) a
    string value CONTAINING the separator cannot alias across column
    boundaries (the length prefix makes the rendering a prefix code) —
    round-3 ADVICE."""
    def canon(c: str):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("\x00")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s))

    parts = [canon(c) for c in cols]
    return df.withColumn("_h", F.md5(F.concat_ws(_SEP, *parts)))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str],
    keep_unchanged: bool = False,
    null_safe_keys: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots.

    Output: key columns + ``status`` ('added'|'removed'|'changed'
    [|'unchanged']) + ``old_hash``/``new_hash`` ('' when absent).

    Keys are compared with plain equality by default (snapshot keys
    are primary keys — non-null by contract), which lets the join
    reuse any existing hash partitioning on the key; ``null_safe_keys``
    switches to ``<=>`` at the cost of a re-shuffle on the coalesced
    key (Spark plans null-safe joins on wrapped keys).
    """
    o = row_hash(old, compare).select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        F.col("_h").alias("_oh"))
    n = row_hash(new, compare).select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        F.col("_h").alias("_nh"))
    cond = None
    for k in keys:
        a, b = F.col(f"_ok_{k}"), F.col(f"_nk_{k}")
        c = a.eqNullSafe(b) if null_safe_keys else (a == b)
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    out = j.select(
        *[F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
          for k in keys],
        status.alias("status"),
        F.coalesce(F.col("_oh"), F.lit("")).alias("old_hash"),
        F.coalesce(F.col("_nh"), F.lit("")).alias("new_hash"),
    )
    return out if keep_unchanged else out.where(F.col("status") != "unchanged")


def changeset(old: DataFrame, new: DataFrame, keys: list[str],
              payload: list[str]) -> DataFrame:
    """Applyable CDC stream between two snapshots: key columns +
    ``op`` ('upsert'|'delete') + the NEW payload for upserts (NULL
    for deletes). `snapshot_diff` answers "what changed" with hashes;
    this carries enough to REPLAY the change — `apply_changes(old,
    changeset(old, new)) == new`, row for row (the round-trip
    identity is a contract query, not just a doc claim).

    added/changed both become 'upsert' (idempotent to apply);
    unchanged rows are absent, so the stream size is proportional to
    the churn, not the table."""
    d = snapshot_diff(old, new, keys, payload)
    ups = (d.where(F.col("status").isin("added", "changed"))
           .select(*keys)
           .join(new.select(*keys, *payload), keys)
           .select(*keys, F.lit("upsert").alias("op"), *payload))
    dels = (d.where(F.col("status") == "removed")
            .select(*keys, F.lit("delete").alias("op"),
                    *[F.lit(None).cast(dict(new.dtypes)[c]).alias(c)
                      for c in payload]))
    return ups.unionByName(dels)


def apply_changes(base: DataFrame, changes: DataFrame, keys: list[str],
                  payload: list[str]) -> DataFrame:
    """Replay a `changeset` onto a base snapshot: every keyed row in
    the change stream replaces (or deletes) its key in the base;
    everything else survives untouched. One anti-join on the key +
    one union — the relational MERGE, engine-agnostic.

    Scale: the anti-join shuffles (key) only — base payload stays
    put per-partition when base is bucketed by the key; the change
    stream is churn-sized, usually broadcastable."""
    survivors = (base.select(*keys, *payload)
                 .join(changes.select(*keys), keys, "left_anti"))
    ups = (changes.where(F.col("op") == "upsert")
           .select(*keys, *payload))
    return survivors.unionByName(ups)


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level schema drift between two snapshots: one row per
    added / removed / type_changed / nullability_changed column
    (unchanged columns are omitted). Pure METADATA work — schemas
    live on the driver; no data is scanned, so this runs in
    milliseconds against 100 TB tables and belongs at the front of
    any CDC/apply pipeline (diff the shape before diffing rows).
    simpleString() comparison covers nested struct/array/map types."""
    of = {f.name: f for f in old.schema.fields}
    nf = {f.name: f for f in new.schema.fields}
    rows = []
    for name in sorted(set(of) | set(nf)):
        o, n = of.get(name), nf.get(name)
        if o is None:
            rows.append((name, "added", None, n.dataType.simpleString()))
        elif n is None:
            rows.append((name, "removed", o.dataType.simpleString(),
                         None))
        elif o.dataType != n.dataType:
            rows.append((name, "type_changed",
                         o.dataType.simpleString(),
                         n.dataType.simpleString()))
        elif o.nullable != n.nullable:
            rows.append((name, "nullability_changed",
                         o.dataType.simpleString(),
                         n.dataType.simpleString()))
    return old.sparkSession.createDataFrame(
        rows, "column string, status string, old_type string, "
              "new_type string")
