"""Pre-execution planning audits: join-size prediction and shard-
assignment stability.

Before launching a 100-TB join you want to know, from two cheap
per-key count passes, (a) exactly how many rows the join will emit
and (b) whether one hot key will own the output — `join_cardinality`
answers both without executing the join (the predicted size is exact
for inner equi-joins: sum over shared keys of count_left*count_right).

`rendezvous_stability` audits shard-assignment churn when a cluster
grows from n to n+m shards: highest-random-weight (rendezvous)
hashing moves ~1/(n+m) of the keys while mod-hashing moves ~n/(n+m)
— the audit computes BOTH moved fractions exactly over the real key
population, the number you need before resizing a stateful shuffle
service or a sharded sink.

Scale shape: join_cardinality touches each input once (two groupBys
on the join key, then a key-level equi-join over the COLLAPSED count
tables — the fact rows never shuffle); rendezvous assignment is a
bounded explode over the shard list (n+m rows per DISTINCT key) +
one max_by per key per layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_cardinality(left: DataFrame, right: DataFrame,
                     key: str) -> DataFrame:
    """One-row exact prediction of `left JOIN right USING (key)`.

    Output: per-side key counts, predicted output rows, the hottest
    key's contribution and its share (ppm) — the skew headline — plus
    the count of keys whose contribution exceeds 1/100 of the total
    (how many keys you would salt).
    """
    lc = left.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("_cl"))
    rc = right.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("_cr"))
    per_key = lc.join(rc, key).select(
        F.col(key), (F.col("_cl") * F.col("_cr")).alias("_rows"))
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_joined"),
        F.sum("_rows").cast("long").alias("predicted_rows"),
        F.max("_rows").cast("long").alias("max_key_rows"),
    ).select(
        "n_keys_joined", "predicted_rows", "max_key_rows",
        F.expr("(max_key_rows * 1000000) DIV predicted_rows")
        .cast("long").alias("max_key_share_ppm"))


def _hrw_assign(keys: DataFrame, key: str, n_shards: int,
                out_col: str) -> DataFrame:
    """Rendezvous assignment: shard = argmax over s of
    md5(key || ':' || s). The weight is the first 15 hex chars of the
    digest as a BIGINT (60 bits — the repo-wide portable-hash cap);
    max_by's (weight, shard) struct breaks ties deterministically
    (md5 ties are astronomically unlikely but the plan must not
    depend on luck)."""
    shard = F.explode(F.sequence(
        F.lit(0), F.lit(n_shards - 1))).alias("_s")
    w = F.expr(
        "CAST(conv(substring(md5(concat(CAST(_k AS STRING), ':', "
        "CAST(_s AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    return (keys.select(F.col(key).alias("_k"), shard)
            .select("_k", "_s", w.alias("_w"))
            .groupBy("_k")
            .agg(F.max(F.struct("_w", "_s")).alias("_m"))
            .select(F.col("_k").alias(key),
                    F.col("_m._s").cast("int").alias(out_col)))


def rendezvous_stability(df: DataFrame, key: str, n_old: int,
                         n_new: int) -> DataFrame:
    """Exact moved-key fractions when resharding n_old -> n_new, for
    rendezvous hashing vs mod-hashing, over the input's DISTINCT
    keys. One row: n_keys, moved counts and ppm for both schemes.

    Rendezvous's guarantee is visible in the output: a key moves only
    if one of the NEW shards wins its rendezvous, so
    moved_hrw_ppm ~= (n_new - n_old)/n_new * 1e6, while mod-hashing
    rehashes almost everything (~(1 - 1/n_new) when n_old, n_new are
    coprime-ish).
    """
    keys = df.select(F.col(key)).distinct()
    keys = keys.localCheckpoint()  # feeds four assignment scans
    a_old = _hrw_assign(keys, key, n_old, "s_old")
    a_new = _hrw_assign(keys, key, n_new, "s_new")
    hrw = a_old.join(a_new, key).select(
        (F.col("s_old") != F.col("s_new")).cast("long").alias("_mv"))
    mod_mv = keys.select(
        (F.expr(f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, "
                f"15), 16, 10) AS BIGINT)") % n_old !=
         F.expr(f"CAST(conv(substring(md5(CAST({key} AS STRING)), 1, "
                f"15), 16, 10) AS BIGINT)") % n_new)
        .cast("long").alias("_mv"))
    h = hrw.agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum("_mv").cast("long").alias("moved_hrw"))
    m = mod_mv.agg(F.sum("_mv").cast("long").alias("moved_mod"))
    return h.crossJoin(m).select(
        "n_keys", "moved_hrw", "moved_mod",
        F.expr("(moved_hrw * 1000000) DIV n_keys").cast("long")
        .alias("moved_hrw_ppm"),
        F.expr("(moved_mod * 1000000) DIV n_keys").cast("long")
        .alias("moved_mod_ppm"))
