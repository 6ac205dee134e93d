"""Sequential pattern mining (PrefixSpan-lite): support counting of
gap-allowed length-2/3 subsequences of per-user event streams.

"View then purchase then error, in that order, with anything in
between" is a SUBSEQUENCE pattern — transition matrices (adjacent
pairs) and funnels (one fixed pattern) don't answer it; classic
PrefixSpan does, but its projected-database recursion is a poor fit
for a shuffle engine. This operator exploits a collapse that covers
lengths 2 and 3 exactly:

- a user supports (a, b) iff min_pos(a) < max_pos(b);
- a user supports (a, b, c) iff some position of b lies strictly
  between min_pos(a) and max_pos(c).

So the per-user state is ONE row per (user, item): (min_pos,
max_pos, sorted positions array) — the raw stream is scanned once,
and support counting is an alphabet-bounded self-join of that
collapsed table (<= m rows per user with an m-item alphabet; the
`max_items` cap keeps m small the way pattern miners always restrict
the alphabet). No projected databases, no per-pattern passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def subsequence_support(df: DataFrame, user_col: str, order_col: str,
                        item_col: str, tiebreak_col: str,
                        max_items: int = 8,
                        min_support: int = 2) -> DataFrame:
    """Support (distinct users) of every gap-allowed length-2 and
    length-3 item subsequence over the `max_items` globally most
    frequent items. Output: pattern ('a>b' / 'a>b>c'), length,
    support — filtered to support >= min_support.

    Ordering inside a user is (order_col, tiebreak_col) — the
    tiebreak makes positions deterministic under duplicate
    timestamps. Repeated items are handled exactly: (a, a) requires
    two occurrences, (a, b, a) a b strictly inside a's span.
    """
    # alphabet cap: the item-count table is collapsed (one row per
    # item), so the unpartitioned rank window is bounded by the
    # item-domain size, not the row count
    counts = df.groupBy(F.col(item_col).alias("_it")).agg(
        F.count(F.lit(1)).alias("_n"))
    wtop = Window.orderBy(F.col("_n").desc(), F.col("_it").asc())
    top = (counts.withColumn("_rk", F.row_number().over(wtop))
           .where(F.col("_rk") <= max_items).select("_it"))
    ev = (df.join(F.broadcast(top),
                  F.col(item_col) == F.col("_it"))
          .select(F.col(user_col).alias("_u"),
                  F.col(item_col).alias("_i"),
                  F.col(order_col).alias("_o"),
                  F.col(tiebreak_col).alias("_tb")))
    wp = Window.partitionBy("_u").orderBy("_o", "_tb")
    pos = ev.select("_u", "_i", F.row_number().over(wp).alias("_p"))
    st = (pos.groupBy("_u", "_i")
          .agg(F.min("_p").alias("_lo"), F.max("_p").alias("_hi"),
               F.sort_array(F.collect_list("_p")).alias("_ps")))
    st = st.localCheckpoint()  # feeds three self-join sides
    a = st.select(F.col("_u"), F.col("_i").alias("_ia"),
                  F.col("_lo").alias("_loa"))
    b = st.select(F.col("_u"), F.col("_i").alias("_ib"),
                  F.col("_hi").alias("_hib"), F.col("_ps").alias("_psb"))
    c = st.select(F.col("_u"), F.col("_i").alias("_ic"),
                  F.col("_hi").alias("_hic"))
    l2 = (a.join(b, "_u").where(F.col("_loa") < F.col("_hib"))
          .groupBy(F.concat_ws(">", "_ia", "_ib").alias("pattern"))
          .agg(F.count(F.lit(1)).cast("long").alias("support"))
          .withColumn("length", F.lit(2).cast("int")))
    lo_a = F.col("_loa")
    hi_c = F.col("_hic")
    l3 = (a.join(b, "_u").join(c, "_u")
          .where(F.exists(
              "_psb", lambda x: (x > lo_a) & (x < hi_c)))
          .groupBy(F.concat_ws(">", "_ia", "_ib", "_ic")
                   .alias("pattern"))
          .agg(F.count(F.lit(1)).cast("long").alias("support"))
          .withColumn("length", F.lit(3).cast("int")))
    return (l2.unionByName(l3)
            .where(F.col("support") >= min_support)
            .select("pattern", "length", "support"))
