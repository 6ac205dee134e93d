"""Record linkage: blocked candidate pairs + Fellegi-Sunter-lite
agreement scoring.

The classic entity-resolution pipeline (Fellegi & Sunter 1969, and
every dedupe system since): (1) BLOCK — only records sharing a cheap
key ever meet, so the quadratic comparison space collapses to
within-block pairs; (2) SCORE — each field comparison contributes a
log-odds-ish agreement weight (positive if it agrees, negative if it
disagrees); (3) CLASSIFY — two thresholds split pairs into
match / possible (clerical review) / non-match.

This implementation keeps the weights INTEGER (the repo's
engine-portable fixed-point discipline — real FS weights are
log(m/u) floats; scale and round them upstream), so the whole
pipeline is oracle-checkable.

Scale story (100 TB): the only shuffle is the block-key equi-join;
`max_block` drops degenerate blocks (the NULL-city block, the
"smith" block) BEFORE the quadratic expansion, exactly like
textdedup's `max_doc_freq` / similarity's `max_bucket` caps — at
10^9 records the cap is what keeps the pair count linear-ish. Use
`functions.text.soundex_code` (or any normalizer) to build fuzzier
block keys upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MatchRule = tuple[Column, int, int]  # (agree cond over a.*/b.*, w+, w-)


def blocked_pairs(df: DataFrame, id_col: str, block_col: str | Column,
                  max_block: int | None = None) -> DataFrame:
    """Within-block candidate pairs as two aliased sides `a` and `b`
    (every original column reachable as a.<col> / b.<col>), one pair
    per unordered combination (a.id < b.id). Blocks larger than
    `max_block` are dropped whole — cap-before-expand."""
    keyed = df.withColumn("_blk", F.col(block_col)
                          if isinstance(block_col, str) else block_col)
    if max_block is not None:
        w = Window.partitionBy("_blk")
        keyed = (keyed.withColumn("_bn", F.count(F.lit(1)).over(w))
                 .where(F.col("_bn") <= max_block).drop("_bn"))
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(b, (F.col("a._blk") == F.col("b._blk"))
                  & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))


def match_scores(pairs: DataFrame, id_col: str, rules: list[MatchRule],
                 t_match: int, t_possible: int) -> DataFrame:
    """(id_a, id_b, score, match_class) for each candidate pair.
    score = sum over rules of (w_agree if cond else w_disagree);
    class = match (>= t_match) / possible (>= t_possible) /
    non_match. A NULL field on either side counts as disagreement
    (cond is null -> w_disagree), the conservative FS convention."""
    score = None
    for cond, w_plus, w_minus in rules:
        term = F.when(cond, F.lit(w_plus)).otherwise(F.lit(w_minus))
        score = term if score is None else score + term
    return (pairs.select(F.col(f"a.{id_col}").alias("id_a"),
                         F.col(f"b.{id_col}").alias("id_b"),
                         score.cast("int").alias("score"))
            .withColumn("match_class",
                        F.when(F.col("score") >= t_match, "match")
                        .when(F.col("score") >= t_possible, "possible")
                        .otherwise("non_match")))


def golden_records(df: DataFrame, id_col: str, matched: DataFrame,
                   rules: dict[str, str]) -> DataFrame:
    """Survivorship: collapse each matched-entity cluster to ONE
    canonical ("golden") record, completing the block -> score ->
    classify -> CLUSTER -> MERGE entity-resolution pipeline.

    ``matched`` is a pair table (id_a, id_b) of accepted matches (the
    `match` class from match_scores); clusters come from
    cluster.duplicate_clusters (connected components, min-id
    canonical). Records in no match pair survive unchanged as their
    own cluster. ``rules`` maps column -> survivorship rule:

    - 'max' / 'min': extreme value (freshest timestamp, lowest price);
    - 'longest': longest string, ties broken by the larger string —
      one struct-max, no window (the repo's windowless-argmax trick);
    - 'mode': most frequent value, ties to the smaller value — the
      one rule needing its own (cluster, value) count pass, joined
      back per mode column.

    Output: cluster_id (min member id), n_members, and one survivor
    value per ruled column. Everything is groupBy aggregates on the
    cluster key; the cluster map is a pair-graph-sized broadcast
    join, never a corpus shuffle by anything but the cluster id.
    """
    from logging_spark.operators.cluster import duplicate_clusters

    clusters = duplicate_clusters(matched, "id_a", "id_b")
    base = (df.join(F.broadcast(clusters.withColumnRenamed(
                "doc_id", id_col)), id_col, "left")
            .withColumn("cluster_id",
                        F.coalesce("canonical_id", F.col(id_col))))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    mode_cols = []
    for col, rule in rules.items():
        if rule == "max":
            aggs.append(F.max(col).alias(col))
        elif rule == "min":
            aggs.append(F.min(col).alias(col))
        elif rule == "longest":
            aggs.append(F.max(F.struct(F.length(col).alias("l"),
                                       F.col(col).alias("v")))
                        .getField("v").alias(col))
        elif rule == "mode":
            mode_cols.append(col)
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")
    out = base.groupBy("cluster_id").agg(*aggs)
    for col in mode_cols:
        # argmax of (count, -tiebreak) per cluster without a window:
        # max(struct(n, v)) picks highest count, ties to the LARGER
        # value — flip via min over (-n, v) to keep ties deterministic
        # at the smaller value
        cnt = (base.groupBy("cluster_id", col)
               .agg(F.count(F.lit(1)).alias("_n")))
        pick = (cnt.groupBy("cluster_id")
                .agg(F.min(F.struct((-F.col("_n")).alias("nn"),
                                    F.col(col).alias("v")))
                     .getField("v").alias(col)))
        out = out.join(pick, "cluster_id")
    return out
