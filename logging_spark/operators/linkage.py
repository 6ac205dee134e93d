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
