"""Per-sink aggregates (SURVEY A1-A4).

Reference accounting: per-(service,pod) record gathering
(pkg/api/slack.go:38-64) and implicit per-topic accumulation
(pkg/api/server.go:131). Formalized as exact per-sink counts,
exact distinct conversations, and turns-per-role rollups.

Exactness is mandated (BASELINE.json north_rule): countDistinct,
not approx_count_distinct, for the checked counts. Spark executes
count(distinct) via expand + two-phase hash aggregation — partial
aggregation map-side, so the shuffle carries (sink, conv_id) pairs
already combined, not raw rows. `approx_distinct_conv` is provided
separately for monitoring dashboards where a 2% error is fine and
the expand is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_sink_counts(routed: DataFrame) -> DataFrame:
    return routed.groupBy("sink_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("conv_id").alias("n_distinct_conv"),
    )


def per_sink_role_rollup(routed: DataFrame) -> DataFrame:
    return routed.groupBy("sink_name", "role").agg(
        F.count(F.lit(1)).alias("n_turns")
    )


def approx_distinct_conv(routed: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Monitoring-only HLL distinct (NOT for the correctness gate)."""
    return routed.groupBy("sink_name").agg(
        F.approx_count_distinct("conv_id", rsd).alias("approx_distinct_conv")
    )


def assemble_conversations(turns: DataFrame,
                           key: str = "conv_id",
                           order_col: str = "turn_idx",
                           text_col: str = "text",
                           sep: str = "\n") -> DataFrame:
    """Assemble each conversation's full text in turn order — the
    document-building step that turns the turns table into trainable
    transcripts. collect_list + array_sort keeps it a single hash
    aggregation (one shuffle, map-side combined); per-group memory is
    one conversation's turns, the same bound every per-conv operator
    in this pipeline lives with (hot conversations are why skew.py
    exists)."""
    assembled = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, text_col))),
            lambda s: s.getField(text_col),
        ),
        sep,
    )
    return turns.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_turns"),
        assembled.alias("conversation_text"),
    )


def resume_points(checkpointish: DataFrame,
                  keys: list[str] = ("conv_id",),
                  offset_col: str = "turn_idx") -> DataFrame:
    """Max-offset resume point per stream (A3; server.go:68-76)."""
    return checkpointish.groupBy(*keys).agg(F.max(offset_col).alias("max_offset"))
