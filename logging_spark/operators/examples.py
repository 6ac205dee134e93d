"""Training-example assembly: trailing-context windows per turn.

The last mile of a transcript pipeline is turning cleaned
conversations into (context, target) training examples — for every
assistant turn, the k turns immediately before it rendered into one
prompt string. The reference stops at routed log records
(pkg/service/service.go:118-150 emits per-line records); example
assembly is the beyond-reference training-data verb built on the
same turns.

Scale shape: ONE window sort per conversation (the same
(conv, turn_idx) ordering every per-conv op in this repo shares), a
bounded ROWS frame (never unbounded-preceding over text — context is
k turns, so window state is O(k) per key), and the context render is
collect_list of (turn_idx, rendered) structs re-sorted in place:
frame-order of collect_list is an implementation detail under
retries, array_sort pins it. No shuffle beyond the window's hash
exchange; text crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def context_examples(
    df: DataFrame,
    key: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
    k: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """(key, order_col, context, target): one example per turn whose
    role == target_role, with `context` the up-to-k preceding turns
    rendered "role: text" joined by `sep` (empty string when the
    target opens the conversation)."""
    rendered = F.concat_ws(": ", F.col(role_col), F.col(text_col))
    w = (Window.partitionBy(key).orderBy(order_col)
         .rowsBetween(-k, -1))
    ctx = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col(order_col).alias("o"),
                         rendered.alias("r"))).over(w)),
            lambda s: s.getField("r")),
        sep)
    return (df.withColumn("context", ctx)
            .where(F.col(role_col) == target_role)
            .select(key, order_col, "context",
                    F.col(text_col).alias("target")))
