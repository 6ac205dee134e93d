"""Gap-based sessionization over an event stream.

The reference has no time windows (collection is a continuous tail —
SURVEY §2.5/§2.6); sessionization is the batch analog of its
per-stream continuity bookkeeping (offset runs per (service,pod),
pkg/apis/yamecloud/v1/slack_type.go:28-31) and a staple of log
analytics, so we provide it as a first-class operator.

Plan shape: ONE shuffle on the session key; both window functions
(lag, running sum) share the same (partitionBy key, orderBy ts)
window spec, so Catalyst evaluates them in a single Window physical
node over a single sort — adding the second window costs nothing.
Epoch math uses unix_timestamp (second-floored) so results are
engine-portable for the oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    gap_seconds: int = 1800,
    out_col: str = "session_id",
) -> DataFrame:
    """Append `session_id` (1-based per key): a new session starts when
    the gap to the previous event exceeds gap_seconds."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | ((epoch - prev) > gap_seconds), 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(running))
