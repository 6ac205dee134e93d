"""Fan-out router: rule table -> per-sink routed rows.

Reference semantics: each service's lines go to the Kafka topic named
after the service (pkg/api/server.go:120-131, topic creation
pkg/utils/kafka.go:30-56); lines matching no sink are warned and
dropped (server.go:115-118) — we make that explicit with a counted
`_unrouted` sink (SURVEY T5).

Physical strategy: ONE pass over the fact table. Each rule compiles
to a boolean Column; a row's matched sinks become an array<struct>
that is exploded. This evaluates every rule inside a single
whole-stage-codegen stage over a single scan — k independent
filtered writes would re-scan (or force a persist of) the 100 TB
input k times. Explode multiplies only the matched rows (fan-out is
the semantic output size, unavoidable), and per-rule truncation is
applied inside the same projection.

The rule count is small (topics-per-cluster scale, 10s-100s); the
generated expression tree stays well within codegen limits. If rules
ever number in the thousands, switch to a broadcast join against the
rule table with an rlike join condition — same semantics, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logging_spark.operators.rules import Rule

UNROUTED = "_unrouted"


def route(
    df: DataFrame,
    rules: list[Rule],
    text_col: str = "text",
    role_col: str = "role",
    include_unrouted: bool = True,
) -> DataFrame:
    """Return df with one row per (input row x matched sink), columns
    of df plus `sink_name`, with `text` per-rule truncated. Unmatched
    rows route to `_unrouted` with text untouched."""
    matches: list[Column] = []
    for rule in rules:
        matches.append(
            F.when(
                rule.predicate(text_col, role_col),
                F.struct(
                    F.lit(rule.sink_name).alias("sink_name"),
                    rule.truncate(text_col).alias("routed_text"),
                ),
            )
        )
    matched = F.array_compact(F.array(*matches))
    if include_unrouted:
        matched = F.when(F.size(matched) > 0, matched).otherwise(
            F.array(
                F.struct(
                    F.lit(UNROUTED).alias("sink_name"),
                    F.col(text_col).alias("routed_text"),
                )
            )
        )
    out = df.withColumn("_m", F.explode(matched))
    return (
        out.withColumn("sink_name", F.col("_m.sink_name"))
        .withColumn(text_col, F.col("_m.routed_text"))
        .drop("_m")
    )
