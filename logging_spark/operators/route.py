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


def route_join(
    df: DataFrame,
    rules_df: DataFrame,
    text_col: str = "text",
    role_col: str = "role",
    include_unrouted: bool = True,
) -> DataFrame:
    """Router for rule tables too large to compile into one expression
    tree (thousands+ of rules): broadcast the rule table and join on
    the match condition. Same output contract as `route`.

    Tradeoff vs `route`: the rlike pattern is a join-side column, so
    the regex compiles per (row, rule) probe instead of once per rule
    at plan time — use `route` for topic-scale rule counts (10s-100s)
    and this only when the rule table genuinely outgrows codegen. The
    join is a broadcast nested-loop join (non-equi condition); rows
    matching nothing fall out of a broadcast anti-join to `_unrouted`,
    exactly mirroring route()'s include_unrouted semantics."""
    r = rules_df.select(
        F.col("sink_name").alias("_sink"),
        F.coalesce(F.col("expr"), F.lit("*")).alias("_expr"),
        F.coalesce(F.col("max_length"), F.lit(10**9)).alias("_maxlen"),
        F.col("role_filter").alias("_role_filter"),
        F.col("enabled").alias("_enabled"),
    ).where(F.col("_enabled"))
    cond = (
        ((F.col("_expr") == "*") | F.regexp_like(F.col(text_col), F.col("_expr")))
        & (F.col("_role_filter").isNull() | (F.col(role_col) == F.col("_role_filter")))
    )
    matched = (
        df.join(F.broadcast(r), cond, "inner")
        .withColumn("sink_name", F.col("_sink"))
        .withColumn(text_col, F.expr(f"substring({text_col}, 1, _maxlen)"))
        .drop("_sink", "_expr", "_maxlen", "_role_filter", "_enabled")
    )
    if not include_unrouted:
        return matched
    unmatched = (
        df.join(F.broadcast(r), cond, "left_anti")
        .withColumn("sink_name", F.lit(UNROUTED))
    )
    return matched.unionByName(unmatched)


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
