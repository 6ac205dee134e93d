"""Property-style invariants (SURVEY §5.5): pipeline outputs must not
depend on input row order or partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark import synth
from logging_spark.operators.aggregate import per_sink_counts
from logging_spark.operators.dedup import dedup_latest_wins
from logging_spark.operators.enrich import enrich
from logging_spark.operators.route import route
from logging_spark.operators.rules import load_rules


def _routed(spark, turns):
    lookup = synth.lookup(spark, n_conversations=50)
    rules = load_rules(synth.rules(spark))
    return route(enrich(dedup_latest_wins(turns), lookup), rules)


def test_outputs_invariant_under_input_order_and_partitioning(spark):
    turns = synth.transcripts(spark, n_conversations=50, turns_per_conv=20,
                              hot_conversations=1, hot_factor=10)
    variants = [
        turns,
        turns.orderBy(F.col("ts").desc(), F.col("conv_id").desc()),
        turns.repartition(3),
        turns.coalesce(1),
    ]
    results = []
    for v in variants:
        routed = _routed(spark, v)
        counts = sorted(map(tuple, per_sink_counts(routed).collect()))
        rows = sorted(map(tuple,
                          routed.select("sink_name", "conv_id", "turn_idx",
                                        "text").collect()))
        results.append((counts, rows))
    for other in results[1:]:
        assert other == results[0]
