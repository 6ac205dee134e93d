"""Skew handling: hot-key detection and salted repartition actually
spread a hot conversation across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from logging_spark import synth
from logging_spark.operators.skew import hot_keys, salt_col, salted_repartition


def _partition_sizes(df):
    return [len(p) for p in df.rdd.glom().collect()]


def test_hot_keys_finds_heavy_hitters(spark):
    t = synth.transcripts(spark, n_conversations=100, turns_per_conv=20,
                          hot_conversations=2, hot_factor=50)
    hot = hot_keys(t, threshold=500)
    found = {r["conv_id"] for r in hot.collect()}
    # the generator makes the LAST `hot_conversations` ids hot
    assert found == {"conv-000098", "conv-000099"}


def test_salted_repartition_spreads_hot_conversation(spark):
    t = synth.transcripts(spark, n_conversations=50, turns_per_conv=20,
                          hot_conversations=1, hot_factor=100)
    n_parts = 16
    hot = hot_keys(t, threshold=500)

    unsalted = t.repartition(n_parts, "conv_id")
    salted = salted_repartition(t, n_parts, salt_buckets=8, hot=hot)

    total = t.count()
    assert salted.count() == total  # no rows lost or duplicated

    max_unsalted = max(_partition_sizes(unsalted))
    max_salted = max(_partition_sizes(salted))
    # hot conv (~2000 of ~2980 rows) pins one partition when unsalted;
    # salting must cut the max partition substantially
    assert max_unsalted > total / 2
    assert max_salted < max_unsalted / 2


def test_salt_is_deterministic(spark):
    t = synth.transcripts(spark, n_conversations=20, turns_per_conv=10)
    a = t.withColumn("s", salt_col(8)).select("conv_id", "turn_idx", "s")
    b = t.withColumn("s", salt_col(8)).select("conv_id", "turn_idx", "s")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
