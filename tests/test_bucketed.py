"""Bucketed-table co-located join: the prepaid-shuffle strategy.

The whole point of bucketing is in the PLAN: both sides of a join on
the bucket key scan pre-clustered files and the join runs with no
Exchange at all. These tests pin that property, because losing it
(schema drift, bucket-count mismatch, a config regression like
spark.sql.sources.bucketing.enabled=false) silently reintroduces two
full shuffles on the hottest join of the pipeline.
"""

import shutil

from pyspark.sql import functions as F

from logging_spark.sources.catalog import write_bucketed


def _turns(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("conv-"), (F.col("id") % 97).cast("string"))
         .alias("conv_id"),
        (F.col("id") % 40).cast("int").alias("turn_idx"),
        F.md5(F.col("id").cast("string")).alias("text"))


def test_bucketed_self_join_has_no_exchange(spark):
    for t in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a location left behind by a dead session blocks CREATE
        loc = f"{spark.conf.get('spark.sql.warehouse.dir')}/{t}"
        shutil.rmtree(loc.removeprefix("file:"), ignore_errors=True)
    write_bucketed(_turns(spark), "bt_a", ["conv_id"], n_buckets=8)
    write_bucketed(_turns(spark), "bt_b", ["conv_id"], n_buckets=8)
    a, b = spark.table("bt_a"), spark.table("bt_b")
    # at fixture size the planner would rather broadcast (and then
    # skips the bucketed scan entirely); force the shuffle-join tier —
    # the one bucketing exists to serve — to expose the co-location
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b.withColumnRenamed("text", "text_b")
                    .withColumnRenamed("turn_idx", "ti_b"), "conv_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan, plan[:2000]
        assert j.count() > 0

        # aggregation keyed on the bucket column also rides the
        # clustering: no exchange before the final agg
        agg = a.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan[:2000]
        assert agg.count() == 97
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_needs_exchanges(spark):
    # control: the identical join over plain frames shuffles both sides
    a, b = _turns(spark), _turns(spark).withColumnRenamed("text", "text_b") \
                                       .withColumnRenamed("turn_idx", "ti_b")
    plan = a.join(b, "conv_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" in plan
