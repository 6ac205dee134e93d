"""Approximate-aggregate sketches (built-in HLL++ / quantile digest):
accuracy guards against the exact aggregates. At 10^12 turns the exact
distinct/percentile pass is a real shuffle; the sketches are the
constant-memory, map-side-combinable alternative dashboards use — these
tests pin that their error stays inside the advertised bounds on our
fixture distributions (skewed conversations, heavy-tailed prices)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_hll_distinct_within_bound(spark):
    t = spark.read.parquet(f"{SF}/events.parquet")
    exact = t.select(F.countDistinct("user_id")).first()[0]
    # rsd=0.02 -> ~2% standard error; assert 3 sigma
    approx = t.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) <= max(0.06 * exact, 1)


def test_approx_percentile_within_rank_error(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    exact_median = o.select(
        F.expr("percentile(o_totalprice, 0.5D)")).first()[0]
    approx_median = o.select(
        F.expr("approx_percentile(o_totalprice, 0.5D, 1000)")).first()[0]
    # accuracy=1000 -> rank error <= n/1000; translate to a rank check:
    # the approx median's true rank must be within n/1000 of n/2
    rank = o.where(F.col("o_totalprice") <= approx_median).count()
    assert abs(rank - n / 2) <= n / 1000 + 1
    # and the values themselves are close on this distribution
    assert abs(approx_median - exact_median) / exact_median < 0.05
