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


def test_countmin_one_sided_and_mergeable(spark):
    from logging_spark.operators.sketch import (countmin_estimates,
                                                countmin_sketch)
    rows = [(k,) for k in
            ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 1 + ["e"] * 9]
    df = spark.createDataFrame(rows, "k string")
    est = {r.k: (r.n_exact, r.est)
           for r in countmin_estimates(df, "k", depth=4,
                                       width=64).collect()}
    assert set(est) == {"a", "b", "c", "d", "e"}
    for k, (exact, e) in est.items():
        assert e >= exact, k  # one-sided guarantee
    # mergeability: sketch(part1 UNION part2) == elementwise-summed
    # sketches — union + re-groupBy is the merge
    from pyspark.sql import functions as F
    p1 = df.where(F.col("k").isin("a", "b"))
    p2 = df.where(~F.col("k").isin("a", "b"))
    s_all = countmin_sketch(df, "k", depth=2, width=32)
    merged = (countmin_sketch(p1, "k", depth=2, width=32)
              .unionAll(countmin_sketch(p2, "k", depth=2, width=32))
              .groupBy("r", "bucket").agg(F.sum("c").cast("long").alias("c")))
    assert sorted(map(tuple, s_all.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_kmv_merge_identity_and_accuracy(spark):
    """KMV: merged per-shard sketches == direct global sketch (exact
    identity), and the estimate lands within 3/sqrt(k) of truth on
    a 5000-distinct crafted input."""
    from logging_spark.operators.kmv import (kmv_audit, kmv_estimate,
                                             kmv_sketch, grouped_sketch,
                                             merge_sketches)
    df = spark.range(20000).select(
        (F.col("id") % 5000).alias("v"),
        (F.col("id") % 7).alias("shard"))
    aud = kmv_audit(df, "v", k=128).first()
    assert aud["k_used"] == 128
    assert aud["within_budget"] == 1
    assert abs(aud["est_distinct"] - 5000) <= 5000 * 3 / (128 ** 0.5)
    per = grouped_sketch(df, "v", ["shard"], k=128)
    merged = kmv_estimate(merge_sketches(per, k=128)).first()
    direct = kmv_estimate(kmv_sketch(df, "v", k=128)).first()
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_kmv_small_input_holds_all_values(spark):
    from logging_spark.operators.kmv import kmv_estimate, kmv_sketch
    df = spark.range(10).select(F.col("id").alias("v"))
    est = kmv_estimate(kmv_sketch(df, "v", k=64)).first()
    assert est["k_used"] == 10  # fewer distinct than k: sketch = all


def test_kmv_intersection_estimate(spark):
    from logging_spark.operators.kmv import (kmv_intersect_estimate,
                                             kmv_sketch)
    a = spark.range(3000).select(F.col("id").alias("v"))       # 0..2999
    b = spark.range(1000, 5000).select(F.col("id").alias("v"))  # 1k..5k
    est = kmv_intersect_estimate(
        kmv_sketch(a, "v", k=128, seed="x"),
        kmv_sketch(b, "v", k=128, seed="x")).first()
    # true intersection = 2000; theta-sample of ~128 -> ~27% 3-sigma
    assert est["n_common"] > 0
    assert abs(est["est_intersection"] - 2000) <= 2000 * 0.30


def test_kmv_intersection_disjoint_is_zero(spark):
    from logging_spark.operators.kmv import (kmv_intersect_estimate,
                                             kmv_sketch)
    a = spark.range(500).select(F.col("id").alias("v"))
    b = spark.range(500, 1000).select(F.col("id").alias("v"))
    est = kmv_intersect_estimate(
        kmv_sketch(a, "v", k=64, seed="x"),
        kmv_sketch(b, "v", k=64, seed="x")).first()
    assert est["n_common"] == 0 and est["est_intersection"] == 0
