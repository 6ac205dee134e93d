"""exact heavy hitters (operators/heavy.py): MG superset guarantee +
exact recount, under adversarial partitioning."""

import random

from pyspark.sql import functions as F

from logging_spark.operators.heavy import heavy_hitters


def _exact(rows, phi_ppm):
    from collections import Counter
    c = Counter(rows)
    n = len(rows)
    return {k: v for k, v in c.items() if v * 1_000_000 >= phi_ppm * n}


def test_heavy_hitters_exact_zipf(spark):
    rng = random.Random(7)
    # zipf-ish: few heavy keys + long uniform tail
    rows = (["hot1"] * 400 + ["hot2"] * 250 + ["warm"] * 60
            + [f"t{rng.randrange(3000)}" for _ in range(4000)])
    rng.shuffle(rows)
    for parts in (1, 7, 32):  # incl. partitions >> heavy keys
        df = spark.createDataFrame([(r,) for r in rows], "item string") \
                  .repartition(parts)
        got = {r["item"]: r["n"]
               for r in heavy_hitters(df, phi_ppm=50_000).collect()}
        assert got == _exact(rows, 50_000), parts


def test_heavy_hitters_threshold_boundary(spark):
    # item exactly AT the ppm threshold is kept; one below is dropped
    rows = ["a"] * 10 + ["b"] * 9 + [f"z{i}" for i in range(81)]
    assert len(rows) == 100
    df = spark.createDataFrame([(r,) for r in rows], "item string") \
              .repartition(3)
    got = {r["item"]: r["n"]
           for r in heavy_hitters(df, phi_ppm=100_000).collect()}
    assert got == {"a": 10}


def test_heavy_hitters_no_item_shuffle(spark):
    # the only aggregate exchange is over the candidate-joined subset;
    # the full stream reaches mapInPandas without an exchange below it
    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 13).cast("string"))
         .alias("item"))
    plan = heavy_hitters(df, phi_ppm=10_000)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]


# property: exactness must hold for ANY multiset and threshold, not
# just zipf shapes — random collisions, all-unique, all-same, tiny n
from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(st.sampled_from([f"k{i}" for i in range(12)]),
                  min_size=1, max_size=200),
    phi_ppm=st.sampled_from([20_000, 100_000, 300_000, 700_000]),
    parts=st.sampled_from([1, 3, 8]),
)
def test_heavy_hitters_matches_exact(spark_prop, rows, phi_ppm, parts):
    spark = spark_prop
    df = spark.createDataFrame([(r,) for r in rows], "item string") \
              .repartition(parts)
    got = {r["item"]: r["n"]
           for r in heavy_hitters(df, phi_ppm=phi_ppm).collect()}
    assert got == _exact(rows, phi_ppm), (phi_ppm, parts, rows[:20])
