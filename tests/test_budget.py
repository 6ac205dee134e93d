"""budget_head: distributed greedy prefix selection under a budget."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logging_spark.operators.sample import budget_head


def _naive(df, amount_col, order_cols, budget, cum_col):
    w = Window.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0)
    return (df.withColumn(cum_col, F.sum(amount_col).over(w))
            .where(F.col(cum_col) <= budget))


def _frame(spark, n=200, seed=7):
    import random
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 50), rng.randint(0, 9)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, amount long, score long")


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_matches_single_partition_window(spark, parts):
    df = _frame(spark)
    order = [F.col("score").desc(), F.col("id")]
    got = budget_head(df, "amount", order, budget=900,
                      cum_col="cum", num_partitions=parts)
    want = _naive(df, "amount", order, 900, "cum")
    g = sorted(got.collect())
    assert g == sorted(want.collect())
    assert len(g) > 0


def test_partitioning_independent(spark):
    df = _frame(spark, n=500, seed=11)
    order = [F.col("score").desc(), F.col("id")]
    a = sorted(budget_head(df, "amount", order, 2000, "cum",
                           num_partitions=2).collect())
    b = sorted(budget_head(df.repartition(13), "amount", order, 2000,
                           "cum", num_partitions=9).collect())
    assert a == b


def test_budget_smaller_than_first_row(spark):
    df = spark.createDataFrame([(1, 100, 5), (2, 3, 4)],
                               "id long, amount long, score long")
    order = [F.col("score").desc(), F.col("id")]
    # first row (score 5) costs 100 > budget 50 -> nothing selected:
    # greedy prefix, not knapsack
    got = budget_head(df, "amount", order, 50, "cum", num_partitions=2)
    assert got.count() == 0


def test_exact_boundary_inclusive(spark):
    df = spark.createDataFrame([(1, 10, 2), (2, 10, 1), (3, 10, 0)],
                               "id long, amount long, score long")
    order = [F.col("score").desc(), F.col("id")]
    got = budget_head(df, "amount", order, 20, "cum", num_partitions=2)
    rows = {r["id"]: r["cum"] for r in got.collect()}
    assert rows == {1: 10, 2: 20}
