"""skew_split_join (operators/skew.py): hot/cold split must be
row-identical to the plain join, with both slices exercised and the
hot side plan-verified broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logging_spark.operators.skew import skew_split_join


def _fixture(spark):
    # key 1 is hot (6 rows), keys 2/3 cold; key 9 has no dim row
    fact = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(6)]
        + [Row(k=2, v=10), Row(k=3, v=11), Row(k=9, v=12)])
    dim = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="c2"), Row(k=3, name="c3"),
         Row(k=4, name="unused")])
    return fact, dim


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("how", ["inner", "left"])
def test_identical_to_plain_join(spark, how):
    fact, dim = _fixture(spark)
    split = skew_split_join(fact, dim, "k", hot_threshold=5, how=how)
    plain = fact.join(dim, "k", how)
    assert _rows(split) == _rows(plain)
    # both slices are non-empty under this fixture/threshold
    hot_n = split.where(F.col("k") == 1).count()
    assert hot_n == 6


def test_all_cold_when_threshold_high(spark):
    fact, dim = _fixture(spark)
    split = skew_split_join(fact, dim, "k", hot_threshold=1000)
    assert _rows(split) == _rows(fact.join(dim, "k"))


def test_unsupported_how_raises(spark):
    fact, dim = _fixture(spark)
    with pytest.raises(ValueError):
        skew_split_join(fact, dim, "k", how="full")


def test_hot_side_is_broadcast(spark):
    fact, dim = _fixture(spark)
    plan = skew_split_join(fact, dim, "k", hot_threshold=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
