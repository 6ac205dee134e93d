"""RFM segmentation (operators/segments.py) and temperature mixing
(operators/sample.py:mix_temperature) on hand-checkable fixtures."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from logging_spark.operators.sample import mix_temperature
from logging_spark.operators.segments import rfm_segments


def _orders(spark):
    d = datetime.datetime
    return spark.createDataFrame([
        Row(o_custkey=1, o_orderdate=d(2001, 12, 31), o_totalprice=10.0),
        Row(o_custkey=1, o_orderdate=d(2001, 6, 1), o_totalprice=30.0),
        Row(o_custkey=2, o_orderdate=d(1995, 1, 1), o_totalprice=5.5),
    ])


def test_rfm_facts_and_bins(spark):
    got = {r["cust"]: r for r in rfm_segments(_orders(spark)).collect()}
    c1, c2 = got[1], got[2]
    assert c1["recency_days"] == 1 and c1["r_bin"] == 0
    assert c1["frequency"] == 2 and c1["f_bin"] == 2  # bin(2)='10'
    assert c1["monetary_cents"] == 4000
    assert c1["m_bin"] == 6  # 40 dollars -> bin '101000'
    assert c2["r_bin"] == 7  # dormant since 1995, capped
    assert c2["monetary_cents"] == 550 and c2["m_bin"] == 3  # 5 -> '101'


def test_mix_temperature_sqrt_rebalance(spark):
    df = spark.createDataFrame(
        [Row(source="big", n_chars=10000)] * 4
        + [Row(source="small", n_chars=100)])
    got = {r["source"]: r
           for r in mix_temperature(df, size_col="n_chars",
                                    budget=1000).collect()}
    # sizes 40000 vs 100 -> weights 200 vs 10: the small source gets
    # ~4.8% of the budget instead of the proportional 0.25%
    assert got["big"]["weight"] == 200 and got["small"]["weight"] == 10
    assert got["small"]["share_ppm"] == 47619
    assert got["small"]["quota"] == 47
    assert got["big"]["quota"] + got["small"]["quota"] <= 1000
