import json

from pyspark.sql import functions as F

from logging_spark.functions.parse import parse_turns

LINES = [
    ("[INFO] scheduler: request code=17 shard=3",),
    ("[ERROR] sink: rejected code=900 shard=1 extra=x",),
    ("[WARN] gc: queued",),
    ("no structure here",),
    ("",),
    (None,),
]


def _golden():
    return [
        ("INFO", "scheduler", "request", {"code": "17", "shard": "3"}),
        ("ERROR", "sink", "rejected", {"code": "900", "shard": "1", "extra": "x"}),
        ("WARN", "gc", "queued", None),
        (None, None, None, None),
        (None, None, None, None),
        (None, None, None, None),
    ]


def _check(rows):
    got = [
        (r["parsed"]["level"], r["parsed"]["component"], r["parsed"]["message"],
         json.loads(r["parsed"]["attrs"]) if r["parsed"]["attrs"] else None)
        for r in rows
    ]
    assert got == _golden()


def test_parse_builtin_golden(spark):
    df = spark.createDataFrame(LINES, "text string").withColumn(
        "ord", F.monotonically_increasing_id()
    )
    rows = parse_turns(df).orderBy("ord").collect()
    _check(rows)


def test_parse_udf_golden(spark):
    df = spark.createDataFrame(LINES, "text string").withColumn(
        "ord", F.monotonically_increasing_id()
    )
    rows = parse_turns(df, use_udf=True).orderBy("ord").collect()
    _check(rows)


def test_builtin_and_udf_agree_on_synth(spark):
    from logging_spark import synth

    df = synth.transcripts(spark, n_conversations=20, turns_per_conv=10,
                           hot_conversations=1, hot_factor=5)
    a = parse_turns(df).select("conv_id", "turn_idx", "ts", "parsed")
    b = parse_turns(df, use_udf=True).select("conv_id", "turn_idx", "ts", "parsed")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
