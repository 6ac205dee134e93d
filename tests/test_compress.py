"""Compression-ratio signal (operators/compress.py) vs direct zlib."""

import zlib

from pyspark.sql import functions as F

from logging_spark.operators.compress import (
    PPM, compression_census, compression_ratio_ppm,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 3,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",   # repetitive
    "k9!Qz@7#mP$2xW%v8&nL*4rT(6yU)1oI-3eS_5dF+0gH=jC",    # junk-ish
    "",                                                    # empty
    "short",
    "日本語のテキストもバイト単位で正しく扱う必要がある。" * 2,
]


def _want(t, level=6):
    raw = t.encode("utf-8")
    return PPM if not raw else len(zlib.compress(raw, level)) * PPM // len(raw)


def test_ratio_matches_direct_zlib(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "i LONG, text STRING")
    got = {r["i"]: r["r"] for r in df.select(
        "i", compression_ratio_ppm("text").alias("r")).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _want(t), t[:30]
    assert got[3] == PPM  # empty -> incompressible sentinel
    assert got[1] < 300_000  # repetitive band


def test_census_matches_brute_force(spark):
    rows = [("s" + str(i % 2), t) for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(rows, "source STRING, text STRING")
    got = {r["source"]: r for r in
           compression_census(df, "source", "text").collect()}
    for src in ("s0", "s1"):
        member = [t for s, t in rows if s == src]
        ratios = [_want(t) for t in member]
        assert got[src]["n_docs"] == len(member)
        assert got[src]["avg_ratio_ppm"] == sum(ratios) // len(ratios)
        assert got[src]["n_repetitive"] == sum(r < 300_000 for r in ratios)
        assert got[src]["n_binaryish"] == sum(r >= 900_000 for r in ratios)
