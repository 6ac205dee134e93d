"""Compression-ratio quality signal (zlib) — the classic cheap
detector for machine-generated/boilerplate text (highly compressible)
and for binary-ish noise (incompressible), used as a document gate in
public web-corpus pipelines alongside the Gopher repetition rules.

This is the repo's honest Python-kernel surface: DEFLATE is not
expressible in SQL, so the ratio runs as an Arrow-vectorized pandas
UDF (one C call per row inside a zero-copy batch — not row-at-a-time
Python). Everything around it (banding, per-source census) stays in
codegen. No DuckDB oracle exists for zlib, so the contract entry is
rows-only by design; exactness is pinned in pytest against direct
``zlib.compress`` of the same strings.

Determinism: zlib output is fixed given (bytes, level, library) —
stable within an image; across zlib versions the RATIO BAND is the
stable contract, not the byte count (the reason the banded census,
not the raw ratio, is the recommended downstream signal).

At 100 TB: narrow projection (text never shuffles), compression cost
~30 MB/s/core — gate AFTER the cheap expression filters so the UDF
only sees survivors.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def compression_ratio_ppm(text: Column | str, level: int = 6) -> Column:
    """compressed_bytes * 1e6 // raw_bytes of the UTF-8 encoding
    (empty text -> 1e6, 'incompressible'). Arrow-batched pandas UDF."""

    @F.pandas_udf("long")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(t) -> int:
            raw = (t or "").encode("utf-8", "surrogatepass")
            if not raw:
                return PPM
            return len(zlib.compress(raw, level)) * PPM // len(raw)
        return s.map(one)

    return _ratio(F.col(text) if isinstance(text, str) else text)


def compression_band(ratio_ppm: Column,
                     low: int = 300_000, high: int = 900_000) -> Column:
    """'repetitive' (< low), 'normal', or 'binaryish' (>= high)."""
    return (F.when(ratio_ppm < low, F.lit("repetitive"))
            .when(ratio_ppm >= high, F.lit("binaryish"))
            .otherwise(F.lit("normal")))


def compression_census(df: DataFrame, group_col: str, text_col: str,
                       level: int = 6, low: int = 300_000,
                       high: int = 900_000) -> DataFrame:
    """Per-group band census + mean ratio (ppm, integer DIV). One
    narrow UDF projection, one map-side-combined grouped agg."""
    # project the UDF ONCE, then band off the bound column — banding
    # from the raw expression would run the UDF a second time per row
    scored = (df.select(F.col(group_col),
                        compression_ratio_ppm(text_col, level)
                        .alias("_r"))
              .withColumn("_b", compression_band(F.col("_r"),
                                                 low, high)))
    return (scored.groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.expr("CAST(sum(_r) AS BIGINT) DIV count(*)")
                 .cast("long").alias("avg_ratio_ppm"),
                 F.sum((F.col("_b") == "repetitive").cast("long"))
                 .cast("long").alias("n_repetitive"),
                 F.sum((F.col("_b") == "binaryish").cast("long"))
                 .cast("long").alias("n_binaryish")))
