"""Z-order layout (sources/layout.py): prove the clustering actually
enables multi-dimensional skipping by reading parquet footer stats —
per-file min/max widths must shrink on BOTH dimensions vs an
unclustered write, which no single-column sort can achieve."""

import glob
import os
import sys

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logging_spark.sources.layout import write_zordered, z_value  # noqa: E402


def _avg_width(path: str, col: str) -> float:
    widths = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            widths.append(hi - lo)
    assert widths, f"no footer stats for {col} under {path}"
    return sum(widths) / len(widths)


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    z = df.select(z_value([F.col("x"), F.col("y")], bits=3)
                  .alias("z")).collect()[0].z
    # x bits at even positions, y bits at odd: x=101, y=011
    # -> z = x0*1 + y0*2 + x1*4 + y1*8 + x2*16 + y2*32
    assert z == (1 * 1 + 1 * 2 + 0 * 4 + 1 * 8 + 1 * 16 + 0 * 32)


@pytest.mark.parametrize("dim", ["a", "b"])
def test_zorder_narrows_file_ranges_on_both_dims(spark, tmp_path, dim):
    n = 20_000
    # two independent uniform dimensions -> random layout has ~full
    # range in every file on both
    df = (spark.range(n)
          .select((F.xxhash64("id") % 10_000).alias("a"),
                  (F.xxhash64("id", F.lit(1)) % 10_000).alias("b"))
          .select(F.abs("a").alias("a"), F.abs("b").alias("b")))
    base = str(tmp_path / "plain")
    df.repartition(8).write.mode("overwrite").parquet(base)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["a", "b"], bits=10, num_files=8)
    # 8 files x 2 dims: z-order cuts each dim's avg per-file width
    # roughly in half per interleave level; demand at least 40% off
    assert _avg_width(zpath, dim) < 0.6 * _avg_width(base, dim)


def test_zorder_write_preserves_rows(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (999 - F.col("id")).alias("b"))
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["a", "b"], bits=8, num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("a")).collect()[0][0] == 999 * 1000 // 2
    assert set(back.columns) == {"a", "b"}


def test_z_value_rejects_bit_overflow(spark):
    import pytest as _pytest
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    cols = [F.col("x")] * 6
    with _pytest.raises(ValueError, match="exceeds 63"):
        df.select(z_value(cols, bits=12))


def test_zorder_write_handles_empty_and_null_columns(spark, tmp_path):
    empty = spark.createDataFrame([], "a long, b long")
    p1 = str(tmp_path / "empty")
    write_zordered(empty, p1, ["a", "b"], bits=8, num_files=2)
    assert spark.read.parquet(p1).count() == 0
    nulls = spark.createDataFrame(
        [(None, 1), (None, 2)], "a long, b long")
    p2 = str(tmp_path / "nulls")
    write_zordered(nulls, p2, ["a", "b"], bits=8, num_files=2)
    assert spark.read.parquet(p2).count() == 2
