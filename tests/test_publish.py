"""Atomic multi-table snapshot publish (sources/publish.py): readers
never see a partial version; pins survive until vacuum."""

from __future__ import annotations

import os

import pytest

from logging_spark.sources.publish import (
    publish_snapshot, read_manifest, read_snapshot, vacuum,
)


def _counts(spark, root, table, version=None):
    return read_snapshot(spark, root, table, version).count()


def test_publish_read_roundtrip_two_tables(spark, tmp_path):
    root = str(tmp_path / "wh")
    v = publish_snapshot(
        {"docs": spark.range(100).toDF("id"),
         "stats": spark.range(7).toDF("k")}, root)
    assert v == 1
    assert _counts(spark, root, "docs") == 100
    assert _counts(spark, root, "stats") == 7


def test_crash_between_tables_leaves_readers_on_old_version(
        spark, tmp_path):
    root = str(tmp_path / "wh")
    publish_snapshot({"docs": spark.range(100).toDF("id")}, root)
    # simulate a crashed v2 publish: the version dir exists with one
    # table fully written, but the manifest was never swapped
    crashed = os.path.join(root, "v0002", "docs")
    spark.range(999).toDF("id").write.parquet(crashed)
    assert read_manifest(root)["version"] == 1
    assert _counts(spark, root, "docs") == 100  # old data, not 999
    # a retried publish reclaims the leftover tree and commits cleanly
    v = publish_snapshot({"docs": spark.range(200).toDF("id")}, root)
    assert v == 2
    assert _counts(spark, root, "docs") == 200


def test_pinned_reads_and_vacuum(spark, tmp_path):
    root = str(tmp_path / "wh")
    publish_snapshot({"docs": spark.range(10).toDF("id")}, root)
    publish_snapshot({"docs": spark.range(20).toDF("id")}, root)
    publish_snapshot({"docs": spark.range(30).toDF("id")}, root)
    assert _counts(spark, root, "docs") == 30
    assert _counts(spark, root, "docs", version=1) == 10  # time travel
    removed = vacuum(root, keep=1)
    assert removed == [1, 2]
    assert _counts(spark, root, "docs") == 30  # current untouched
    with pytest.raises(Exception):
        _counts(spark, root, "docs", version=1)
