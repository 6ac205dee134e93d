"""Multi-table atomic snapshot publish (manifest-pointer protocol).

``merge_upsert``/``compact`` make a SINGLE table crash-safe via the
two-rename swap; a training-data release is usually SEVERAL tables
(documents + manifest + splits + stats) that must appear to consumers
all-or-nothing. The classic object-store answer — and what Iceberg
does internally with its metadata pointer — is a tiny manifest file
swapped atomically AFTER every table of the new version is fully
written:

    root/_MANIFEST          <- one small JSON, os.replace()'d last
    root/v000N/<table>/...  <- immutable versioned table trees

Readers resolve the manifest first, then read only paths it names, so
a writer crash at ANY point before the final pointer swap leaves them
on the previous version with zero partial state visible. Versions are
immutable once published (no in-place rewrite — time travel and
reproducible training runs read ``version=N`` forever, until
``vacuum`` reclaims unreferenced trees).

At 100 TB the protocol is unchanged: the manifest is O(tables) bytes;
on HDFS/local, rename is atomic; on S3-style stores swap the pointer
via a conditional PUT (the documented Iceberg/Delta commit pattern).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_MANIFEST"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def read_manifest(root: str) -> dict | None:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def publish_snapshot(dfs: dict[str, DataFrame], root: str) -> int:
    """Write every table of the next version, then atomically swap
    the manifest pointer. Returns the published version number.
    Crash-safe: consumers never observe a partially-written version
    (the pointer moves only after ALL tables are committed)."""
    os.makedirs(root, exist_ok=True)
    cur = read_manifest(root)
    version = (cur["version"] + 1) if cur else 1
    vdir = os.path.join(root, f"v{version:04d}")
    if os.path.exists(vdir):  # leftover from a crashed attempt
        shutil.rmtree(vdir)
    tables = {}
    for name, df in dfs.items():
        path = os.path.join(vdir, name)
        df.write.mode("error").parquet(path)
        tables[name] = os.path.join(f"v{version:04d}", name)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "tables": tables}, f)
    os.replace(tmp, _manifest_path(root))  # the atomic commit point
    return version


def read_snapshot(spark: SparkSession, root: str, table: str,
                  version: int | None = None) -> DataFrame:
    """Read `table` at the current (or a pinned) published version.
    Pinned reads keep working until that version is vacuumed —
    reproducible training runs should pin."""
    if version is None:
        m = read_manifest(root)
        if m is None:
            raise FileNotFoundError(f"no manifest under {root}")
        rel = m["tables"][table]
    else:
        rel = os.path.join(f"v{version:04d}", table)
    return spark.read.parquet(os.path.join(root, rel))


def vacuum(root: str, keep: int = 1) -> list[int]:
    """Remove version trees older than the newest `keep` (the current
    manifest's version is ALWAYS retained). Returns removed versions."""
    m = read_manifest(root)
    if m is None:
        return []
    versions = sorted(int(d[1:]) for d in os.listdir(root)
                      if d.startswith("v") and d[1:].isdigit())
    protect = set(versions[-keep:]) | {m["version"]}
    removed = []
    for v in versions:
        if v not in protect:
            shutil.rmtree(os.path.join(root, f"v{v:04d}"))
            removed.append(v)
    return removed
