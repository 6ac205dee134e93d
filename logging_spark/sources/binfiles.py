"""Multimodal file ingest via Spark's builtin ``binaryFile`` source.

The missing first hop of the multimodal pipeline: a directory (or
object-store prefix) of image/audio files becomes a MEDIA-shaped
DataFrame — ``media_id, kind, mime, payload, width, height`` — ready
for ``multimodal.extract_features`` / ``resize_image_payloads``.

Scale design:
- ``binaryFile`` is a real DataSource V1 file source: listing is
  distributed, files split into tasks by ``maxPartitionBytes``
  grouping (one file = one row; files are never split mid-payload),
  and ``pathGlobFilter`` prunes at LISTING time, before any byte is
  read. 10^8 objects behind a prefix is a listing problem, not a read
  problem — partition the prefix (date=/shard=) and the source prunes
  directories like any other file source.
- PNG dimensions are sniffed JVM-SIDE from the payload header
  (IHDR width/height are big-endian int32 at fixed offsets), so the
  common "filter by size before decoding" step never leaves codegen
  and never touches Python. Decode itself stays in the existing
  Arrow kernels.
- ``media_id`` prefers a numeric id embedded in the filename
  (``...<digits>.<ext>``, stable across re-listing and moves between
  prefixes); falls back to a 60-bit hash of the path.

Spark caps a single binaryFile payload at
``spark.sql.sources.binaryFile.maxLength`` (int32 max ~2 GB); larger
assets belong in chunked storage anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXT_KIND = {"png": "image", "jpg": "image", "jpeg": "image",
             "gif": "image", "wav": "audio", "mp3": "audio",
             "flac": "audio", "mp4": "video", "webm": "video",
             "mkv": "video"}
_EXT_MIME = {"png": "image/png", "jpg": "image/jpeg",
             "jpeg": "image/jpeg", "gif": "image/gif",
             "wav": "audio/wav", "mp3": "audio/mpeg",
             "flac": "audio/flac", "mp4": "video/mp4",
             "webm": "video/webm", "mkv": "video/x-matroska"}

# IHDR: 8-byte signature + 4 len + 4 'IHDR', then width/height as
# big-endian uint32 at 1-based byte offsets 17 and 21.
_PNG_W = "CAST(conv(hex(substring(content, 17, 4)), 16, 10) AS INT)"
_PNG_H = "CAST(conv(hex(substring(content, 21, 4)), 16, 10) AS INT)"
_IS_PNG = "hex(substring(content, 1, 8)) = '89504E470D0A1A0A'"


def _map_case(mapping: dict[str, str], default: str) -> str:
    arms = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return f"CASE lower(ext) {arms} ELSE '{default}' END"


def read_media_files(spark: SparkSession, path: str,
                     glob: str | None = None,
                     recursive: bool = True) -> DataFrame:
    """Load files under ``path`` as a MEDIA-shaped DataFrame.

    Columns: ``media_id long, kind string, mime string, path string,
    n_bytes long, payload binary, width int, height int`` (width and
    height non-null only for PNG payloads — sniffed from the header
    without decoding).
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    raw = r.load(path)
    with_ext = raw.select(
        "path", "content",
        F.expr(r"regexp_extract(path, '\\.([A-Za-z0-9]+)$', 1)")
        .alias("ext"),
        F.expr(r"regexp_extract(path, '(\\d+)\\.[A-Za-z0-9]+$', 1)")
        .alias("_fid"))
    return with_ext.select(
        F.expr("CASE WHEN _fid != '' THEN CAST(_fid AS BIGINT) "
               "ELSE CAST(conv(substring(md5(path), 1, 15), 16, 10) "
               "AS BIGINT) END").alias("media_id"),
        F.expr(_map_case(_EXT_KIND, "binary")).alias("kind"),
        F.expr(_map_case(_EXT_MIME, "application/octet-stream"))
        .alias("mime"),
        F.col("path"),
        F.length("content").cast("long").alias("n_bytes"),
        F.col("content").alias("payload"),
        F.expr(f"CASE WHEN {_IS_PNG} THEN {_PNG_W} END").alias("width"),
        F.expr(f"CASE WHEN {_IS_PNG} THEN {_PNG_H} END").alias("height"))
