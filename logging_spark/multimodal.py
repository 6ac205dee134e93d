"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a `kind`/`mime` and
typed metadata (schema.MEDIA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.

Codec status: IMAGES and AUDIO decode for real — functions/png.py is
a pure-stdlib (zlib) PNG codec and functions/wav.py a pure-stdlib
RIFF/PCM WAV codec, so `decode_stub=False` turns PNG payloads into
pixel-derived features and WAV payloads into sample-derived features
(tests/test_multimodal.py proves both are functions of decoded
content, not payload bytes). VIDEO decode remains STUBBED (compressed
codecs legitimately need pyav, not in this image): `decode_stub=True`
produces a deterministic hash-fake for every kind, `decode_stub=False`
raises NotImplementedError for payloads that are neither PNG nor WAV.

At scale: payloads dominate bytes, so operators below never shuffle
payloads — feature extraction is a mapInPandas projection (narrow),
and anything grouped (per-kind stats) drops the payload column first
(column pruning keeps it out of the exchange).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+embed: hash-seeded vector.
    Replace with the real codec (PIL / torchaudio / pyav) in prod."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(df: DataFrame, decode_stub: bool = True,
                     payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    Narrow (no shuffle); executors stream payload batches through the
    kernel without materializing the whole partition."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logging_spark.functions import png, wav

        def one(payload: bytes) -> np.ndarray:
            if decode_stub:
                return _fake_decode(payload)
            if png.is_png(payload):
                return png.image_features(png.decode_png(payload), FEATURE_DIM)
            if wav.is_wav(payload):
                return wav.audio_features(*wav.decode_wav(payload), FEATURE_DIM)
            raise NotImplementedError(
                "real decode beyond PNG/WAV (compressed codecs) requires "
                "pyav; not in this image (pass decode_stub=True)")

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode()
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [one(p) for p in payloads],
                "n_bytes": [len(p) for p in payloads],
            })

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256,
                  decode_stub: bool = True) -> DataFrame:
    """Resize PLANNING: computes target dims JVM-side (exact integer
    math, no UDF). For actual pixel work on PNG payloads use
    resize_image_payloads."""
    if not decode_stub:
        raise NotImplementedError(
            "use resize_image_payloads for real pixel resize (PNG)")
    scale_num = F.lit(max_side)
    longest = F.greatest("width", "height")
    needs = longest > max_side
    return df.where(F.col("kind") == "image").select(
        "media_id",
        "width", "height",
        F.when(needs, (F.col("width") * scale_num / longest).cast("int"))
         .otherwise(F.col("width")).alias("out_width"),
        F.when(needs, (F.col("height") * scale_num / longest).cast("int"))
         .otherwise(F.col("height")).alias("out_height"),
    )


def resize_image_payloads(df: DataFrame, max_side: int = 256,
                          payload_col: str = "payload") -> DataFrame:
    """REAL pixel resize for PNG payloads: decode (functions/png.py)
    -> nearest-neighbor downsample -> re-encode. Narrow mapInPandas —
    payloads stream through executors batch-by-batch, never shuffle.
    Images already within max_side pass through re-encoded (canonical
    filter-0 PNG). Non-PNG rows raise: route kind=='image' here."""
    out_schema = "media_id long, out_width int, out_height int, payload binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logging_spark.functions import png

        def one(payload: bytes):
            arr = png.decode_png(payload)
            h, w = arr.shape[:2]
            longest = max(h, w)
            if longest > max_side:
                oh = max(1, (h * max_side) // longest)
                ow = max(1, (w * max_side) // longest)
                ys = (np.arange(oh) * h) // oh
                xs = (np.arange(ow) * w) // ow
                arr = arr[ys][:, xs]
            else:
                oh, ow = h, w
            # squeeze ONLY the channel axis: arr.squeeze() would also
            # drop a spatial axis of extent 1 (extreme aspect ratios,
            # e.g. (1, W, 3)), silently re-encoding a W x 3 grayscale
            if arr.ndim == 3 and arr.shape[2] == 1:
                arr = arr[:, :, 0]
            return ow, oh, png.encode_png(arr)

        for pdf in batches:
            if not len(pdf):
                continue
            res = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "out_width": [r[0] for r in res],
                "out_height": [r[1] for r in res],
                "payload": [r[2] for r in res],
            })

    return df.select("media_id", payload_col).mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode frame timestamps
    0, every_ms, ... duration_ms (pure sequence/explode; the frame
    grab itself is the stubbed decode)."""
    vids = df.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"),
                       F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )


def per_kind_stats(df: DataFrame) -> DataFrame:
    """Payload-free aggregate: column pruning keeps binary out of the
    shuffle; verify with .explain() that the exchange carries only
    (kind, n_bytes-ish) columns."""
    return (
        df.select("kind", F.length("payload").cast("long").alias("n_bytes"))
        .groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum("n_bytes").alias("total_bytes"))
    )


def image_dhash(df: DataFrame, payload_col: str = "payload",
                id_col: str = "media_id") -> DataFrame:
    """(id, dhash): 64-bit perceptual difference hash from DECODED
    pixels — grayscale mean over channels, nearest-neighbor resample
    to a 9x8 grid, bit (r, c) set iff g[r, c] > g[r, c+1]. The
    industry-standard near-dup-image fingerprint (public dHash
    construction): robust to re-encoding, resizing and mild edits,
    which byte-level hashing (exact_duplicates on payload md5)
    misses entirely.

    Narrow mapInPandas over PNG payloads (functions/png.py pure-
    stdlib decode); payload bytes never shuffle — only the 8-byte
    hash leaves the scan stage. Packed via int.from_bytes(signed)
    so the full 64 bits fit a Spark long."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from logging_spark.functions import png as png_mod
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = png_mod.decode_png(bytes(payload))
                gray = arr.astype("float64").mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, :-1] > g[:, 1:]).flatten()
                out.append(int.from_bytes(np.packbits(bits).tobytes(),
                                          "big", signed=True))
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": out})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, dhash long")


def near_dup_images(hashes: DataFrame, max_hamming: int = 6,
                    id_col: str = "media_id") -> DataFrame:
    """(id_a, id_b, hamming): image pairs whose dHashes differ in at
    most `max_hamming` of 64 bits. Candidate generation is the
    SimHash banding trick: split the hash into 4 16-bit bands — any
    pair within Hamming distance 6 agrees exactly on >= 1 band
    (pigeonhole over 4 bands guarantees recall up to distance 3 and
    catches virtually all at 6 since edits cluster) — equi-join on
    (band_idx, band_value), then verify with bit_count(a ^ b). Never
    an all-pairs comparison; the verify set is bucket-bounded."""
    bands = F.array(*[
        F.struct(F.lit(b).alias("band_idx"),
                 F.shiftrightunsigned(F.col("dhash"), b * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("band_val"))
        for b in range(4)])
    banded = (hashes.select(F.col(id_col), F.col("dhash"),
                            F.explode(bands).alias("b"))
              .select(id_col, "dhash", "b.band_idx", "b.band_val")
              .localCheckpoint())
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                    & (F.col("a.band_val") == F.col("b.band_val"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     F.expr("bit_count(a.dhash ^ b.dhash)").cast("int")
                     .alias("hamming"))
             .distinct())
    return pairs.where(F.col("hamming") <= max_hamming)
