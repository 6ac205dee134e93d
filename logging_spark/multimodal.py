"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a `kind`/`mime` and
typed metadata (schema.MEDIA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested;
the actual codec step is STUBBED (this container has no image/audio
libraries): `decode_stub=True` produces a deterministic fake feature
vector from the payload bytes, `decode_stub=False` raises
NotImplementedError where PIL/torchaudio/ffmpeg would be called.

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
        for pdf in batches:
            if not len(pdf):
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires PIL/torchaudio/pyav; not in this image"
                )
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else str(p).encode()
                for p in pdf[payload_col]
            ]
            feats = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": [len(p) for p in payloads],
            })

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256,
                  decode_stub: bool = True) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side (exact integer
    math, no UDF); the pixel work is the stubbed decode step."""
    if not decode_stub:
        raise NotImplementedError("real resize requires an image codec")
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
