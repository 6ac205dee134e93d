"""binaryFile multimodal ingest (sources/binfiles.py): files on disk
become MEDIA-shaped rows; PNG dims sniffed JVM-side; payloads flow
into the real decode kernels unchanged."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logging_spark.functions import png, wav
from logging_spark.multimodal import extract_features
from logging_spark.sources.binfiles import read_media_files


def _make_tree(tmp_path):
    (tmp_path / "sub").mkdir()
    arrs = {}
    for i, (h, w) in enumerate([(5, 7), (16, 3), (2, 2)]):
        arr = ((np.arange(h * w * 3).reshape(h, w, 3) * (i + 3)) % 256
               ).astype(np.uint8)
        arrs[100 + i] = arr
        d = tmp_path / ("sub" if i == 2 else "")
        (d / f"img_{100 + i}.png").write_bytes(png.encode_png(arr))
    smp = (np.sin(np.linspace(0, 40, 800)) * 2000).astype(np.int16)
    (tmp_path / "clip_7.wav").write_bytes(wav.encode_wav(smp, 8000))
    (tmp_path / "notes.txt").write_bytes(b"not media")
    return arrs, smp


def test_read_media_files_schema_kinds_and_png_sniff(spark, tmp_path):
    arrs, _ = _make_tree(tmp_path)
    df = read_media_files(spark, str(tmp_path)).cache()
    rows = {r["media_id"]: r for r in df.collect()}
    assert len(rows) == 5
    for mid, arr in arrs.items():
        r = rows[mid]
        assert r["kind"] == "image" and r["mime"] == "image/png"
        assert (r["height"], r["width"]) == arr.shape[:2]
        assert bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert rows[7]["kind"] == "audio" and rows[7]["width"] is None
    other = [r for r in rows.values() if r["kind"] == "binary"]
    assert len(other) == 1 and other[0]["media_id"] > 0


def test_glob_prunes_at_listing(spark, tmp_path):
    _make_tree(tmp_path)
    df = read_media_files(spark, str(tmp_path), glob="*.png")
    assert df.count() == 3
    assert df.where(F.col("kind") != "image").count() == 0


def test_ingested_payloads_decode_for_real(spark, tmp_path):
    arrs, smp = _make_tree(tmp_path)
    media = read_media_files(spark, str(tmp_path)) \
        .where(F.col("kind").isin("image", "audio"))
    feats = {r["media_id"]: r for r in
             extract_features(media, decode_stub=False).collect()}
    for mid, arr in arrs.items():
        want = png.image_features(arr, 16)
        got = np.array(feats[mid]["feature"], dtype=np.float32)
        assert np.allclose(got, want)
    want_a = wav.audio_features(*wav.decode_wav(
        wav.encode_wav(smp, 8000)), 16)
    got_a = np.array(feats[7]["feature"], dtype=np.float32)
    assert np.allclose(got_a, want_a)
