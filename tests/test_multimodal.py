import pytest
from pyspark.sql import functions as F

from logging_spark import multimodal as M
from logging_spark import synth


@pytest.fixture(scope="module")
def media(spark):
    return synth.media(spark, n=60).cache()


def test_extract_features_shape(media):
    out = M.extract_features(media).collect()
    assert len(out) == 60
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in out)
    assert all(r["n_bytes"] > 0 for r in out)
    # deterministic: same payload -> same feature
    again = M.extract_features(media).collect()
    assert {r["media_id"]: list(r["feature"]) for r in out} == \
           {r["media_id"]: list(r["feature"]) for r in again}


def test_decode_stub_gate(media):
    with pytest.raises(Exception) as exc:
        M.extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "not in this image" in str(exc.value)


def test_resize_math(media):
    rows = M.resize_images(media, max_side=100).collect()
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= 100 or (
            max(r["width"], r["height"]) <= 100
        )


def test_sample_frames(media):
    rows = M.sample_frames(media, every_ms=60_000).collect()
    assert rows and all(r["frame_ts_ms"] % 60_000 == 0 for r in rows)


def test_per_kind_stats_prunes_payload(media):
    stats = M.per_kind_stats(media)
    got = {r["kind"]: r["n_items"] for r in stats.collect()}
    assert sum(got.values()) == 60
    # plan prints top-down: everything ABOVE the Exchange is the
    # post-shuffle side — the shuffled rows must not carry the payload
    explained = stats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in explained
    post_shuffle = explained.split("Exchange")[0]
    assert "payload" not in post_shuffle


# ---------------------------------------------------------------------------
# real PNG codec path (functions/png.py): images are no longer stubbed
# ---------------------------------------------------------------------------

def _gradient(h, w):
    import numpy as np
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 255 // max(w - 1, 1)),
                     (y * 255 // max(h - 1, 1)),
                     ((x + y) * 255 // max(h + w - 2, 1))],
                    axis=2).astype("uint8")


def test_png_roundtrip_rgb_gray_rgba():
    import numpy as np
    from logging_spark.functions import png

    rgb = _gradient(13, 7)
    assert (png.decode_png(png.encode_png(rgb)) == rgb).all()
    gray = rgb[:, :, 0]
    assert (png.decode_png(png.encode_png(gray)).squeeze() == gray).all()
    rgba = np.dstack([rgb, np.full((13, 7), 200, "uint8")])
    assert (png.decode_png(png.encode_png(rgba)) == rgba).all()


def test_png_decoder_handles_all_five_filters():
    """Foreign encoders emit filters 1-4; build one PNG whose rows use
    filter 0..4 (forward-filtered here per the spec) and verify the
    decoder reverses every one of them."""
    import struct
    import zlib

    import numpy as np
    from logging_spark.functions import png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (5, 6, 3)).astype("uint8")
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(int)
    out = bytearray()
    for y in range(h):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * ch, int)
        line = np.zeros(w * ch, int)
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            line[x] = (cur[x] - pred) % 256
        out.append(f)
        out.extend(int(v) for v in line)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(bytes(out)))
            + png._chunk(b"IEND", b""))
    assert (png.decode_png(data) == img).all()


def test_extract_features_real_pixels_not_payload_hash(spark):
    """Two PNGs with identical pixels but different compressed BYTES
    (different zlib levels) must give identical real features — proof
    the decode_stub=False path reads pixels, not payload bytes. The
    stub path gives different vectors for the same two payloads."""
    import zlib

    import numpy as np
    from logging_spark import multimodal as mm
    from logging_spark.functions import png

    img = _gradient(32, 48)
    p1 = png.encode_png(img)
    # same pixels, different bytes: recompress IDAT at level 9
    raw = np.empty((32, 1 + 48 * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(32, 48 * 3)
    import struct
    ihdr = struct.pack(">IIBBBBB", 48, 32, 8, 2, 0, 0, 0)
    p2 = (b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
          + png._chunk(b"IDAT", zlib.compress(raw.tobytes(), 9))
          + png._chunk(b"IEND", b""))
    assert p1 != p2

    df = spark.createDataFrame(
        [(1, "image", bytearray(p1)), (2, "image", bytearray(p2))],
        "media_id long, kind string, payload binary")
    real = {r["media_id"]: list(r["feature"])
            for r in mm.extract_features(df, decode_stub=False).collect()}
    assert real[1] == real[2]
    want = [float(v) for v in png.image_features(img)]
    assert np.allclose(real[1], want)

    fake = {r["media_id"]: list(r["feature"])
            for r in mm.extract_features(df, decode_stub=True).collect()}
    assert fake[1] != fake[2]          # stub is payload-hash based
    assert real[1] != fake[1]          # and differs from real pixels


def test_resize_image_payloads_extreme_aspect_keeps_spatial_axis(spark):
    """A resize that lands on height 1 must stay a 1×W color image:
    squeezing ALL size-1 axes would drop the spatial axis and silently
    re-encode a (W, 3) array as a W×3 grayscale image."""
    import numpy as np
    from logging_spark import multimodal as mm
    from logging_spark.functions import png

    strip = _gradient(2, 64)    # max_side=32 -> (1, 32)
    df = spark.createDataFrame(
        [(1, bytearray(png.encode_png(strip)))], "media_id long, payload binary")
    r = mm.resize_image_payloads(df, max_side=32).collect()[0]
    assert (r["out_width"], r["out_height"]) == (32, 1)
    out = png.decode_png(bytes(r["payload"]))
    assert out.shape == (1, 32, 3)
    ys = (np.arange(1) * 2) // 1
    xs = (np.arange(32) * 64) // 32
    assert (out == strip[ys][:, xs]).all()


def test_resize_image_payloads_real_pixels(spark):
    import numpy as np
    from logging_spark import multimodal as mm
    from logging_spark.functions import png

    big = _gradient(64, 128)    # longest side 128 -> 32 => 16x32
    small = _gradient(8, 10)    # untouched
    df = spark.createDataFrame(
        [(1, bytearray(png.encode_png(big))),
         (2, bytearray(png.encode_png(small)))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in
            mm.resize_image_payloads(df, max_side=32).collect()}
    assert (rows[1]["out_width"], rows[1]["out_height"]) == (32, 16)
    assert (rows[2]["out_width"], rows[2]["out_height"]) == (10, 8)
    out = png.decode_png(bytes(rows[1]["payload"]))
    assert out.shape == (16, 32, 3)
    # nearest-neighbor: every output pixel exists somewhere in the input
    ys = (np.arange(16) * 64) // 16
    xs = (np.arange(32) * 128) // 32
    assert (out == big[ys][:, xs]).all()


# ---------------------------------------------------------------------------
# real WAV codec path (functions/wav.py): audio is no longer stubbed
# ---------------------------------------------------------------------------

def _sine(n=4000, freq=0.01, amp=12000, ch=1):
    import numpy as np
    t = np.arange(n, dtype=np.float64)
    s = np.sin(2 * np.pi * freq * t) * amp
    if ch > 1:
        s = np.stack([s * (i + 1) / ch for i in range(ch)], axis=1)
    return s.astype("int16")


def test_wav_roundtrip_mono_stereo_and_extra_chunks():
    import numpy as np
    from logging_spark.functions import wav

    mono = _sine(1000)
    s, rate = wav.decode_wav(wav.encode_wav(mono, rate=8000))
    assert rate == 8000 and s.shape == (1000, 1)
    assert np.allclose(s[:, 0], mono / 32768.0)

    stereo = _sine(777, ch=2)
    s2, _ = wav.decode_wav(wav.encode_wav(stereo))
    assert s2.shape == (777, 2)
    assert np.allclose(s2, stereo / 32768.0)

    # non-canonical chunk layout (LIST metadata after data) decodes too
    tagged = wav.encode_wav(mono, rate=8000,
                            extra_chunks=[(b"LIST", b"INFOsoftware x")])
    s3, _ = wav.decode_wav(tagged)
    assert np.allclose(s3, s)

    # 8-bit unsigned convention
    import struct
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([128, 255, 0, 128])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + data)
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    s8, r8 = wav.decode_wav(raw)
    assert r8 == 8000
    assert np.allclose(s8[:, 0], [0.0, 127 / 128, -1.0, 0.0])


def test_extract_features_real_samples_not_payload_bytes(spark):
    """Two WAVs with identical SAMPLES but different payload bytes (an
    extra RIFF metadata chunk) must give identical real features —
    proof the decode_stub=False path reads samples, not bytes. The
    stub path hashes bytes and therefore differs."""
    import numpy as np
    from logging_spark import multimodal as mm
    from logging_spark.functions import wav

    samples = _sine(4000, ch=2)
    p1 = wav.encode_wav(samples, rate=16000)
    p2 = wav.encode_wav(samples, rate=16000,
                        extra_chunks=[(b"LIST", b"INFOcomment abc")])
    assert p1 != p2

    df = spark.createDataFrame(
        [(1, "audio", bytearray(p1)), (2, "audio", bytearray(p2))],
        "media_id long, kind string, payload binary")
    real = {r["media_id"]: list(r["feature"])
            for r in mm.extract_features(df, decode_stub=False).collect()}
    assert real[1] == real[2]
    dec, rate = wav.decode_wav(p1)
    want = [float(v) for v in wav.audio_features(dec, rate)]
    assert np.allclose(real[1], want)
    assert real[1][1] > 0          # rms of a sine is nonzero

    fake = {r["media_id"]: list(r["feature"])
            for r in mm.extract_features(df, decode_stub=True).collect()}
    assert fake[1] != fake[2]      # stub is payload-hash based
    assert real[1] != fake[1]


def test_extract_features_mixed_png_wav_batch(spark):
    """One real-decode pass over a batch containing BOTH kinds routes
    each payload to its codec; video (non-PNG/WAV) still raises."""
    from logging_spark import multimodal as mm
    from logging_spark.functions import png, wav
    import pytest

    df = spark.createDataFrame(
        [(1, "image", bytearray(png.encode_png(_gradient(8, 8)))),
         (2, "audio", bytearray(wav.encode_wav(_sine(500))))],
        "media_id long, kind string, payload binary")
    rows = {r["media_id"]: r for r in
            mm.extract_features(df, decode_stub=False).collect()}
    assert len(rows) == 2
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows.values())

    bad = spark.createDataFrame(
        [(3, "video", bytearray(b"\x00\x01notacodec" * 4))],
        "media_id long, kind string, payload binary")
    with pytest.raises(Exception) as exc:
        mm.extract_features(bad, decode_stub=False).collect()
    assert "NotImplementedError" in str(exc.value) or "pyav" in str(exc.value)


def _png(arr):
    from logging_spark.functions import png as png_mod
    return png_mod.encode_png(arr)


def _grad(cls, dent=False):
    import numpy as np
    y, x = np.mgrid[0:24, 0:24]
    g = ((x // (cls + 1) + y // (cls + 2)) % 2) * 255
    arr = np.stack([g, g, g], axis=2).astype("uint8")
    if dent:
        arr[:6, :6, :] = 255 - arr[:6, :6, :]
    return arr


def test_dhash_is_pixel_function_not_payload_function(spark):
    # +1 brightness everywhere: very different PNG bytes, identical
    # gradient relations -> identical dHash (the perceptual property)
    import numpy as np
    from logging_spark.multimodal import image_dhash
    from pyspark.sql import Row
    base = _grad(1)
    bright = np.clip(base.astype("int16") + 1, 0, 255).astype("uint8")
    pa, pb = _png(base), _png(bright)
    assert pa != pb
    df = spark.createDataFrame([Row(media_id=1, payload=bytearray(pa)),
                                Row(media_id=2, payload=bytearray(pb))])
    got = {r["media_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[1] == got[2]


def test_near_dup_images_pairs_same_class_only(spark):
    from logging_spark.multimodal import image_dhash, near_dup_images
    from pyspark.sql import Row
    rows = [Row(media_id=i, payload=bytearray(_png(_grad(i % 2, dent=(i >= 2)))))
            for i in range(4)]
    # ids 0,2 share class 0 (2 dented); ids 1,3 share class 1
    pairs = near_dup_images(image_dhash(spark.createDataFrame(rows)),
                            max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert set(got) == {(0, 2), (1, 3)}
    assert all(h <= 6 for h in got.values())
    # the dent flips at least one bit vs the undented same-class image
    assert any(h > 0 for h in got.values())
