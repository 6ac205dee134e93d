"""Minimal pure-stdlib PNG codec (zlib + struct + numpy).

This container ships no PIL/ffmpeg, but PNG's core format is simple
enough to implement from the public spec (RFC 2083 / W3C PNG): chunked
container, zlib-compressed scanlines, five byte-filters. That makes the
image leg of the multimodal pipeline REAL — actual pixels in, actual
pixels out — while audio/video decode stays stubbed.

Scope (deliberately minimal, standard-compliant subset):
- encode: 8-bit RGB / RGBA / grayscale, filter 0 rows, one IDAT.
- decode: 8-bit non-interlaced RGB / RGBA / grayscale / gray+alpha,
  all five standard filters (None/Sub/Up/Average/Paeth), multiple
  IDAT chunks, ancillary chunks skipped.

Anything outside that subset (palette images, 16-bit, interlacing)
raises ValueError with a clear message — no silent wrong pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3|4) uint8 array as PNG."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) before each scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * channels)
    return (_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + _chunk(b"IEND", b""))


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _unfilter(raw: np.ndarray, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse the per-scanline byte filters (PNG spec §6). Row loop is
    unavoidable (rows chain), but each row is vectorized numpy."""
    stride = w * channels
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(h):
        f = rows[y, 0]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-chaining
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:  # Paeth
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                line[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into (H, W, channels) uint8."""
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, interlace={interlace})")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type} (palette?)")
    channels = _CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expect = h * (1 + w * channels)
    if raw.size != expect:
        raise ValueError(f"PNG data size {raw.size} != expected {expect}")
    return _unfilter(raw, h, w, channels)


def image_features(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic 16-dim feature vector from real pixels: per-channel
    mean/std (RGB, grayscale broadcast), 2x2 luminance block means,
    luminance quantiles, and normalized dims. The point is not a great
    embedding — it is that the values are a pure function of PIXELS, so
    tests can distinguish real decode from the hash-fake stub."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    rgb = a[:, :, :3] if a.shape[2] >= 3 else np.repeat(a[:, :, :1], 3, axis=2)
    lum = rgb.mean(axis=2)
    h, w = lum.shape
    blocks = [lum[:h // 2 or 1, :w // 2 or 1], lum[:h // 2 or 1, w // 2:],
              lum[h // 2:, :w // 2 or 1], lum[h // 2:, w // 2:]]
    feats = [
        *(rgb[:, :, c].mean() / 255.0 for c in range(3)),
        *(rgb[:, :, c].std() / 255.0 for c in range(3)),
        *(b.mean() / 255.0 if b.size else 0.0 for b in blocks),
        *(np.quantile(lum, q) / 255.0 for q in (0.1, 0.5, 0.9)),
        min(h / 4096.0, 1.0), min(w / 4096.0, 1.0),
        min(arr.shape[2] if arr.ndim == 3 else 1, 4) / 4.0,
    ]
    out = np.asarray(feats[:dim], dtype=np.float32)
    if out.size < dim:
        out = np.pad(out, (0, dim - out.size))
    return out
