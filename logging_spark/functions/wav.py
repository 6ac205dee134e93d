"""Pure-stdlib WAV (RIFF/PCM) codec + waveform features.

The audio analog of functions/png.py: `decode_stub=False` in
multimodal.extract_features turns WAV payloads into features derived
from actual SAMPLES (not payload bytes), with zero dependencies beyond
the stdlib `struct`/`wave`-level format handling and numpy.

Scope: integer PCM (8/16/32-bit) mono or multi-channel, the format
every log/telemetry pipeline actually archives. Compressed codecs
(mp3/opus/aac) legitimately need external libs and stay stubbed —
see multimodal.py.

Format per the public RIFF/WAVE spec (also mirrored by Python's
`wave` module, which this codec intentionally does not use so that
non-canonical-but-valid chunk layouts — extra LIST/INFO chunks, odd
chunk order — decode too; `wave` rejects several of those).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16_000,
               extra_chunks: list[tuple[bytes, bytes]] | None = None) -> bytes:
    """Canonical 16-bit PCM WAV bytes from an int16 array of shape
    (n,) or (n, channels). `extra_chunks` appends arbitrary (tag, body)
    RIFF chunks after the data — used by tests to build byte-different
    payloads carrying IDENTICAL samples (the samples-not-payload proof).
    """
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = [(b"fmt ", fmt), (b"data", data)] + list(extra_chunks or [])
    body = b"WAVE"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 in [-1, 1] of shape (n, channels), sample_rate)
    from integer-PCM WAV bytes. Walks the RIFF chunk list, so payloads
    with extra metadata chunks decode identically to canonical ones."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    fmt = raw = None
    while pos + 8 <= min(end, len(data)):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            raw = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in _PCM_DTYPES:
        raise ValueError(f"only integer PCM supported (fmt={audio_fmt}, bits={bits})")
    s = np.frombuffer(raw, dtype=_PCM_DTYPES[bits])
    s = s[: (len(s) // ch) * ch].reshape(-1, ch).astype(np.float64)
    if bits == 8:  # unsigned convention
        s = (s - 128.0) / 128.0
    else:
        s = s / float(2 ** (bits - 1))
    return s, rate


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Deterministic feature vector from real samples (the audio twin
    of png.image_features): duration, RMS, peak, zero-crossing rate,
    per-half RMS, and 8 log-energy FFT bands of the mono mix. Not a
    great embedding by design — the point is that every value is a
    pure function of SAMPLES, so tests can distinguish real decode
    from the hash-fake stub."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt(np.mean(mono ** 2)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    half = n // 2 or 1
    spec = np.abs(np.fft.rfft(mono))
    bands = np.array_split(spec, 8)
    feats = [
        min(n / rate / 600.0, 1.0),  # duration, capped at 10 min
        rms,
        float(np.abs(mono).max()),
        zcr,
        float(np.sqrt(np.mean(mono[:half] ** 2))),
        float(np.sqrt(np.mean(mono[half:] ** 2))) if n > half else 0.0,
        min((samples.shape[1] if samples.ndim == 2 else 1) / 8.0, 1.0),
        min(rate / 96_000.0, 1.0),
        *(float(np.log1p(np.mean(b ** 2))) for b in bands),
    ]
    out = np.asarray(feats[:dim], dtype=np.float32)
    if out.size < dim:
        out = np.pad(out, (0, dim - out.size))
    return out
