"""Dependency-free media codecs for the multimodal surface.

Two formats are simple enough to decode with numpy alone — no PIL, no
soundfile — which turns the multimodal plumbing's "real decode" branch
into an actually-exercised path in any environment:

* **PPM (P6)** — the netpbm raw RGB format: ASCII header
  (``P6 <w> <h> <maxval>`` with ``#`` comments) followed by w*h*3 raw
  bytes. Both decode and encode are implemented, so resize round-trips.
* **WAV (PCM16)** — RIFF container, ``fmt `` chunk (must be
  format tag 1 = integer PCM, 16-bit), ``data`` chunk as little-endian
  int16 frames.

Everything returns numpy arrays; failures raise ``ValueError`` so the
callers' corrupt-payload fallback (deterministic stub) still applies.
"""

from __future__ import annotations

import struct

import numpy as np


def ppm_decode(payload: bytes) -> np.ndarray:
    """P6 bytes -> uint8 array of shape (h, w, 3)."""
    if not payload or payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    # tokenize the header: magic, width, height, maxval; '#' starts a comment
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated ppm header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    need = w * h * 3
    raw = payload[pos : pos + need]
    if len(raw) != need:
        raise ValueError("truncated ppm body")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def ppm_encode(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> P6 bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3)")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def ppm_resize_nearest(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resize, deterministic (floor index mapping)."""
    img = ppm_decode(payload)
    h, w = img.shape[:2]
    rows = (np.arange(target_h) * h) // target_h
    cols = (np.arange(target_w) * w) // target_w
    return ppm_encode(img[rows][:, cols])


def ppm_gray_features(payload: bytes, feat_dim: int) -> list[float]:
    """Grayscale strip features matching the PIL branch's shape: luma
    (ITU-R 601 weights, PIL 'L' convention), nearest-resized to
    (feat_dim, 1), scaled to centered [-0.5, 0.5]."""
    img = ppm_decode(payload).astype(np.float64)
    gray = img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    h, w = gray.shape
    cols = (np.arange(feat_dim) * w) // feat_dim
    row = (np.arange(1) * h) // 1
    strip = gray[row][:, cols][0]
    return [float(v) / 255.0 - 0.5 for v in strip]


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes -> (mono float64 array in [-1, 1), sample_rate).
    Multi-channel input keeps channel 0 (mirrors the soundfile branch)."""
    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_channels, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 supported")
    samples = np.frombuffer(data[: (len(data) // 2) * 2], dtype="<i2")
    if n_channels > 1:
        samples = samples[:: n_channels]
    return samples.astype(np.float64) / 32768.0, rate


def wav_encode(mono: np.ndarray, rate: int) -> bytes:
    """Mono float array in [-1, 1) -> PCM16 WAV bytes (test fixtures)."""
    pcm = np.clip(np.asarray(mono, dtype=np.float64), -1.0, 1.0 - 1.0 / 32768)
    raw = (pcm * 32768.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_pooled_features(payload: bytes, feat_dim: int) -> list[float]:
    """Mean-pooled windows of channel 0 — identical pooling arithmetic to
    the soundfile branch in multimodal._decode_features."""
    mono, _rate = wav_decode(payload)
    if len(mono) == 0:
        return [0.0] * feat_dim
    step = max(1, len(mono) // feat_dim)
    return [
        float(mono[i * step : (i + 1) * step].mean()) if i * step < len(mono) else 0.0
        for i in range(feat_dim)
    ]
