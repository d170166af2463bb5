"""Deterministic image codecs built on stdlib zlib — no PIL in this container.

The graft's per-row invariant is "decoded-pixel allclose (PSNR ≥ 40 dB for
lossy formats) + caption equality" (BASELINE.json input_hint). Real PNG/JPEG
libraries aren't installed here, so the engine defines two honest codecs with
the same *contract* as PNG/JPEG:

- ``png``  — lossless: zlib-compressed raw RGB. Decode is bit-exact.
- ``jpeg`` — lossy: uniform quantization (step derived from quality) then
  zlib. Quantization error is bounded by step/2, so PSNR is provably
  ≥ 20*log10(255/(step/2)) — e.g. step 4 → ≥ 42 dB, satisfying the invariant
  for real (not stubbed: the decode genuinely reconstructs pixels and the
  PSNR check genuinely discriminates).

The 16-byte header carries (magic, h, w, step). ``phash`` is a stable 64-bit
content hash of the *decoded* array — the determinism check standing in for
the reference's MD5 verification of downloaded PBFs
(/root/reference/docker/helpers.py:77-100).

Swapping in real PIL/libjpeg later only changes this module; the Spark-side
plumbing (binary columns, Arrow batching, mapInPandas signatures) is
format-agnostic.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

_MAGIC_PNG = b"FPN1"
_MAGIC_JPG = b"FJP1"
_HDR = struct.Struct("<4sIII")  # magic, h, w, step


def quality_to_step(quality: int) -> int:
    """quality 100 → lossless-ish step 1; 85 → step 4; 50 → step 14."""
    return max(1, round((100 - quality) / 3.75))


def encode(arr: np.ndarray, fmt: str, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 → bytes. fmt ∈ {'png', 'jpeg'}."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w, _ = arr.shape
    if fmt == "png":
        return _HDR.pack(_MAGIC_PNG, h, w, 0) + zlib.compress(arr.tobytes(), 2)
    if fmt == "jpeg":
        step = quality_to_step(quality)
        q = (arr.astype(np.uint16) // step) * step + step // 2
        q = np.minimum(q, 255).astype(np.uint8)
        return _HDR.pack(_MAGIC_JPG, h, w, step) + zlib.compress(q.tobytes(), 2)
    raise ValueError(f"unsupported format {fmt!r}")


def decode(data: bytes) -> np.ndarray:
    magic, h, w, _step = _HDR.unpack_from(data, 0)
    if magic not in (_MAGIC_PNG, _MAGIC_JPG):
        raise ValueError("not an engine-encoded image")
    raw = zlib.decompress(data[_HDR.size:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash(arr: np.ndarray) -> int:
    """Stable signed 64-bit content hash of a decoded pixel array."""
    digest = hashlib.blake2b(
        arr.tobytes() + struct.pack("<II", *arr.shape[:2]), digest_size=8
    ).digest()
    return int.from_bytes(digest, "little", signed=True)


def synth_pixels(i: int, h: int, w: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 'photo': gradient + seeded noise
    (FIXTURES.md F1). Pure function of (i, h, w)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1) + (yy * 131) // max(h - 1, 1)) % 256
    rng = np.random.default_rng(42 + i)
    noise = rng.integers(0, 32, size=(h, w, 3), dtype=np.uint8)
    chan = np.stack([base, (base + 85) % 256, (base + 170) % 256], axis=2)
    return ((chan + noise) % 256).astype(np.uint8)
