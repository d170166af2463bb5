"""Multimodal (image) operators over opaque binary columns.

Spark-side plumbing is real and tested: binary columns + typed metadata,
Arrow-batched ``mapInPandas`` with bounded batch sizes, deterministic
outputs. The pixel work uses the engine codecs (zlib-based; see
images/codec.py) — swapping in PIL/libjpeg changes only the codec module.

Audio/video decode are stubbed behind NotImplementedError with the same
operator signatures, as those libraries are absent in this container.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pgosm_flex_spark.images import codec

DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_lum double, phash long, "
    "phash_ok boolean, decode_ok boolean"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image; emit per-row stats + phash verification (the
    determinism check standing in for the reference's MD5 verify,
    /root/reference/docker/helpers.py:77-100)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                try:
                    arr = codec.decode(bytes(r.bytes))
                    ph = codec.phash(arr)
                    rows.append(
                        (r.image_id, arr.shape[1], arr.shape[0], r.fmt,
                         float(arr.mean()), ph, bool(ph == r.phash), True)
                    )
                except Exception:
                    rows.append((r.image_id, None, None, r.fmt, None, None, False, False))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "fmt", "mean_lum", "phash", "phash_ok", "decode_ok"],
            )

    return images.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        run, schema=DECODE_STATS_SCHEMA
    )


def _resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w, _ = arr.shape
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize(images: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize; re-encodes with the row's own format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples(index=False):
                arr = _resize_nearest(codec.decode(bytes(r.bytes)), out_h, out_w)
                rows.append((r.image_id, codec.encode(arr, r.fmt), out_w, out_h, r.fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "image_id string, features array<float>"


def extract_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Cheap deterministic visual features: grid×grid mean-RGB pooling →
    3·grid² float vector (the decode→feature-extract stage of a multimodal
    pipeline; a real model swap changes only this function body)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, feats = [], []
            for r in b.itertuples(index=False):
                arr = codec.decode(bytes(r.bytes)).astype(np.float32)
                h, w, _ = arr.shape
                ys = np.linspace(0, h, grid + 1, dtype=int)
                xs = np.linspace(0, w, grid + 1, dtype=int)
                v = [
                    arr[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1))
                    for i in range(grid)
                    for j in range(grid)
                ]
                ids.append(r.image_id)
                feats.append(np.concatenate(v).astype(np.float32) / 255.0)
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return images.select("image_id", "bytes").mapInPandas(run, schema=FEATURES_SCHEMA)


def decode_audio(rows: DataFrame) -> DataFrame:
    """Audio decode — library absent in this container; plumbing contract
    mirrors decode_stats (binary column in, typed stats out)."""
    raise NotImplementedError(
        "audio decode requires an audio codec library not present in this "
        "environment; the mapInPandas plumbing contract matches decode_stats"
    )


def sample_video_frames(rows: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — library absent; see decode_audio."""
    raise NotImplementedError(
        "video decode requires a video codec library not present in this "
        "environment; the mapInPandas plumbing contract matches decode_stats"
    )
