"""Perceptual-hash near-duplicate image detection — the image-side member
of the dedup ladder (text: text/dedup.py exact → MinHash-LSH → SimHash).

Training-data pipelines dedup images by perceptual hash (phash) Hamming
distance: re-encoded, resized, or lightly edited copies of one image keep
phashes within a few bits of each other while distinct images are ~32 bits
apart.  The all-pairs comparison is quadratic, so candidates are generated
by pigeonhole banding — split the 64-bit phash into ``bands`` equal slices;
any pair with Hamming distance ≤ ``max_hamming`` < ``bands`` must agree
exactly on at least one slice — and the exact Hamming check runs on
bucket-mates only.  Identical shape to SimHash text blocking
(text/dedup.py:simhash_pairs) and to the reference engine's
index-accelerated joins (GiST prefilter + exact refine): a banded equi-join
is one shuffle keyed (band, value), never an all-pairs product, so it holds
at 10^12 images.

Everything is native Column algebra (shift/mask/xor/bit_count) — zero
Python in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 2,
    id_col: str = "image_id",
    phash_col: str = "phash",
    bands: int = 4,
    star_threshold: int | None = 1024,
    collapse_identical: bool = True,
    collapse_eager: bool = True,
) -> DataFrame:
    """Pairs of images with Hamming(phash) ≤ ``max_hamming``.

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``: the pigeonhole
    guarantee makes banding lossless for ``max_hamming < bands``, over rows
    with a non-NULL phash (decode failures have no perceptual hash to
    compare — they are filtered out up front, not silently lost in the
    join). Identical phash values collapse to one representative before
    banding (``collapse_identical``) and arrive as (rep, member, 0) rows —
    the exact defense for a placeholder image duplicated 10^8× at corpus
    scale; ``star_threshold`` backstops buckets of DISTINCT values.
    Semantics, trades, and the all-pairs opt-out:
    operators/buckets.py:hamming_band_pairs.
    """
    from pgosm_flex_spark.operators.buckets import hamming_band_pairs

    return hamming_band_pairs(
        images,
        id_col,
        phash_col,
        bands=bands,
        max_hamming=max_hamming,
        star_threshold=star_threshold,
        collapse_identical=collapse_identical,
        collapse_eager=collapse_eager,
    )
