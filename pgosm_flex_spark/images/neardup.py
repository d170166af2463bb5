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
) -> DataFrame:
    """Pairs of images with Hamming(phash) ≤ ``max_hamming``.

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``, exact and
    complete: the pigeonhole guarantee makes banding lossless for
    ``max_hamming < bands``, so the output equals the all-pairs answer
    over rows with a non-NULL phash (decode failures have no perceptual
    hash to compare — they are filtered out up front, not silently lost
    in the join) — except inside buckets larger than ``star_threshold``,
    which star-expand against the bucket minimum (operators/buckets.py):
    the guard for a placeholder image duplicated 10^8× at corpus scale,
    whose within-bucket join would otherwise emit ~10^16 rows. Identical
    images still form identical duplicate CLUSTERS through the
    representative (how the dedup ladder consumes these pairs);
    ``star_threshold=None`` restores the exact unbounded join.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole needs bands > max_hamming (got bands={bands}, "
            f"max_hamming={max_hamming}): a pair may otherwise differ in "
            "every band and never become a candidate"
        )
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1

    band_structs = F.array(
        *[
            F.struct(
                F.lit(q).alias("b"),
                F.shiftright(F.col(phash_col), q * width)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for q in range(bands)
        ]
    )
    banded = (
        images.filter(F.col(phash_col).isNotNull())
        .select(id_col, phash_col, F.explode(band_structs).alias("bb"))
        .select(id_col, phash_col, "bb.b", "bb.bv")
    )
    from pgosm_flex_spark.operators.buckets import bucket_pairs

    return (
        bucket_pairs(
            banded, id_col, ["b", "bv"], star_threshold,
            payload_cols=[phash_col],
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col(f"{phash_col}_a").bitwiseXOR(F.col(f"{phash_col}_b"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
