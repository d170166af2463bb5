"""Deduplication operators for training-data pipelines over ``documents``.

Four tiers, cheapest first — the standard web-corpus dedup ladder:

- :func:`exact_dedup`         — hash-groupBy on full text (one shuffle).
- :func:`jaccard_pairs`       — exact word-set Jaccard via explode+self-join
  (quadratic within shared words; the ``max_doc_freq`` guard drops stop-like
  words so the join key is never a hot cell).
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash+LSH:
  signature via xxhash64 over shingles (native exprs), banded bucket join,
  then exact-Jaccard verification of candidates only.
- :func:`simhash_signatures` / :func:`simhash_pairs` — 64-bit SimHash via a
  vectorized pandas UDF (bit-parallel numpy), near-dup = Hamming ≤ k using
  bit_count on xor.

At corpus scale the LSH band join is the only shuffle whose width matters;
bands are (band_id, band_hash) keys — uniformly distributed by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from pgosm_flex_spark.text.analysis import tokens_col


def exact_dedup(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate groups by exact text: (text group) → keeper id + dup count."""
    return (
        documents.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def word_sets(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return documents.select(
        F.col(id_col), F.array_distinct(tokens_col(F.col(text_col))).alias("words")
    ).withColumn("n_words", F.size("words"))


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold pairs (doc_a < doc_b).

    ``max_doc_freq`` drops words appearing in more than that many docs from
    the *join* (not from the set sizes) — skew guard for stop-like words.

    ``cache``: the word-set stage is consumed by several downstream plan
    branches; caching it avoids re-tokenizing per consumer but PINS the
    cached blocks for the session's lifetime (Spark offers no safe point to
    unpersist inside a lazily-returned plan). Long-lived sessions calling
    this repeatedly over different corpora should pass ``cache=False`` (or
    ``spark.catalog.clearCache()`` between corpora).
    """
    ws = word_sets(documents, text_col, id_col)
    if cache:
        ws = ws.cache()
    exploded = ws.select(id_col, "n_words", F.explode("words").alias("word"))
    if max_doc_freq is not None:
        freq = exploded.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
        exploded = exploded.join(
            F.broadcast(freq.filter(F.col("df") <= max_doc_freq)), "word"
        ).drop("df")
    a = exploded.select(
        F.col(id_col).alias("doc_a"), F.col("n_words").alias("na"), "word"
    )
    b = exploded.select(
        F.col(id_col).alias("doc_b"), F.col("n_words").alias("nb"), "word"
    )
    shared = (
        a.join(b, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def char_ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact character-n-gram Jaccard ≥ threshold pairs (doc_a < doc_b) —
    the same explode+self-join plan as :func:`jaccard_pairs` over distinct
    character n-grams instead of words (robust to word-boundary edits;
    standard web-dedup variant). ``max_doc_freq`` is the stop-gram skew
    guard. Shorter-than-n docs contribute their whole text as one gram."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)))
    grams = F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))
    gs = documents.select(
        F.col(id_col), grams.alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    exploded = gs.select(id_col, "n_grams", F.explode("grams").alias("gram"))
    if max_doc_freq is not None:
        freq = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        exploded = exploded.join(
            F.broadcast(freq.filter(F.col("df") <= max_doc_freq)), "gram"
        ).drop("df")
    a = exploded.select(F.col(id_col).alias("doc_a"), F.col("n_grams").alias("na"), "gram")
    b = exploded.select(F.col(id_col).alias("doc_b"), F.col("n_grams").alias("nb"), "gram")
    shared = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.withColumn(
            "jaccard", F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _shingles(text_col: str, k: int):
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


_MAX_LONG = (1 << 63) - 1


def _perm_consts(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_i, b_i) for the universal-hash permutation family
    h_i(x) = a_i·x + b_i (mod 2^64, numpy wraparound); a_i odd so each map is
    a bijection on Z_2^64. Fixed seed ⇒ identical signatures across runs,
    sessions, and executors (the structural-recall oracle contract)."""
    rng = np.random.Generator(np.random.PCG64(0x5EEDC0DE))
    a = rng.integers(0, 1 << 62, size=num_hashes, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = 64,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) — standard one-hash MinHash:
    each shingle is hashed ONCE with native xxhash64 (JVM, inside the
    shingle transform), and the ``num_hashes`` signature slots come from
    cheap integer permutations a_i·h+b_i (mod 2^64) of that base hash,
    vectorized in numpy over the compact ``array<long>`` column (Arrow
    transfer is the base hashes, never the text).

    Two prior formulations, both measured slower on this host:
    ``transform(seq, i -> array_min(transform(shingles, xxhash64(s, i))))``
    re-evaluates the shingle array num_hashes times (no CSE across lambda
    bodies, ~30×); the single-fold ``aggregate`` + ``zip_with`` evaluates
    shingles once but runs num_hashes interpreted xxhash64(string) calls per
    shingle (Catalyst higher-order exprs don't codegen) — ~1.5 ms/row at 64
    hashes, i.e. the signature stage WAS the whole LSH wall time. Hashing
    the string once and permuting integers is also the textbook
    construction (Broder's single-hash MinHash) and the 100 TB shape: one
    string hash per shingle, then pure SIMD arithmetic.

    When the incoming DataFrame has fewer partitions than the session's
    parallelism (small local parquet = 1 file = 1 partition), it is
    repartitioned so the signature stage engages every core; at scale the
    guard no-ops (input partitions >> cores).
    """
    from pyspark.sql.types import ArrayType

    sc = documents.sparkSession.sparkContext
    if documents.rdd.getNumPartitions() < sc.defaultParallelism:
        documents = documents.repartition(sc.defaultParallelism)

    sh = _shingles(text_col, shingle_k)
    base = F.transform(sh, lambda s: F.xxhash64(s))
    a_c, b_c = _perm_consts(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(bases: pd.Series) -> pd.Series:
        n = len(bases)
        out = np.full((n, num_hashes), _MAX_LONG, dtype=np.int64)
        arrs = [
            np.asarray(x, dtype=np.int64).view(np.uint64)
            for x in bases
            if x is not None and len(x)
        ]
        rows_nz = np.fromiter(
            (i for i, x in enumerate(bases) if x is not None and len(x)),
            dtype=np.int64,
        )
        if len(arrs):
            flat = np.concatenate(arrs)
            lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=len(arrs))
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            res = np.empty((len(arrs), num_hashes), dtype=np.uint64)
            for i in range(num_hashes):
                v = flat * a_c[i] + b_c[i]  # uint64 wraparound is the modulus
                res[:, i] = np.minimum.reduceat(v, offs)
            out[rows_nz] = res.view(np.int64)
        return pd.Series(list(out))

    return documents.select(F.col(id_col), _sig(base).alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    star_threshold: int | None = 1024,
    cache: bool = True,
) -> DataFrame:
    """LSH candidate generation + exact word-Jaccard verification.

    shingle→minhash→band→bucket-join: docs sharing any band bucket become
    candidates; candidates are verified with exact word-set Jaccard.
    ``star_threshold`` bounds the per-bucket candidate blowup
    (operators/buckets.py star expansion — the monster-bucket guard for
    boilerplate duplicated 10^8× at corpus scale); ``None`` = exact
    unbounded join.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # cache: the signature stage (shingle hash + permutation UDF) is the
    # expensive leg and every downstream consumer — both self-join sides
    # plus the bucket-size guard — re-executes its lineage otherwise (same
    # pattern as simhash_pairs). One compact row per doc. The blocks stay
    # pinned for the session (no safe unpersist point inside a lazy plan);
    # repeated calls over different corpora should pass cache=False or
    # clearCache() between corpora.
    sigs = minhash_signatures(documents, num_hashes, shingle_k, text_col, id_col)
    if cache:
        sigs = sigs.cache()
    # one plain (codegen-able) struct per band, band index a literal: hashing
    # the sig elements directly keeps the whole banding inside WholeStageCodegen.
    # The previous formulation — transform(sequence(0, bands-1), lambda with
    # slice + concat_ws + xxhash64) — ran interpreted (Catalyst higher-order
    # exprs), measured ~1.5 ms/row at 64 hashes/16 bands, and the self-join
    # below evaluates banding once per side, doubling it. Buckets are opaque
    # join keys, so the hash-function change is semantics-free: identical
    # signatures still land in identical buckets (the recall guarantee).
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows + i + 1) for i in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    from pgosm_flex_spark.operators.buckets import bucket_pairs

    cands = bucket_pairs(
        banded, id_col, ["band", "bucket"], star_threshold
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    ws = word_sets(documents, text_col, id_col)
    wa = ws.select(F.col(id_col).alias("doc_a"), F.col("words").alias("wa"))
    wb = ws.select(F.col(id_col).alias("doc_b"), F.col("words").alias("wb"))
    verified = (
        cands.join(wa, "doc_a")
        .join(wb, "doc_b")
        .withColumn("shared", F.size(F.array_intersect("wa", "wb")))
        .withColumn(
            "jaccard",
            F.col("shared") / (F.size("wa") + F.size("wb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


@F.pandas_udf(LongType())
def _simhash_bitvote_udf(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash bit-vote over PRE-HASHED tokens (array<long> per row).

    Token hashing happens JVM-side (native xxhash64 in a transform — the
    round-1 version called hashlib per token in a Python loop, directly
    against the no-per-row-Python mandate); this UDF only aggregates sign
    votes, fully vectorized: one flat concat per batch, np.add.reduceat per
    bit plane (64 passes keeps peak memory at one int64 per token)."""
    n = len(hashes)
    out = np.zeros(n, dtype=np.int64)
    lens = np.fromiter(
        (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n
    )
    nz = lens > 0
    if not nz.any():
        return pd.Series(out)
    flat = np.concatenate(
        [np.asarray(h, dtype=np.int64) for h in hashes if h is not None and len(h)]
    ).view(np.uint64)
    nz_lens = lens[nz]
    offsets = np.concatenate([[0], np.cumsum(nz_lens)[:-1]])
    sig = np.zeros(nz_lens.shape[0], dtype=np.uint64)
    for b in range(64):
        bit = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, offsets)
        # majority vote: ones - zeros > 0
        sig |= ((2 * ones - nz_lens) > 0).astype(np.uint64) << np.uint64(b)
    out[nz] = sig.view(np.int64)
    return pd.Series(out)


def simhash_signatures(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    tok_hashes = F.transform(tokens_col(F.col(text_col)), lambda t: F.xxhash64(t))
    return documents.select(
        F.col(id_col), _simhash_bitvote_udf(tok_hashes).alias("simhash")
    )


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    star_threshold: int | None = 1024,
    cache: bool = True,
    collapse_identical: bool = True,
    collapse_eager: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: docs are bucketed by each of the ``64 // prefix_bits``
    simhash slices (pigeonhole: ≤ max_hamming differing bits leave at least
    one slice identical), so the self-join is per-bucket, not all-pairs.
    Identical simhash values collapse to one representative before banding
    (``collapse_identical``) and members arrive as (rep, member, 0) rows —
    the exact monster-bucket defense; ``star_threshold`` backstops buckets
    of DISTINCT values. Semantics, trades, and the all-pairs opt-out:
    operators/buckets.py:hamming_band_pairs.

    ``cache`` pins the signature blocks for the session — see
    :func:`jaccard_pairs` for the trade and the opt-out."""
    from pgosm_flex_spark.operators.buckets import hamming_band_pairs

    sigs = simhash_signatures(documents, text_col, id_col)
    if cache:
        sigs = sigs.cache()
    return hamming_band_pairs(
        sigs,
        id_col,
        "simhash",
        bands=64 // prefix_bits,
        max_hamming=max_hamming,
        star_threshold=star_threshold,
        collapse_identical=collapse_identical,
        collapse_eager=collapse_eager,
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "hamming",
    )
