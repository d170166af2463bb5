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
) -> DataFrame:
    """Exact word-set Jaccard ≥ threshold pairs (doc_a < doc_b).

    ``max_doc_freq`` drops words appearing in more than that many docs from
    the *join* (not from the set sizes) — skew guard for stop-like words.
    """
    ws = word_sets(documents, text_col, id_col).cache()
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


def minhash_signatures(
    documents: DataFrame,
    num_hashes: int = 64,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) — min over shingles of
    xxhash64(shingle, seed_i), all native exprs.

    Single fold over the shingle array (aggregate + zip_with/least): the
    shingle expression is evaluated once per row. The naive formulation
    ``transform(seq, i -> array_min(transform(shingles, ...)))`` re-evaluates
    the whole shingle array num_hashes times (Catalyst does not CSE across
    lambda bodies) — measured 30× slower.
    """
    sh = _shingles(text_col, shingle_k)
    init = F.array_repeat(F.lit(_MAX_LONG).cast("long"), num_hashes)
    sig = F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), lambda i: F.xxhash64(s, i)),
            lambda a, b: F.least(a, b),
        ),
    )
    return documents.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate generation + exact word-Jaccard verification.

    shingle→minhash→band→bucket-join: docs sharing any band bucket become
    candidates; candidates are verified with exact word-set Jaccard.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, shingle_k, text_col, id_col)
    banded = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws("|", F.slice("sig", b * rows + 1, rows))).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
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
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Blocking: docs are bucketed by each of the 4 16-bit simhash quarters
    (pigeonhole: ≤3 differing bits leave at least one quarter identical), so
    the self-join is per-bucket, not all-pairs."""
    sigs = simhash_signatures(documents, text_col, id_col).cache()
    quarter_structs = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright(F.col("simhash"), q * 16).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
            )
            for q in range(4)
        ]
    )
    quarters = sigs.select(
        id_col, "simhash", F.explode(quarter_structs).alias("qq")
    ).select(id_col, "simhash", "qq.q", "qq.qv")
    a = quarters.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sa"), "q", "qv")
    b = quarters.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sb"), "q", "qv")
    return (
        a.join(b, ["q", "qv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
