"""Monster-duplicate probe for the MinHash-LSH tier — the text twin of the
phash probe recorded in BASELINE.md (§monster-duplicate probe): 2M documents
of which ONE text repeats 500,000× (the boilerplate stand-in for a page
template duplicated 10^8× at corpus scale). The probe's pass condition is
EXACT output: the duplicated text contributes precisely dup_n - 1 star pairs
(jaccard 1.0, every pair anchored at the min-id representative via the
bucket guard's star expansion), and the 1.5M unique documents — 8 tokens
each from a 10^6 vocabulary, expected overlap ≪ the 0.5 Jaccard verify
threshold — contribute zero.

  PYTHONPATH=/root/repo python tools/minhash_probe.py [n] [dup_n]

Prints one JSON line with wall seconds and the verification flags.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dup_n = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    from pyspark.sql import functions as F

    from pgosm_flex_spark.session import get_spark
    from pgosm_flex_spark.text import dedup

    spark = get_spark("minhash-monster-probe")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = "the quick brown boilerplate recurs verbatim across the corpus"
    # unique docs: 8 tokens from a 10^6 vocab, all JVM-side codegen
    uniq_text = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1_000_000))
            )
            for j in range(8)
        ],
    )
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < dup_n, F.lit(boiler)).otherwise(uniq_text).alias("text"),
    )

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).persist()
    n_pairs = pairs.count()
    wall = round(time.time() - t0, 1)

    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("jaccard") == 1.0).cast("int")).alias("n_j1"),
        F.sum((F.col("doc_a") == 0).cast("int")).alias("n_rep0"),
        F.max("doc_b").alias("max_b"),
    ).collect()[0]
    exact = (
        n_pairs == dup_n - 1
        and agg["n_j1"] == dup_n - 1
        and agg["n_rep0"] == dup_n - 1  # every pair anchored at min-id rep 0
        and agg["max_b"] == dup_n - 1  # no unique doc ever paired
    )
    print(
        json.dumps(
            {
                "metric": "minhash_monster_probe",
                "n_docs": n,
                "dup_copies": dup_n,
                "n_pairs": n_pairs,
                "expected_pairs": dup_n - 1,
                "exact_output": exact,
                "wall_s": wall,
                "load1": round(os.getloadavg()[0], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
