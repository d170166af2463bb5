"""ANN volume probe (round-6 evidence item): 10M-vector corpus with planted
exact twins; IVF and hyperplane-LSH top-k must find each twin (recall vs
the planted ground truth), wall-clock recorded per tier.

  PYTHONPATH=/root/repo python tools/ann_volume_probe.py [n_vectors] [dim] [n_twins]

Deterministic: per-partition PCG64 streams keyed on a fixed seed and the
partition index (partition count is pinned, so the corpus is identical
across runs/hosts). Twin ids are base_id + n_vectors; recall counts a
query whose rank-1 neighbor is exactly its twin.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pgosm_flex_spark.session import get_spark
from pgosm_flex_spark.similarity import ann

N_PARTS = 64
SEED = 0xA11CE


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_twins = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    spark = get_spark("ann-volume-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(batches):
        for b in batches:
            ids = b["id"].to_numpy()
            # one deterministic stream per (seed, first-id) chunk: ids within
            # a batch are contiguous because spark.range splits contiguously
            rng = np.random.Generator(np.random.PCG64([SEED, int(ids[0])]))
            vecs = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    base = (
        spark.range(0, n, 1, N_PARTS)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )
    twins = base.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(twins).persist()
    t0 = time.time()
    n_corpus = corpus.count()
    t_mat = time.time() - t0

    queries = corpus.filter(F.col("vec_id") >= n)  # the planted twins

    out = {"n_corpus": n_corpus, "dim": dim, "n_twins": n_twins,
           "materialize_s": round(t_mat, 1),
           "load_start": round(os.getloadavg()[0], 2)}

    t0 = time.time()
    ivf = ann.ivf_cosine_topk(corpus, queries, k=1).collect()
    out["ivf_wall_s"] = round(time.time() - t0, 1)
    hits = sum(1 for r in ivf if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] - n)
    out["ivf_recall_top1"] = round(hits / n_twins, 4)

    # volume configuration: 16 planes x 8 tables keeps expected bucket load
    # at n/2^16 (~150 rows at 10M) where the 4-plane default - tuned for the
    # 500-2000-row oracle corpora - would put ~n/16 rows in every bucket and
    # the candidate join would explode. Twin recall is unaffected by plane
    # count (identical vectors collide in every table); what more planes
    # trade away is recall of NEAR neighbors, which this probe does not
    # measure.
    t0 = time.time()
    lsh = ann.lsh_cosine_topk(
        corpus, queries, k=1, dim=dim, planes_per_table=16, tables=8
    ).collect()
    out["lsh_wall_s"] = round(time.time() - t0, 1)
    hits = sum(1 for r in lsh if r["rank"] == 1 and r["neighbor_id"] == r["query_id"] - n)
    out["lsh_recall_top1"] = round(hits / n_twins, 4)
    out["load_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
