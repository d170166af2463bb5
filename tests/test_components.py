"""Connected components (large-star/small-star) — correctness vs a Python
union-find on random graphs, topology edge cases, and the O(log n) round
bound that makes the operator viable at corpus scale."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgosm_flex_spark.operators.components import (
    connected_components,
    dedup_keep_map,
)


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_dict(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    rows = connected_components(df).collect()
    return {r["node"]: r["component"] for r in rows}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(20, 120)
        m = rng.randint(10, 3 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        expected = _union_find_components(edges)
        got = _cc_dict(spark, edges)
        assert got == expected, f"trial {trial}: mismatch"


def test_chain_ring_and_duplicate_edges(spark):
    # chain 0-1-...-9, ring 100..104, duplicate + reversed edges mixed in
    chain = [(i, i + 1) for i in range(9)]
    ring = [(100 + i, 100 + (i + 1) % 5) for i in range(5)]
    noisy = chain + ring + [(5, 4), (1, 0), (103, 102)]
    got = _cc_dict(spark, noisy)
    assert all(got[i] == 0 for i in range(10))
    assert all(got[100 + i] == 100 for i in range(5))


def test_self_loops_and_empty(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(7, 7), (8, 8)], columns=["src", "dst"]).astype("int64")
    )
    assert connected_components(df).count() == 0
    assert connected_components(df.filter(F.lit(False))).count() == 0


def test_long_chain_converges_in_log_rounds(spark):
    # a 256-node chain needs full transitive resolution; the paper's bound is
    # O(log n) alternating rounds — max_rounds=14 would be exceeded by any
    # O(diameter) labeling scheme (256 rounds) but not by star contraction
    edges = [(i, i + 1) for i in range(255)]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    )
    rows = connected_components(df, max_rounds=14).collect()
    assert len(rows) == 256
    assert all(r["component"] == 0 for r in rows)


def test_hub_star_one_hot_key(spark):
    # one node connected to everything (the boilerplate-page shape): the
    # large-star step must spread the hub in round one, and min-id wins
    edges = [(500, i) for i in range(50)]
    got = _cc_dict(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 51


def test_dedup_keep_map(spark):
    # clusters {1,2,3} (chain: 1-2, 2-3) and {10,11}; 99 unpaired (absent)
    pairs = spark.createDataFrame(
        pd.DataFrame([(2, 1), (2, 3), (10, 11)], columns=["doc_a", "doc_b"]).astype(
            "int64"
        )
    )
    out = {
        r["doc_id"]: (r["keep_id"], r["n_in_group"])
        for r in dedup_keep_map(pairs).collect()
    }
    assert out == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        10: (10, 2),
        11: (10, 2),
    }


def test_non_convergence_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(64)], columns=["src", "dst"]).astype(
            "int64"
        )
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)


def test_string_ids_cluster_lexicographically(spark):
    # the image tier's pairs carry string image_ids (images/neardup.py);
    # before round 4's guard these cast to all-NULL longs and silently
    # produced an EMPTY keep map
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": ["img002", "img001", "vimg009"],
                "id_b": ["img001", "img005", "img009"],
            }
        )
    )
    keep = dedup_keep_map(pairs, a_col="id_a", b_col="id_b").toPandas()
    got = dict(zip(keep["doc_id"], keep["keep_id"]))
    assert got == {
        "img001": "img001",
        "img002": "img001",
        "img005": "img001",
        "img009": "img009",
        "vimg009": "img009",
    }
    assert set(keep[keep["doc_id"].str.startswith("v")]["n_in_group"]) == {2}


def test_mixed_id_types_raise(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    )
    with pytest.raises(ValueError, match="integral or both string"):
        connected_components(pairs, src="a", dst="b")
