"""Single-scan router vs per-table builders: membership must be identical.

This is the lockstep guarantee for ``layer_table_predicates`` — if a builder's
filter chain changes without its predicate twin (or vice versa), the id-set
comparison here fails naming the table.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pgosm_flex_spark import fixtures
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.layers.registry import layer_table_predicates, layerset_layers, _LAYER_TABLES
from pgosm_flex_spark.layers.router import layer_membership, route_layer_ids


@pytest.fixture(scope="module")
def osm(spark):
    df = fixtures.osm_objects_df(spark).cache()
    df.count()
    yield df
    df.unpersist()


def test_router_id_sets_match_builders(spark, osm):
    tables = build_layer_tables(osm, layerset="everything")
    routed = route_layer_ids(osm).cache()
    try:
        got = {
            name: Counter()
            for name in layer_table_predicates()
        }
        for r in routed.collect():
            got[r["table"]][r["osm_id"]] += 1
        assert set(got) == set(tables)
        for name, df in sorted(tables.items()):
            want = Counter(r["osm_id"] for r in df.select("osm_id").collect())
            assert got[name] == want, f"{name}: router membership != builder rows"
    finally:
        routed.unpersist()


def test_router_single_scan_plan(osm):
    """The whole point: one pass. The routed plan must contain exactly one
    scan of the cached source, where the 44-way union contains 44."""
    routed = route_layer_ids(osm)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") == 1, plan

    union = None
    for name, df in build_layer_tables(osm).items():
        ids = df.select("osm_id")
        union = ids if union is None else union.unionByName(ids)
    uplan = union._jdf.queryExecution().executedPlan().toString()
    assert uplan.count("InMemoryTableScan") > 40


def test_layerset_subsets(spark, osm):
    preds = layer_table_predicates("minimal")
    wanted = {
        name for layer in layerset_layers("minimal") for name, _ in _LAYER_TABLES[layer]
    }
    assert set(preds) == wanted
    routed = route_layer_ids(osm, layerset="minimal")
    seen = {r["table"] for r in routed.select("table").distinct().collect()}
    assert seen <= wanted


def test_layer_membership_matches_union(spark, osm):
    member_ids = {
        r["osm_id"]
        for r in osm.filter(layer_membership(osm)).select("osm_id").collect()
    }
    union_ids = set()
    for name, df in build_layer_tables(osm).items():
        union_ids.update(r["osm_id"] for r in df.select("osm_id").collect())
    assert member_ids == union_ids


def test_route_extra_cols(osm):
    routed = route_layer_ids(osm, extra_cols=["geom_type"])
    row = routed.filter(F.col("table") == "place_point").first()
    assert row is not None and row["geom_type"] == "N"
