from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pgosm_flex_spark.geometry import kernels, wkb
from pgosm_flex_spark.operators import routing


def line(coords):
    return wkb.encode_linestring(np.array(coords, dtype=np.float64))


@pytest.fixture(scope="module")
def grid_roads(spark):
    """3 horizontal + 3 vertical streets crossing at 9 known points."""
    rows = []
    for k in range(3):
        y = 38.80 + k * 0.01
        x = -77.10 + k * 0.01
        rows.append((k, line([[-77.11, y], [-77.07, y]]), 0, 0, 30.0, "residential"))
        rows.append((10 + k, line([[x, 38.79], [x, 38.83]]), 0, 0, None, "primary"))
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    ).cache()


def _src_vertex(vertices) -> int:
    # pick the SW-most vertex via collect(): Row values stay Python ints.
    # (toPandas here is a trap: if the Arrow conversion fails under memory
    # pressure, the silent legacy fallback returns vertex_id as float64 and
    # truncates 64-bit xxhash64 ids — an id that exists in no edge row)
    return int(
        vertices.orderBy("lon", "lat").select("vertex_id").first()["vertex_id"]
    )


def test_routing_network_grid(spark, grid_roads):
    edges, vertices = routing.build_routing_network(grid_roads)
    e = edges.toPandas()
    v = vertices.toPandas()
    # each street crosses 3 others -> 3 blades -> 4 segments; 6 streets * 4 = 24
    assert len(e) == 24
    # vertices: 9 intersections (degree 4) + 12 endpoints (degree 1)
    assert len(v) == 21
    deg = v.groupby("degree").size().to_dict()
    assert deg == {1: 12, 4: 9}
    # total length preserved per street
    for osm_id, grp in e.groupby("osm_id"):
        total = grp["length_m"].sum()
        orig = grid_roads.filter(F.col("osm_id") == osm_id).collect()[0]["geom_wkb"]
        exp = kernels.line_length_m(wkb.decode(bytes(orig)))
        assert total == pytest.approx(exp, abs=1e-3)  # blade quantization ~1 cm -> sub-mm length effect
    # deterministic edge ids: rebuild -> same ids
    e2 = routing.build_routing_network(grid_roads)[0].toPandas()
    assert set(e["edge_id"]) == set(e2["edge_id"])


def test_water_routing_network(spark, grid_roads):
    """Waterway variant (routing_functions.sql:417-520): same split pipeline,
    length-only costs, strictly directed (reverse = -cost_length), and
    name/tunnel/bridge replicated onto every split edge."""
    water = (
        grid_roads.drop("oneway", "maxspeed")
        .withColumn("name", F.concat(F.lit("w-"), F.col("osm_id")))
        .withColumn("tunnel", F.lit(None).cast("string"))
        .withColumn("bridge", F.when(F.col("osm_id") == 0, F.lit("yes")))
    )
    edges, vertices = routing.build_water_routing_network(water)
    e = edges.toPandas()
    assert len(e) == 24
    assert vertices.count() == 21
    # strictly directed: forward = +cost_length, reverse = -cost_length
    assert (e["cost_length_forward"] == e["cost_length"]).all()
    assert (e["cost_length_reverse"] == -e["cost_length"]).all()
    assert (e["cost_length"] > 0).all()
    # attrs replicate onto every split piece, no join-back
    assert (e["name"] == "w-" + e["osm_id"].astype(str)).all()
    assert (e.loc[e["osm_id"] == 0, "bridge"] == "yes").all()
    assert e.loc[e["osm_id"] != 0, "bridge"].isna().all()


def test_layer_separation(spark):
    """Edges on different layers (bridge over road) must not split."""
    rows = [
        (1, line([[-77.10, 38.80], [-77.06, 38.80]]), 0, 0, None, "residential"),
        (2, line([[-77.08, 38.78], [-77.08, 38.82]]), 1, 0, None, "motorway"),  # layer 1
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"])
    )
    edges, _ = routing.build_routing_network(df)
    assert edges.count() == 2  # no splits across layers


def test_oneway_costs(spark):
    rows = [
        (1, line([[-77.10, 38.80], [-77.09, 38.80]]), 0, 1, 50.0, "primary"),
        (2, line([[-77.10, 38.81], [-77.09, 38.81]]), 0, -1, 50.0, "primary"),
        (3, line([[-77.10, 38.82], [-77.09, 38.82]]), 0, 0, 50.0, "primary"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"])
    )
    e = routing.build_routing_network(df)[0].toPandas().set_index("osm_id")
    assert e.loc[1, "cost_length_forward"] > 0 and e.loc[1, "cost_length_reverse"] < 0
    assert e.loc[2, "cost_length_forward"] < 0 and e.loc[2, "cost_length_reverse"] > 0
    assert e.loc[3, "cost_length_forward"] > 0 and e.loc[3, "cost_length_reverse"] > 0
    # travel time = length / (50 km/h): 3.6/50 s per meter
    assert e.loc[1, "cost_seconds_forward"] == pytest.approx(
        e.loc[1, "length_m"] * 3.6 / 50.0
    )
    assert e.loc[1, "cost_seconds_reverse"] == -1.0


def test_lookup_default_maxspeed(spark):
    rows = [(1, line([[-77.10, 38.80], [-77.09, 38.80]]), 0, 0, None, "motorway")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"])
    )
    lookup = spark.createDataFrame(
        pd.DataFrame({"osm_type": ["motorway"], "maxspeed": [120.0]})
    )
    e = routing.build_routing_network(df, lookup=lookup)[0].collect()[0]
    assert e["maxspeed_final"] == 120.0


def test_multiline_explode(spark):
    ml = wkb.encode_multilinestring(
        [
            np.array([[-77.10, 38.80], [-77.09, 38.80]]),
            np.array([[-77.08, 38.80], [-77.07, 38.80]]),
        ]
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            [(1, ml, 0, 0, None, "path")],
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    )
    edges, _ = routing.build_routing_network(df)
    assert edges.count() == 2


def test_linemerge_chain_and_junction():
    A = np.array([[0.0, 0.0], [1.0, 0.0]])
    B = np.array([[1.0, 0.0], [2.0, 0.0]])
    Brev = B[::-1]
    C = np.array([[2.0, 0.0], [3.0, 0.0]])
    # simple chain merges into one line
    merged = kernels.linemerge([A, B, C])
    assert len(merged) == 1
    np.testing.assert_allclose(
        merged[0], [[0, 0], [1, 0], [2, 0], [3, 0]]
    )
    # a reversed middle part still merges (ST_LineMerge reorients)
    merged = kernels.linemerge([A, Brev, C])
    assert len(merged) == 1 and merged[0].shape[0] == 4
    # a 3-way junction does not merge at the junction node
    D = np.array([[1.0, 0.0], [1.0, 1.0]])
    merged = kernels.linemerge([A, B, D])
    assert sorted(m.shape[0] for m in merged) in ([2, 3], [2, 2, 2])
    # touching 2-part ring closes into one ring linestring
    E = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    Fp = np.array([[1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
    merged = kernels.linemerge([E, Fp])
    assert len(merged) == 1
    np.testing.assert_allclose(merged[0][0], merged[0][-1])


def test_explode_lines_dissolves_touching_parts(spark):
    # a multilinestring whose 2 parts touch: ST_LineMerge then dump -> ONE
    # part, so a mid-blade splits it into 2 edges, not 3
    parts = [
        np.array([[-77.10, 38.80], [-77.08, 38.80]]),
        np.array([[-77.08, 38.80], [-77.06, 38.80]]),
    ]
    mls = wkb.encode_multilinestring(parts)
    crossing = line([[-77.09, 38.79], [-77.09, 38.81]])
    roads = spark.createDataFrame(
        pd.DataFrame(
            [(1, mls, 0, 0, None, "residential"),
             (2, crossing, 0, 0, None, "residential")],
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    )
    exploded = routing.explode_lines(roads).toPandas()
    assert len(exploded[exploded.osm_id == 1]) == 1  # dissolved into one part
    edges, _ = routing.build_routing_network(roads)
    e = edges.toPandas()
    # merged way split once at the crossing -> 2 edges; crossing way -> 2
    assert len(e[e.osm_id == 1]) == 2
    assert len(e[e.osm_id == 2]) == 2


def test_oversized_line_falls_back_to_coarse_cover(spark):
    # a 30-degree way overflows the res-12 cell budget; it must not crash and
    # must still find its crossing with a normal-sized way
    long_way = line([[-100.0, 40.0], [-70.0, 40.0]])
    short_way = line([[-77.0, 39.0], [-77.0, 41.0]])
    roads = spark.createDataFrame(
        pd.DataFrame(
            [(1, long_way, 0, 0, None, "primary"),
             (2, short_way, 0, 0, None, "primary")],
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    )
    edges, vertices = routing.build_routing_network(roads)
    e = edges.toPandas()
    assert len(e[e.osm_id == 1]) == 2  # split at the single crossing
    assert len(e[e.osm_id == 2]) == 2
    assert vertices.filter(F.col("degree") == 4).count() == 1


def test_two_oversized_lines_cross_at_fallback(spark):
    # both ways overflow the res-12 budget: they are primary at the fallback
    # level and must meet in the primary-primary join (the mixed
    # oversized-x-ancestor join only covers oversized-x-normal pairs)
    a = line([[-100.0, 40.0], [-70.0, 40.0]])
    b = line([[-85.0, 30.0], [-85.0, 50.0]])
    roads = spark.createDataFrame(
        pd.DataFrame(
            [(1, a, 0, 0, None, "primary"), (2, b, 0, 0, None, "primary")],
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    )
    edges, vertices = routing.build_routing_network(roads)
    e = edges.toPandas()
    assert len(e[e.osm_id == 1]) == 2
    assert len(e[e.osm_id == 2]) == 2
    assert vertices.filter(F.col("degree") == 4).count() == 1


def test_oneway_attrs_not_broadcast_joined(spark, grid_roads):
    # plan audit: the only EXPLICIT broadcast hint in the edge plan is the
    # 25-row pgosm.road lookup (AQE may still pick broadcast strategies for
    # tiny test inputs on its own — those disappear at scale; a hard hint on
    # a road-sized side would not)
    from pgosm_flex_spark.sources.lookup import pgosm_road

    edges, _ = routing.build_routing_network(grid_roads, lookup=pgosm_road(spark))
    # hint audit on the ANALYZED plan — the optimizer folds ResolvedHint into
    # join nodes, so counting on the optimized plan is vacuously 0. The only
    # hinted sides are the tiny oversized-line set (whose subtree the blades
    # plan references twice) and, with a lookup, the 25-row pgosm.road seed:
    # adding the lookup must add EXACTLY ONE hint — a road-sized broadcast
    # would add more
    analyzed = edges._jdf.queryExecution().analyzed().toString()
    edges_nolk, _ = routing.build_routing_network(grid_roads)
    nolk = edges_nolk._jdf.queryExecution().analyzed().toString()
    assert nolk.count("ResolvedHint") <= 2  # oversized side only (≤2 prints)
    assert analyzed.count("ResolvedHint") == nolk.count("ResolvedHint") + 1


def test_shortest_paths_khop_grid(spark, grid_roads):
    # 3x3 grid, all costs defined; distances from a corner-street endpoint
    # must match a numpy Dijkstra oracle over the same edge table
    import heapq

    edges, vertices = routing.build_routing_network(grid_roads)
    e = edges.toPandas()
    src = _src_vertex(vertices)
    dist = routing.shortest_paths_khop(edges, src, k_hops=12).toPandas()

    adj = {}
    for r in e.itertuples(index=False):
        w = r.cost_seconds_forward
        if w >= 0:
            adj.setdefault(r.source_vertex, []).append((r.target_vertex, w))
        wr = r.cost_seconds_reverse
        if wr >= 0:
            adj.setdefault(r.target_vertex, []).append((r.source_vertex, wr))
    best = {int(src): 0.0}
    heap = [(0.0, int(src))]
    while heap:
        d, u = heapq.heappop(heap)
        if d > best.get(u, float("inf")):
            continue
        for nxt, w in adj.get(u, []):
            nd = d + w
            if nd < best.get(nxt, float("inf")):
                best[nxt] = nd
                heapq.heappush(heap, (nd, nxt))
    got = {int(r.vertex_id): r.dist for r in dist.itertuples(index=False)}
    assert set(got) == set(best)
    for vid, d in best.items():
        assert abs(got[vid] - d) < 1e-9, vid


def test_shortest_paths_convergence_matches_dijkstra(spark, grid_roads):
    # unbounded variant (pgr_dijkstra analog): iterates until a round changes
    # no distance, so results must equal both the numpy Dijkstra oracle and
    # the bounded DP with k >= diameter
    import heapq

    edges, vertices = routing.build_routing_network(grid_roads)
    src = _src_vertex(vertices)
    conv = routing.shortest_paths(edges, src).toPandas()
    bounded = routing.shortest_paths_khop(edges, src, k_hops=12).toPandas()

    e = edges.toPandas()
    adj = {}
    for r in e.itertuples(index=False):
        if r.cost_seconds_forward >= 0:
            adj.setdefault(r.source_vertex, []).append(
                (r.target_vertex, r.cost_seconds_forward)
            )
        if r.cost_seconds_reverse >= 0:
            adj.setdefault(r.target_vertex, []).append(
                (r.source_vertex, r.cost_seconds_reverse)
            )
    best = {src: 0.0}
    heap = [(0.0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > best.get(u, float("inf")):
            continue
        for nxt, w in adj.get(u, []):
            nd = d + w
            if nd < best.get(nxt, float("inf")):
                best[nxt] = nd
                heapq.heappush(heap, (nd, nxt))

    got = {int(r.vertex_id): r.dist for r in conv.itertuples(index=False)}
    assert set(got) == set(best)
    for vid, d in best.items():
        assert abs(got[vid] - d) < 1e-9, vid
    kb = {int(r.vertex_id): r.dist for r in bounded.itertuples(index=False)}
    assert got == kb


def test_route_paths_reconstruction(spark, grid_roads):
    # with_pred=True + route_paths must yield, for EVERY reached vertex, a
    # route that (a) starts at the source and ends at the vertex, (b) walks
    # only real directed edges whose costs sum to the optimal Dijkstra
    # distance, (c) has hops == len(edge_ids) == len(vertex_ids) - 1 — i.e.
    # the reference rollup's vertex_ids/edge_ids arrays
    # (routing_functions.sql:586-588) are reconstructable and optimal
    import heapq

    edges, vertices = routing.build_routing_network(grid_roads)
    src = _src_vertex(vertices)
    pred = routing.shortest_paths(edges, src, with_pred=True)
    paths = routing.route_paths(pred, src).toPandas()

    e = edges.toPandas()
    cost = {}
    for r in e.itertuples(index=False):
        if r.cost_seconds_forward >= 0:
            cost[(r.source_vertex, r.target_vertex, r.edge_id)] = r.cost_seconds_forward
        if r.cost_seconds_reverse >= 0:
            cost[(r.target_vertex, r.source_vertex, r.edge_id)] = r.cost_seconds_reverse
    adj = {}
    for (u, w_, _), c in cost.items():
        adj.setdefault(u, []).append((w_, c))
    best = {src: 0.0}
    heap = [(0.0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > best.get(u, float("inf")):
            continue
        for nxt, w in adj.get(u, []):
            nd = d + w
            if nd < best.get(nxt, float("inf")):
                best[nxt] = nd
                heapq.heappush(heap, (nd, nxt))

    assert set(paths["vertex_id"].astype(int)) == set(best)
    for r in paths.itertuples(index=False):
        vids = list(r.vertex_ids)
        eids = list(r.edge_ids)
        assert vids[0] == src
        assert vids[-1] == r.vertex_id
        assert len(eids) == len(vids) - 1 == r.hops
        walked = 0.0
        for u, w_, eid in zip(vids[:-1], vids[1:], eids):
            assert (u, w_, eid) in cost, (u, w_, eid)
            walked += cost[(u, w_, eid)]
        assert abs(walked - best[int(r.vertex_id)]) < 1e-9
        assert abs(r.dist - walked) < 1e-9
    # the source's own route is the degenerate [src], []
    srow = paths[paths["vertex_id"] == src].iloc[0]
    assert list(srow.vertex_ids) == [src] and list(srow.edge_ids) == []


def test_shortest_paths_minimal_edges_contract(spark):
    # the default with_pred=False path must accept a minimal frame without
    # edge_id (pre-round-4 contract); with_pred=True is the variant that
    # requires it
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "source_vertex": [0, 1, 0],
                "target_vertex": [1, 2, 2],
                "cost_seconds_forward": [10.0, 5.0, 30.0],
                "cost_seconds_reverse": [10.0, 5.0, 30.0],
            }
        )
    )
    got = {
        int(r["vertex_id"]): r["dist"]
        for r in routing.shortest_paths(edges, 0).collect()
    }
    assert got == {0: 0.0, 1: 10.0, 2: 15.0}


def test_route_paths_rejects_prefiltered_pred(spark, grid_roads):
    # dropping an interior vertex from the predecessor frontier must fail
    # loud: a silent inner-join drop would return a SUBSET of routes
    edges, vertices = routing.build_routing_network(grid_roads)
    src = _src_vertex(vertices)
    pred = routing.shortest_paths(edges, src, with_pred=True)
    # a vertex that IS another row's predecessor — removing it guarantees
    # some surviving row's chain dangles
    interior = (
        pred.filter((F.col("pred_vertex") != src) & (F.col("pred_vertex") != -1))
        .limit(1)
        .collect()[0]["pred_vertex"]
    )
    with pytest.raises(ValueError, match="pred_vertex is absent"):
        routing.route_paths(
            pred.filter(F.col("vertex_id") != interior), src
        ).collect()


def test_blade_chunking_matches_unchunked(spark, grid_roads, monkeypatch):
    """The per-kernel-call combo cap (OOM guard for dense Arrow batches)
    must not change the blade set: CAP=1 forces one pair per kernel call —
    every chunk boundary the greedy grouping can produce."""
    base = routing.edge_intersection_blades(
        grid_roads, id_col="osm_id"
    ).toPandas()
    monkeypatch.setattr(routing, "_BLADE_COMBO_CAP", 1)
    chunked = routing.edge_intersection_blades(
        grid_roads, id_col="osm_id"
    ).toPandas()
    key = ["edge_id", "blade_x", "blade_y"]
    a = base.sort_values(key).reset_index(drop=True)
    b = chunked.sort_values(key).reset_index(drop=True)
    assert len(a) == 18  # 9 crossings x 2 edges receiving each blade
    pd.testing.assert_frame_equal(a, b)


def test_diagonal_crossings_split_and_connect(spark):
    """Non-axis-aligned roads: the quantized blade sits up to ~7e-8 deg off
    the true line, so the split tolerance must absorb quantization — and
    both edges must cut at the SAME on-grid blade coordinate so their
    junction quantizes to one shared vertex. A 1e-9 tolerance silently
    dropped ~98% of diagonal blades (axis-aligned fixtures hid it: their
    quantized blades land back on the line exactly), leaving the routing
    graph disconnected at nearly every diagonal intersection."""
    rng = np.random.default_rng(11)
    rows = []
    # 6 random diagonal chords through a small disc: every pair crosses
    # inside at a generic (non-grid) point
    center = np.array([-77.05, 38.85])
    for i in range(6):
        ang = np.pi * (i + rng.uniform(0.1, 0.4)) / 6
        d = np.array([np.cos(ang), np.sin(ang)])
        # perpendicular offset so no two chords share a crossing point
        perp = np.array([-d[1], d[0]]) * rng.uniform(-0.004, 0.004)
        c = center + perp
        rows.append(
            (i, line([list(c - 0.02 * d), list(c + 0.02 * d)]),
             0, 0, 30.0, "residential")
        )
    roads = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["osm_id", "geom_wkb", "layer", "oneway", "maxspeed", "osm_type"],
        )
    )
    edges, vertices = routing.build_routing_network(roads)
    e = edges.toPandas()
    v = vertices.toPandas()
    # brute-force expected crossings per road
    geoms = {
        i: wkb.decode(bytes(r[1]))
        for i, r in enumerate(rows)
    }
    blades = {i: set() for i in geoms}  # quantized, like the operator
    for i in geoms:
        for j in geoms:
            if i < j:
                pts, _ = kernels.segment_pair_intersections(
                    geoms[i].rings[0][:-1], geoms[i].rings[0][1:],
                    geoms[j].rings[0][:-1], geoms[j].rings[0][1:],
                )
                for p in np.round(pts * routing.QUANT).astype(np.int64):
                    blades[i].add(tuple(p))
                    blades[j].add(tuple(p))
    exp_splits = {i: len(b) for i, b in blades.items()}
    # every road splits into (crossings + 1) edges
    got_counts = e.groupby("osm_id").size().to_dict()
    for i, nx in exp_splits.items():
        assert got_counts.get(i, 0) == nx + 1, (i, nx, got_counts)
    # junctions CONNECT: each crossing is one shared degree-4 vertex
    n_cross = len(set().union(*blades.values()))
    deg = v.groupby("degree").size().to_dict()
    assert deg.get(4, 0) == n_cross, (deg, n_cross)


def test_blade_res_validation(spark, grid_roads):
    with pytest.raises(ValueError, match="res > fallback_res"):
        routing.edge_intersection_blades(
            grid_roads.withColumnRenamed("osm_id", "edge_id"), res=6
        ).count()
