"""Deterministic geo/tag derivations over the driver's testdata tables.

The correctness harness (__spark_entry__.py) runs every engine query
side-by-side with an ANSI-SQL oracle in DuckDB over the same parquet files.
Spatial inputs therefore have to be derivable *identically* in both systems:
this module holds the shared SQL snippet for each derivation and builds the
Spark side with ``F.expr(<same snippet>)`` — one source of truth, two
executors. The engine path then runs the real machinery (WKB polygons, cell
index, PIP join, kNN); the oracle reduces to pure arithmetic
(rectangles → inequalities) that DuckDB can evaluate.

World layout (all doubles, same IEEE ops both sides):

- points: one per ``events`` row, uniform over the D.C.-sized test extent.
- "city" cells: 5×5 grid from ``nation`` (25 rows), shrunk 0.002° inside
  their strip so no point ever lies on a shared edge (PIP boundary ties are
  undefined; SURVEY.md §7.3).
- "state" strips: 5 vertical strips from ``region`` (admin_level 4).
- "country": the whole extent (admin_level 2).

Strict nesting cell ⊂ strip ⊂ country gives closed-form oracles for the
nested-path operator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgosm_flex_spark.geometry import wkb
from pgosm_flex_spark.index import cells

LON0, LAT0 = -77.12, 38.79
LON_SPAN, LAT_SPAN = 0.22, 0.21
STRIP_W = LON_SPAN / 5  # 0.044
CELL_H = LAT_SPAN / 5  # 0.042
PAD = 0.002
# Outward pads chosen so no derived point coordinate (which is always
# LON0 + m/1e6*SPAN for integer m) can ever equal a polygon boundary:
# PAD_S/SPAN*1e6 and PAD_C/SPAN*1e6 are non-integers, while cell pads
# (PAD/SPAN*1e6 = 9090.90..) are non-integers too. Boundary-tie freedom
# makes engine ST_Within and oracle strict inequalities agree exactly.
PAD_S = 0.0005  # strip outward pad (x); strips overlap slightly — harmless
PAD_C = 0.001  # country outward pad (x and y), also strips' y pad

# ---------------------------------------------------------------------------
# shared SQL snippets (valid in Spark SQL AND DuckDB)
# ---------------------------------------------------------------------------

POINT_LON_SQL = f"({LON0} + ((event_id * 2654435761) % 1000000) / 1000000.0 * {LON_SPAN})"
POINT_LAT_SQL = f"({LAT0} + ((event_id * 40507) % 1000000) / 1000000.0 * {LAT_SPAN})"


def cell_bounds_sql(key: str) -> dict[str, str]:
    """City-cell rectangle bounds as SQL text in terms of integer column ``key``."""
    return {
        "x0": f"({LON0} + ({key} % 5) * {STRIP_W} + {PAD})",
        "x1": f"({LON0} + ({key} % 5) * {STRIP_W} + {STRIP_W} - {PAD})",
        "y0": f"({LAT0} + floor({key} / 5) * {CELL_H} + {PAD})",
        "y1": f"({LAT0} + floor({key} / 5) * {CELL_H} + {CELL_H} - {PAD})",
    }


def strip_bounds_sql(key: str) -> dict[str, str]:
    # y pad is HALF the country's PAD_C so strips nest STRICTLY inside the
    # country polygon (exact ST_Within rejects shared boundary segments);
    # oracle point-in-strip tests use x only, so y pads never affect counts
    return {
        "x0": f"({LON0} + {key} * {STRIP_W} - {PAD_S})",
        "x1": f"({LON0} + ({key} + 1) * {STRIP_W} + {PAD_S})",
        "y0": f"({LAT0} - {PAD_C / 2})",
        "y1": f"({LAT0 + LAT_SPAN} + {PAD_C / 2})",
    }


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Identical formula text to operators.knn.haversine_m_col."""
    return (
        f"(2.0 * 6371008.8 * asin(sqrt(least("
        f"pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - {lon1}) / 2), 2), 1.0))))"
    )


def cell_id_sql(lon: str, lat: str, res: int) -> str:
    """Identical math to index.cells.cell_col, as portable SQL."""
    n = float(1 << res)
    nmax = (1 << res) - 1
    lat_c = f"greatest(least({lat}, 85.05112878), -85.05112878)"
    x = f"least(greatest(floor(({lon} + 180.0) / 360.0 * {n}), 0), {nmax})"
    # asinh(z) spelled as ln(z + sqrt(z²+1)): DuckDB has no asinh builtin;
    # Spark's ASINH evaluates the same identity, so doubles agree bitwise
    asinh_z = "ln(tan(radians({c})) + sqrt(tan(radians({c})) * tan(radians({c})) + 1.0))".format(c=lat_c)
    y = (
        f"least(greatest(floor((0.5 - {asinh_z} / (2.0 * pi()))"
        f" * {n}), 0), {nmax})"
    )
    return (
        f"(cast({res} as bigint) * cast({1 << cells._RES_SHIFT} as bigint)"
        f" + cast({x} as bigint) * cast({1 << cells._X_SHIFT} as bigint)"
        f" + cast({y} as bigint))"
    )


# caption derivation: OSM-ish tags from event rows, as a single SQL string.
# Every branch family gets positives and negatives (FIXTURES.md F3).
CAPTION_SQL = (
    "concat("
    f"'lon=', cast({POINT_LON_SQL} as string), ' lat=', cast({POINT_LAT_SQL} as string), "
    "CASE cast(event_id % 8 as int) "
    "  WHEN 0 THEN ' highway=motorway' WHEN 1 THEN ' highway=primary' "
    "  WHEN 2 THEN ' highway=residential' WHEN 3 THEN ' highway=footway' "
    "  WHEN 4 THEN ' highway=path' WHEN 5 THEN ' highway=service' "
    "  WHEN 6 THEN ' highway=cycleway' ELSE '' END, "
    "CASE cast(event_id % 5 as int) "
    "  WHEN 0 THEN ' maxspeed=30' WHEN 1 THEN ' maxspeed=55%20mph' "
    "  WHEN 2 THEN ' maxspeed=garbage' WHEN 3 THEN ' maxspeed=23.5' ELSE '' END, "
    "CASE cast(event_id % 7 as int) "
    "  WHEN 0 THEN ' access=no' WHEN 1 THEN ' access=private' "
    "  WHEN 2 THEN ' access=yes' ELSE '' END, "
    "CASE cast(event_id % 6 as int) "
    "  WHEN 0 THEN ' name=Main%20Street' WHEN 1 THEN ' name:en=East%20Road' "
    "  WHEN 2 THEN ' short_name=shortN' WHEN 3 THEN ' old_name=oldN' ELSE '' END, "
    "CASE cast(event_id % 9 as int) "
    "  WHEN 0 THEN ' place=city admin_level=8' WHEN 1 THEN ' place=suburb' "
    "  WHEN 2 THEN ' boundary=administrative admin_level=4' ELSE '' END, "
    "CASE cast(event_id % 11 as int) "
    "  WHEN 0 THEN ' shop=deli' WHEN 1 THEN ' amenity=restaurant cuisine=pizza' "
    "  WHEN 2 THEN ' amenity=bench' WHEN 3 THEN ' building=yes' "
    "  WHEN 4 THEN ' tourism=hotel' WHEN 5 THEN ' natural=peak ele=1955%20m' "
    "  WHEN 6 THEN ' natural=tree' WHEN 7 THEN ' waterway=river' "
    "  WHEN 8 THEN ' landuse=cemetery' ELSE '' END, "
    "CASE cast(event_id % 13 as int) "
    "  WHEN 0 THEN ' addr:housenumber=100 addr:street=Main%20St addr:city=Washington' "
    "  WHEN 1 THEN ' addr:postcode=20001 addr:state=DC' ELSE '' END"
    ")"
)


# Mixed-geometry caption for the golden-count harness: one tag family per row
# (event_id % 33) so every layer table's CASE logic reduces to closed-form
# arithmetic in the DuckDB oracle, and a geometry mix (event_id % 4:
# node / open way / closed way / relation) so point/line/polygon/combined
# tables all receive rows — the reference's 25 golden count tests
# (/root/reference/tests/sql/*.sql) all have this shape.
MIXED_FAMILY_TAGS: dict[int, str] = {
    0: "amenity=restaurant cuisine=pizza",
    1: "amenity=bench",
    2: "amenity=fuel",
    3: "bench=yes",
    4: "brewery=Brew%20Co",
    5: "amenity=pub",
    6: "amenity=shelter shelter_type=basic_hut",
    7: "shop=bakery",
    8: "shop=supermarket wheelchair=yes",
    9: "amenity=cafe",
    10: "building=yes name=Bldg%20A",
    11: "building=house",
    12: "building:part=roof",
    13: "office=lawyer",
    14: "addr:housenumber=5 addr:street=Oak%20St",
    15: "indoor=room name=Room%201",
    16: "indoor=corridor",
    17: "door=hinged",
    18: "entrance=main",
    19: "emergency=fire_hydrant",
    20: "power=tower",
    21: "utility=gas",
    22: "aeroway=runway",
    23: "man_made=water_tower content=water",
    24: "emergency=no",
    25: "public_transport=platform",
    26: "railway=station public_transport=station",
    27: "aerialway=gondola",
    28: "natural=water name=Lake%20X",
    29: "waterway=river",
    30: "highway=pedestrian area=yes",
    31: "place=city admin_level=8",
    32: "boundary=administrative admin_level=4",
    # QC tag-suggestion triggers (db/qc/osm_tag_suggestions.sql rules 1-6)
    33: "bicycle_parking=stands",
    34: "bench=seat",
    35: "wheelchair=sometimes",
    36: "shop=cafe",
    37: "natural=street_lamp",
    38: "addr:housenumber=9",
    # traffic long-tail branches (traffic.lua:51-256)
    39: "barrier=gate",
    40: "traffic_calming=hump",
    41: "highway=stop",
    42: "railway=level_crossing",
    43: "noexit=yes",
    44: "amenity=parking",
    # landuse / leisure / natural / tourism layer families
    45: "leisure=park",
    46: "natural=peak ele=1955%20m",
    47: "landuse=forest",
    48: "tourism=hotel",
}
# MUST stay coprime with 8: family = id % MIXED_MOD and geometry = id % 4 /
# relation-type = id % 8 have to hit every (family, geometry) combination —
# a shared factor silently empties whole table × family cells (a 48 here
# pinned every family to ONE geometry kind and gutted the golden counts)
MIXED_MOD = 49
assert MIXED_MOD % 2 == 1

MIXED_CAPTION_SQL = (
    "concat("
    f"'lon=', cast({POINT_LON_SQL} as string), ' lat=', cast({POINT_LAT_SQL} as string), "
    f"CASE cast(event_id % {MIXED_MOD} as int) "
    + " ".join(
        f"WHEN {fam} THEN ' {tags}'" for fam, tags in sorted(MIXED_FAMILY_TAGS.items())
    )
    + " ELSE '' END, "
    # relations (event_id % 4 == 3) split into poly-eligible multipolygons
    # (% 8 == 3) and non-poly route relations (% 8 == 7)
    "CASE cast(event_id % 8 as int) WHEN 3 THEN ' type=multipolygon' "
    "WHEN 7 THEN ' type=route' ELSE '' END"
    ")"
)


# ---------------------------------------------------------------------------
# Spark-side builders
# ---------------------------------------------------------------------------

def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (event_id, lon, lat) via the shared SQL snippets."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.expr(POINT_LON_SQL).alias("lon"),
        F.expr(POINT_LAT_SQL).alias("lat"),
    )


def derived_osm_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → osm-objects frame (caption-tagged way rows) for the layer
    registry: the engine parses captions with the real machinery while the
    oracle reproduces outcomes with CASE arithmetic."""
    from pgosm_flex_spark.functions import tags as tagf

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("osm_id"), F.expr(CAPTION_SQL).alias("caption")
    )
    parsed = tagf.with_tags(ev)
    return parsed.select(
        "osm_id",
        F.lit("W").alias("geom_type"),
        F.lit(False).alias("is_closed"),
        "tags",
        "lon",
        "lat",
        F.lit(None).cast("binary").alias("geom_wkb"),
        F.lit(None).cast("array<long>").alias("member_ids"),
    )


def derived_osm_objects_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → osm-objects frame with MIXED geometry kinds: event_id % 4
    routes each row to node (0) / open way (1) / closed way (2) / relation
    (3), and relations carry type=multipolygon (% 8 == 3) or type=route
    (% 8 == 7). One tag family per row (MIXED_FAMILY_TAGS), so every layer
    table's golden count has a CASE-arithmetic DuckDB oracle."""
    from pgosm_flex_spark.functions import tags as tagf

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("osm_id"), F.expr(MIXED_CAPTION_SQL).alias("caption")
    )
    parsed = tagf.with_tags(ev)
    g = (F.col("osm_id") % 4).cast("int")
    return parsed.select(
        "osm_id",
        F.when(g == 0, F.lit("N")).when(g == 3, F.lit("R")).otherwise(F.lit("W")).alias("geom_type"),
        (g == 2).alias("is_closed"),
        "tags",
        "lon",
        "lat",
        F.lit(None).cast("binary").alias("geom_wkb"),
        F.lit(None).cast("array<long>").alias("member_ids"),
    )


def street_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 streets from ``supplier`` (s_suppkey 0..4 → horizontal at the cell
    row centers, 5..9 → vertical at the strip centers; keys above 9 ignored): a grid with 25 known
    crossings — the routing-network oracle's input. road_line-shaped."""
    sups = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 10)  # fixed 10-street grid at every sf
        .select("s_suppkey")
        .collect()
    )
    rows = []
    for s in sups:
        k = int(s["s_suppkey"])  # testdata keys are 0-based
        if k < 5:
            y = LAT0 + (k + 0.5) * CELL_H
            coords = np.array([[LON0, y], [LON0 + LON_SPAN, y]])
            osm_type = "residential"
        else:
            x = LON0 + (k - 5 + 0.5) * STRIP_W
            coords = np.array([[x, LAT0], [x, LAT0 + LAT_SPAN]])
            osm_type = "primary"
        rows.append(
            (k, wkb.encode_linestring(coords), 0, 0, None, osm_type)
        )
    return spark.createDataFrame(
        rows,
        schema="osm_id long, geom_wkb binary, layer int, oneway short, "
        "maxspeed double, osm_type string",
    )


def water_ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The street grid re-presented as waterways (water_line-shaped: osm_id,
    geom_wkb, layer, osm_type, osm_subtype, name, tunnel, bridge): H lines
    (keys 0..4) are rivers, V lines (keys 5..9) canals. Same 25 known
    crossings as :func:`street_ways`, so the routing-network oracle's
    closed-form crossing SQL applies to the water graph too."""
    sups = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 10)
        .select("s_suppkey")
        .collect()
    )
    rows = []
    for s in sups:
        k = int(s["s_suppkey"])
        if k < 5:
            y = LAT0 + (k + 0.5) * CELL_H
            coords = np.array([[LON0, y], [LON0 + LON_SPAN, y]])
            subtype = "river"
        else:
            x = LON0 + (k - 5 + 0.5) * STRIP_W
            coords = np.array([[x, LAT0], [x, LAT0 + LAT_SPAN]])
            subtype = "canal"
        rows.append(
            (k, wkb.encode_linestring(coords), 0, "waterway", subtype,
             f"water-{k}", None, None)
        )
    return spark.createDataFrame(
        rows,
        schema="osm_id long, geom_wkb binary, layer int, osm_type string, "
        "osm_subtype string, name string, tunnel string, bridge string",
    )


def street_crossing_sql() -> dict[str, str]:
    """Closed-form SQL text for the street grid: H street k runs at
    y_k = LAT0 + (k+0.5)*CELL_H; V street j at x_j = LON0 + (j-5+0.5)*STRIP_W
    (supplier keys are 0-based in the testdata)."""
    return {
        "hy": f"({LAT0} + ((k) + 0.5) * {CELL_H})",
        "vx": f"({LON0} + ((k) - 5 + 0.5) * {STRIP_W})",
    }


_rect = wkb.encode_rect


def concave_world(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-shaped containers + small child rectangles per nation cell — the
    concave-containment oracle world. Container k (osm_id 500+k) is cell k
    minus its NE quadrant; children (osm_id 1000+8k+q) are w/8-sized rects:
    q=0 NW, q=1 NE (in the removed quadrant → NOT within), q=2 SW, q=3 SE,
    q=4 a straddler whose centroid is inside but whose NE corner pokes into
    the removed quadrant — the case a centroid+bbox approximation of
    ST_Within wrongly accepts. Truth is pure id arithmetic for the oracle."""
    nations = load(spark, sf_dir, "nation").select("n_nationkey").collect()
    rows = []
    for n in nations:
        k = int(n["n_nationkey"])
        x0 = LON0 + (k % 5) * STRIP_W + PAD
        x1 = LON0 + (k % 5) * STRIP_W + STRIP_W - PAD
        y0 = LAT0 + np.floor(k / 5) * CELL_H + PAD
        y1 = LAT0 + np.floor(k / 5) * CELL_H + CELL_H - PAD
        w, h = x1 - x0, y1 - y0
        cx, cy = x0 + w / 2, y0 + h / 2
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, cy], [cx, cy], [cx, y1], [x0, y1], [x0, y0]]
        )
        rows.append(
            (500 + k, f"L-{k}", "boundary", "administrative", 8,
             wkb.encode_polygon([ring]), None)
        )
        centers = [
            (x0 + w / 4, y0 + 3 * h / 4),   # q=0 NW: within
            (x0 + 3 * w / 4, y0 + 3 * h / 4),  # q=1 NE: outside (removed quadrant)
            (x0 + w / 4, y0 + h / 4),       # q=2 SW: within
            (x0 + 3 * w / 4, y0 + h / 4),   # q=3 SE: within
            (cx - w / 32, cy - h / 32),     # q=4 straddler: NOT within
        ]
        for q, (ccx, ccy) in enumerate(centers):
            rows.append(
                (1000 + 8 * k + q, f"child-{k}-{q}", "boundary", "administrative", 10,
                 _rect(ccx - w / 16, ccy - h / 16, ccx + w / 16, ccy + h / 16), None)
            )
    return spark.createDataFrame(
        rows,
        schema="osm_id long, name string, osm_type string, boundary string, "
        "admin_level int, geom_wkb binary, member_ids array<long>",
    )


def admin_world(spark: SparkSession, sf_dir: str) -> DataFrame:
    """country + region strips + nation cells as a place_polygon-shaped frame.

    Bounds computed with the same IEEE double arithmetic as the SQL snippets
    (same operations in the same order), so engine WKB geometry and oracle
    inequalities describe the same rectangles bit-for-bit.
    """
    nations = load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    regions = load(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
    rows = []
    rows.append(
        (1, "World", "boundary", "administrative", 2,
         _rect(LON0 - PAD_C, LAT0 - PAD_C, LON0 + LON_SPAN + PAD_C, LAT0 + LAT_SPAN + PAD_C),
         None)
    )
    for r in regions:
        k = r["r_regionkey"]
        x0 = LON0 + k * STRIP_W - PAD_S
        x1 = LON0 + (k + 1) * STRIP_W + PAD_S
        rows.append(
            (10 + k, r["r_name"], "boundary", "administrative", 4,
             _rect(x0, LAT0 - PAD_C / 2, x1, LAT0 + LAT_SPAN + PAD_C / 2), None)
        )
    for n in nations:
        k = n["n_nationkey"]
        x0 = LON0 + (k % 5) * STRIP_W + PAD
        x1 = LON0 + (k % 5) * STRIP_W + STRIP_W - PAD
        y0 = LAT0 + np.floor(k / 5) * CELL_H + PAD
        y1 = LAT0 + np.floor(k / 5) * CELL_H + CELL_H - PAD
        rows.append(
            (100 + k, n["n_name"], "city", "administrative", 8,
             _rect(x0, y0, x1, y1), None)
        )
    return spark.createDataFrame(
        rows,
        schema="osm_id long, name string, osm_type string, boundary string, "
        "admin_level int, geom_wkb binary, member_ids array<long>",
    )
