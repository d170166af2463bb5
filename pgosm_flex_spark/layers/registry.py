"""Declarative layer registry — the Spark re-expression of the Lua flex styles.

The reference streams every OSM object through chained per-layer Lua callbacks
(`process_node/way/relation`, e.g. /root/reference/flex-config/style/road.lua:250-284)
that filter on tags and insert projected rows into typed tables. Here each of
the 20 layers is a pure function ``DataFrame → {table_name: DataFrame}`` built
from native column expressions over one shared scan: Spark caches the single
input pass and Catalyst pushes each layer's first-level key predicate into the
source scan. No callbacks, no per-object hops.

Input contract (the "osm objects" frame):

    osm_id      long      — negative for relations (osm2pgsql convention)
    geom_type   string    — 'N' | 'W' | 'R'
    is_closed   boolean   — ways only (first vertex == last)
    area_tag    derived from tags
    tags        map<string,string>
    lon, lat    double    — point geometry (nodes / graft image rows)
    geom_wkb    binary    — way/relation geometry (nullable for nodes)
    member_ids  array<long> — relations only, else NULL

Layersets mirror /root/reference/flex-config/layerset/{minimal,basic,default,
everything}.ini; which layers run is a subset selection, exactly the
reference's INI gate (/root/reference/flex-config/layerset.lua:26-28).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.functions import scalars as sc
from pgosm_flex_spark.functions import tags as tagf

T = sc.t  # tags[key] accessor


# ---------------------------------------------------------------------------
# geometry routing predicates (SURVEY.md P19)
# ---------------------------------------------------------------------------

def _is_node(df: DataFrame) -> Column:
    return F.col("geom_type") == "N"


def _is_way(df: DataFrame) -> Column:
    return F.col("geom_type") == "W"


def _is_rel(df: DataFrame) -> Column:
    return F.col("geom_type") == "R"


def _closed(df: DataFrame) -> Column:
    return F.coalesce(F.col("is_closed"), F.lit(False))


def _rel_is_poly(df: DataFrame) -> Column:
    """Relations kept only when type ∈ {multipolygon, boundary}
    (/root/reference/flex-config/style/poi.lua:197-212 et al.)."""
    return T(F.col("tags"), "type").isin("multipolygon", "boundary")


_BASE_COLS = ["osm_id", "geom_type", "lon", "lat", "geom_wkb"]


def _project(df: DataFrame, extra: dict[str, Column], with_members: bool = False) -> DataFrame:
    cols = [F.col(c) for c in _BASE_COLS]
    if with_members:
        cols.append(F.col("member_ids"))
    cols.extend(expr.alias(name) for name, expr in extra.items())
    return df.select(*cols)


@dataclass(frozen=True)
class TableSpec:
    layer: str
    name: str  # e.g. "road_line"
    kind: str  # point | line | polygon | combined_point
    build: Callable[[DataFrame], DataFrame] = field(repr=False, compare=False, default=None)


# ---------------------------------------------------------------------------
# place (/root/reference/flex-config/style/place.lua:60-176)
# ---------------------------------------------------------------------------

def _place_filter(df: DataFrame) -> Column:
    t = F.col("tags")
    return T(t, "place").isNotNull() | T(t, "boundary").isNotNull() | T(t, "admin_level").isNotNull()


def _place_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    osm_type = (
        F.when(T(t, "place").isNotNull(), T(t, "place"))
        .when(T(t, "boundary").isNotNull(), F.lit("boundary"))
        .otherwise(F.lit("admin_level"))
    )
    return {
        "osm_type": osm_type,
        "boundary": T(t, "boundary"),
        "admin_level": sc.parse_admin_level(T(t, "admin_level")),
        "name": sc.get_name(t),
    }


def build_place(osm: DataFrame) -> dict[str, DataFrame]:
    # geometry test first throughout the builders: one column comparison
    # short-circuits the tag logic for rows of the wrong geometry class
    member = _place_filter(osm)
    return {
        "place_point": _project(osm.filter(_is_node(osm) & member), _place_cols(osm)),
        "place_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), _place_cols(osm)),
        # closed ways AND all matching relations land in place_polygon
        # (place.lua:113-131, 133-175 — relations get member_ids)
        "place_polygon": _project(
            osm.filter(((_is_way(osm) & _closed(osm)) | _is_rel(osm)) & member),
            _place_cols(osm), with_members=True
        ),
    }


# ---------------------------------------------------------------------------
# road / road_major (/root/reference/flex-config/style/road.lua:80-245,
# road_major.lua)
# ---------------------------------------------------------------------------

def _road_common(t: Column) -> dict[str, Column]:
    return {
        "name": sc.get_name(t),
        "osm_type": T(t, "highway"),
        "ref": sc.get_ref(t),
        "maxspeed": sc.parse_speed(T(t, "maxspeed")),
        "layer": sc.parse_layer_value(T(t, "layer")),
        "tunnel": T(t, "tunnel"),
        "bridge": T(t, "bridge"),
        "access": T(t, "access"),
    }


def _road_routable(t: Column) -> dict[str, Column]:
    return {
        "major": sc.major_road(T(t, "highway")),
        "route_foot": sc.routable_foot(t),
        "route_cycle": sc.routable_cycle(t),
        "route_motor": sc.routable_motor(t),
    }


def _road_is_area(df: DataFrame) -> Column:
    """area='yes' or indoor='room' routes ways to road_polygon (road.lua:141-143)."""
    t = F.col("tags")
    # coalesce to false: absent tags give NULL, and filter(~NULL) would drop
    # every normal road under SQL three-valued logic
    return F.coalesce((T(t, "area") == "yes") | (T(t, "indoor") == "room"), F.lit(False))


def build_road(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    member = T(t, "highway").isNotNull()
    point_cols = {**_road_common(t), "oneway": sc.parse_oneway(T(t, "oneway"))}
    line_cols = {**_road_common(t), "oneway": sc.parse_oneway(T(t, "oneway")), **_road_routable(t)}
    poly_cols = {**_road_common(t), **_road_routable(t)}
    wr = osm.filter((_is_way(osm) | _is_rel(osm)) & member)
    return {
        "road_point": _project(osm.filter(_is_node(osm) & member), point_cols),
        "road_line": _project(wr.filter(~_road_is_area(wr)), line_cols, with_members=True),
        "road_polygon": _project(wr.filter(_road_is_area(wr)), poly_cols, with_members=True),
    }


def build_road_major(osm: DataFrame) -> dict[str, DataFrame]:
    """road_major: line subset where major_road(highway)
    (/root/reference/flex-config/style/road_major.lua)."""
    lines = build_road(osm)["road_line"]
    return {"road_major": lines.filter(F.col("major"))}


# ---------------------------------------------------------------------------
# poi (/root/reference/flex-config/style/poi.lua,
# poi_helpers.lua:3-141)
# ---------------------------------------------------------------------------

POI_FIRST_LEVEL_KEYS = [
    "building", "shop", "amenity", "leisure", "man_made", "tourism",
    "landuse", "natural", "historic",
]
_POI_LANDUSE = ["cemetery", "orchard", "railway", "village_green", "vineyard"]
_POI_MAN_MADE = [
    "beacon", "chimney", "communications_tower", "crane", "flagpole",
    "lighthouse", "mast", "obelisk", "observatory", "offshore_platform",
    "pier", "silo", "survey_point", "telescope", "tower", "water_tap",
    "water_tower", "water_well", "windmill", "works",
]
_POI_NATURAL = ["peak", "glacier", "reef", "hot_spring", "bay"]


def _poi_filter(df: DataFrame) -> Column:
    t = F.col("tags")
    first = sc.has_any_key(t, POI_FIRST_LEVEL_KEYS)
    # second_level_tag_check_poi (poi_helpers.lua:104-121)
    natural_ok = T(t, "natural").isNull() | T(t, "natural").isin(_POI_NATURAL)
    landuse_ok = T(t, "landuse").isNull() | T(t, "landuse").isin(_POI_LANDUSE)
    # operator (one map probe) before the get_name chain: OR is commutative
    # (incl. three-valued) and evaluates left-to-right, so most building
    # rows never reach the name-coalesce / last-ditch scan
    building_ok = T(t, "building").isNull() | T(t, "operator").isNotNull() | (
        sc.get_name(t) != ""
    )
    man_made_ok = T(t, "man_made").isNull() | T(t, "man_made").isin(_POI_MAN_MADE)
    return first & natural_ok & landuse_ok & building_ok & man_made_ok


def _poi_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    # priority CASE (poi_helpers.lua:124-141): shop > amenity > building >
    # leisure > landuse > natural > man_made > tourism > historic > Unknown
    pairs = [
        ("shop", "shop"), ("amenity", "amenity"), ("building", "building"),
        ("leisure", "leisure"), ("landuse", "landuse"), ("natural", "natural"),
        ("man_made", "man_made"), ("tourism", "tourism"), ("historic", "historic"),
    ]
    osm_type = F.lit("Unknown")
    osm_subtype = F.lit("Unknown")
    expr_type = None
    expr_sub = None
    for label, key in reversed(pairs):
        cond = T(t, key).isNotNull()
        expr_type = F.when(cond, F.lit(label)).otherwise(
            expr_type if expr_type is not None else osm_type
        )
        expr_sub = F.when(cond, T(t, key)).otherwise(
            expr_sub if expr_sub is not None else osm_subtype
        )
    return {
        "osm_type": expr_type,
        "osm_subtype": expr_sub,
        "name": sc.get_name(t),
        "housenumber": T(t, "addr:housenumber"),
        "street": T(t, "addr:street"),
        "city": T(t, "addr:city"),
        "state": T(t, "addr:state"),
        "postcode": T(t, "addr:postcode"),
        "address": sc.get_address(t),
        "operator": T(t, "operator"),
    }


def build_poi(osm: DataFrame) -> dict[str, DataFrame]:
    member = _poi_filter(osm)
    cols = _poi_cols(osm)
    return {
        "poi_point": _project(osm.filter(_is_node(osm) & member), cols),
        "poi_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "poi_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# building (/root/reference/flex-config/style/building.lua,
# building_helpers.lua:5-80)
# ---------------------------------------------------------------------------

BUILDING_FIRST_LEVEL_KEYS = ["building", "building:part", "office", "door", "entrance"]
_ADDR_EXCLUDE_KEYS = [
    "shop", "amenity", "building", "building:part", "landuse", "leisure",
    "office", "tourism", "boundary", "natural", "aeroway", "demolished",
]


_KEY_SEP = "\x01"


def _has_key_prefix(t: Column, prefix: str) -> Column:
    """True iff any tag key starts with ``prefix`` — the codegen-able
    formulation: the key list is joined on a \\u0001 sentinel (with leading/
    trailing sentinels) and probed with one substring search for
    ``\\u0001<prefix>``. Exactly equivalent to the higher-order
    ``exists(map_keys, startswith)`` for every corpus whose tag KEYS do not
    contain the \\u0001 control byte (OSM keys are human-entered text; the
    fixture + oracle corpora never produce control bytes). The HOF version is
    CodegenFallback, and one fallback expression inside a Filter evicts the
    entire stage from whole-stage codegen — measured as the building
    branches of the 44-table union running interpreted (~0.8 s of the
    bench's layer-mapping count)."""
    blob = F.concat(
        F.lit(_KEY_SEP), F.array_join(F.map_keys(t), _KEY_SEP), F.lit(_KEY_SEP)
    )
    return F.contains(blob, F.lit(_KEY_SEP + prefix))


def _address_only(t: Column) -> Column:
    """address_only_building (building_helpers.lua:5-34): no excluded keys and
    at least one addr:* key."""
    no_excluded = ~sc.has_any_key(t, _ADDR_EXCLUDE_KEYS)
    return no_excluded & _has_key_prefix(t, "addr:")


def _building_filter(df: DataFrame) -> Column:
    t = F.col("tags")
    return sc.has_any_key(t, BUILDING_FIRST_LEVEL_KEYS) | _address_only(t)


def _building_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    osm_type = (
        F.when(T(t, "building").isNotNull(), F.lit("building"))
        .when(T(t, "building:part").isNotNull(), F.lit("building_part"))
        .when(T(t, "office").isNotNull(), F.lit("office"))
        .when(_address_only(t), F.lit("address"))
        .when(T(t, "entrance").isNotNull(), F.lit("entrance"))
        .when(T(t, "door").isNotNull(), F.lit("door"))
        .otherwise(F.lit("unknown"))
    )
    osm_subtype = (
        F.when(T(t, "building").isNotNull(), T(t, "building"))
        .when(T(t, "building:part").isNotNull(), T(t, "building:part"))
        .when(T(t, "office").isNotNull(), T(t, "office"))
        .when(_address_only(t), F.lit(None).cast("string"))
        .when(T(t, "entrance").isNotNull(), T(t, "entrance"))
        .when(T(t, "door").isNotNull(), T(t, "door"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "osm_type": osm_type,
        "osm_subtype": osm_subtype,
        "name": sc.get_name(t),
        "levels": T(t, "building:levels").try_cast("int"),
        "height": sc.parse_to_meters(F.coalesce(T(t, "height"), T(t, "building:height"))),
        "housenumber": T(t, "addr:housenumber"),
        "street": T(t, "addr:street"),
        "city": T(t, "addr:city"),
        "state": T(t, "addr:state"),
        "postcode": T(t, "addr:postcode"),
        "address": sc.get_address(t),
        "wheelchair": T(t, "wheelchair"),
        "wheelchair_desc": sc.get_wheelchair_desc(t),
    }


def build_building(osm: DataFrame) -> dict[str, DataFrame]:
    member = _building_filter(osm)
    cols = _building_cols(osm)
    return {
        "building_point": _project(osm.filter(_is_node(osm) & member), cols),
        "building_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# water (/root/reference/flex-config/style/water.lua:67-180)
# ---------------------------------------------------------------------------

WATER_NATURAL_VALUES = [
    "water", "lake", "hot_spring", "waterfall", "wetland", "swamp",
    "water_meadow", "waterway", "spring",
]


def _water_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    is_nat = T(t, "natural").isin(WATER_NATURAL_VALUES)
    return {
        "osm_type": F.when(is_nat, F.lit("natural")).otherwise(F.lit("waterway")),
        "osm_subtype": F.when(is_nat, T(t, "natural")).otherwise(T(t, "waterway")),
        "name": sc.get_name(t),
        "layer": sc.parse_layer_value(T(t, "layer")),
        "tunnel": T(t, "tunnel"),
        "bridge": T(t, "bridge"),
        "boat": T(t, "boat"),
    }


def build_water(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    # natural-in-set takes priority; else waterway key (water.lua:73-143)
    member = T(t, "natural").isin(WATER_NATURAL_VALUES) | T(t, "waterway").isNotNull()
    cols = _water_cols(osm)
    return {
        "water_point": _project(osm.filter(_is_node(osm) & member), cols),
        "water_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "water_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# amenity (/root/reference/flex-config/style/amenity.lua:76-110)
# ---------------------------------------------------------------------------

def _amenity_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    amenity = T(t, "amenity")
    osm_type = (
        F.when(amenity.isNull() & (T(t, "bench") == "yes"), F.lit("bench"))
        .when(amenity.isNull() & T(t, "brewery").isNotNull(), F.lit("brewery"))
        .otherwise(amenity)
    )
    osm_subtype = (
        F.when(amenity.isin("restaurant", "fast_food", "cafe"), T(t, "cuisine"))
        .when(amenity == "shelter", T(t, "shelter_type"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "osm_type": osm_type,
        "osm_subtype": osm_subtype,
        "name": sc.get_name(t),
        "housenumber": T(t, "addr:housenumber"),
        "street": T(t, "addr:street"),
        "city": T(t, "addr:city"),
        "state": T(t, "addr:state"),
        "postcode": T(t, "addr:postcode"),
        "address": sc.get_address(t),
        "wheelchair": T(t, "wheelchair"),
        "wheelchair_desc": sc.get_wheelchair_desc(t),
    }


def _amenity_member(t: Column) -> Column:
    """Row-set equivalent of ``has_any_key([amenity,bench,brewery]) &
    _amenity_cols()['osm_type'].isNotNull()`` as a flat OR chain. Derivation:
    the osm_type CASE yields 'bench' (amenity null & bench='yes'),
    'brewery' (amenity null & brewery set), else the amenity value — so it
    is non-NULL iff ``amenity IS NOT NULL OR bench='yes' OR brewery IS NOT
    NULL``; each disjunct implies its key exists, making the has_any_key
    conjunct redundant. The flat form generates a fraction of the CASE
    chain's bytecode (the 44-branch union pays codegen size 44×; huge
    generated methods are never JIT-compiled). Pinned equal to the builder
    output by tests/test_router.py."""
    # the has_any_key gate is logically redundant (each disjunct implies
    # its key exists) but is the per-row fast path: one arrays_overlap pass
    # over the key list short-circuits the per-key element_at probes for
    # the vast majority of rows, which carry none of these keys
    return sc.has_any_key(t, ["amenity", "bench", "brewery"]) & (
        T(t, "amenity").isNotNull()
        | (T(t, "bench") == "yes")
        | T(t, "brewery").isNotNull()
    )


def build_amenity(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    member = _amenity_member(t)
    cols = _amenity_cols(osm)
    # geometry test first: one column comparison short-circuits the tag
    # logic for rows of the wrong geometry class (most rows, on any mix)
    return {
        "amenity_point": _project(osm.filter(_is_node(osm) & member), cols),
        "amenity_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "amenity_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# shop (/root/reference/flex-config/style/shop_helpers.lua:2-32)
# ---------------------------------------------------------------------------

_SHOP_AMENITY_VALUES = [
    "vending_machine", "car_rental", "motorcycle_rental", "cafe",
    "phone_repair", "music_school", "pub", "pharmacy", "ticket_booth", "shop",
]


def _shop_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    osm_type = (
        F.when(T(t, "shop").isNotNull(), F.lit("shop"))
        .when(T(t, "amenity").isin(_SHOP_AMENITY_VALUES), F.lit("amenity"))
        .otherwise(F.lit(None).cast("string"))
    )
    osm_subtype = (
        F.when(T(t, "shop").isNotNull(), T(t, "shop"))
        .when(T(t, "amenity").isin(_SHOP_AMENITY_VALUES), T(t, "amenity"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "osm_type": osm_type,
        "osm_subtype": osm_subtype,
        "name": sc.get_name(t),
        "housenumber": T(t, "addr:housenumber"),
        "street": T(t, "addr:street"),
        "city": T(t, "addr:city"),
        "state": T(t, "addr:state"),
        "postcode": T(t, "addr:postcode"),
        "address": sc.get_address(t),
        "operator": T(t, "operator"),
        "wheelchair": T(t, "wheelchair"),
        "wheelchair_desc": sc.get_wheelchair_desc(t),
    }


def _shop_member(t: Column) -> Column:
    """Row-set equivalent of ``has_any_key([shop,amenity]) &
    _shop_cols()['osm_type'].isNotNull()``: the CASE is non-NULL iff
    ``shop IS NOT NULL OR amenity IN (shop-amenity list)``; both disjuncts
    imply their key exists (same flat-OR rationale as
    :func:`_amenity_member`)."""
    return sc.has_any_key(t, ["shop", "amenity"]) & (
        T(t, "shop").isNotNull() | T(t, "amenity").isin(_SHOP_AMENITY_VALUES)
    )


def build_shop(osm: DataFrame) -> dict[str, DataFrame]:
    member = _shop_member(F.col("tags"))
    cols = _shop_cols(osm)
    return {
        "shop_point": _project(osm.filter(_is_node(osm) & member), cols),
        "shop_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# landuse / leisure (/root/reference/flex-config/style/{landuse,leisure}.lua)
# ---------------------------------------------------------------------------

def _single_key_layer(osm: DataFrame, key: str, prefix: str, extra: dict[str, Column] | None = None,
                      has_line: bool = False, exclude_vals: list[str] | None = None) -> dict[str, DataFrame]:
    t = F.col("tags")
    member = T(t, key).isNotNull()
    if exclude_vals:
        member = member & ~T(t, key).isin(exclude_vals)
    cols = {"osm_type": T(t, key), "name": sc.get_name(t)}
    if extra:
        cols.update(extra)
    out = {
        f"{prefix}_point": _project(osm.filter(_is_node(osm) & member), cols),
        f"{prefix}_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }
    if has_line:
        out[f"{prefix}_line"] = _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols)
    return out


def build_landuse(osm: DataFrame) -> dict[str, DataFrame]:
    return _single_key_layer(osm, "landuse", "landuse")


def build_leisure(osm: DataFrame) -> dict[str, DataFrame]:
    return _single_key_layer(osm, "leisure", "leisure")


def build_natural(osm: DataFrame) -> dict[str, DataFrame]:
    """natural minus the water-layer values (natural.lua:56-77)."""
    t = F.col("tags")
    return _single_key_layer(
        osm, "natural", "natural",
        extra={"ele": sc.parse_to_meters(T(t, "ele"))},
        has_line=True,
        exclude_vals=WATER_NATURAL_VALUES,
    )


# ---------------------------------------------------------------------------
# indoor (/root/reference/flex-config/style/indoor.lua:60-130)
# ---------------------------------------------------------------------------

def _indoor_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    return {
        "osm_type": (
            F.when(T(t, "indoor").isNotNull(), T(t, "indoor"))
            .when(T(t, "door").isNotNull(), F.lit("door"))
            .when(T(t, "entrance").isNotNull(), F.lit("entrance"))
            .otherwise(F.lit("unknown"))
        ),
        "name": sc.get_name(t),
        "layer": sc.parse_layer_value(T(t, "layer")),
        "level": T(t, "level"),
        "room": T(t, "room"),
        "entrance": T(t, "entrance"),
        "door": T(t, "door"),
        "capacity": T(t, "capacity"),
        "highway": T(t, "highway"),
    }


def build_indoor(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    member = sc.has_any_key(t, ["indoor", "door", "entrance"])
    cols = _indoor_cols(osm)
    return {
        "indoor_point": _project(osm.filter(_is_node(osm) & member), cols),
        "indoor_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "indoor_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# infrastructure (/root/reference/flex-config/style/infrastructure.lua:12-131)
# ---------------------------------------------------------------------------

INFRASTRUCTURE_KEYS = ["aeroway", "amenity", "emergency", "highway", "man_made", "power", "utility"]
_INFRA_TOWER = ["tower", "communications_tower", "mast", "lighthouse", "flagpole"]
_INFRA_TANK = ["silo", "storage_tank", "water_tower", "reservoir_covered"]


def _infrastructure_cols(df: DataFrame) -> tuple[dict[str, Column], Column]:
    t = F.col("tags")
    osm_type = (
        F.when((T(t, "amenity") == "fire_hydrant") | (T(t, "emergency") == "fire_hydrant"), F.lit("emergency"))
        .when((T(t, "amenity") == "emergency_phone") | (T(t, "emergency") == "phone"), F.lit("emergency"))
        .when(T(t, "emergency").isNotNull(), F.lit("emergency"))
        .when(T(t, "highway") == "emergency_access_point", F.lit("emergency"))
        .when(T(t, "man_made").isin(_INFRA_TOWER), T(t, "man_made"))
        .when(T(t, "man_made").isin(_INFRA_TANK), T(t, "man_made"))
        .when(T(t, "power").isNotNull(), F.lit("power"))
        .when(T(t, "utility").isNotNull(), F.lit("utility"))
        .when(T(t, "aeroway").isNotNull(), F.lit("aeroway"))
        .otherwise(F.lit("unknown"))
    )
    osm_subtype = (
        F.when((T(t, "amenity") == "fire_hydrant") | (T(t, "emergency") == "fire_hydrant"), F.lit("fire_hydrant"))
        .when((T(t, "amenity") == "emergency_phone") | (T(t, "emergency") == "phone"), F.lit("phone"))
        .when(T(t, "emergency").isNotNull(), T(t, "emergency"))
        .when(T(t, "highway") == "emergency_access_point", F.lit("highway_access"))
        .when(T(t, "man_made").isin(_INFRA_TOWER), T(t, "tower:type"))
        .when(T(t, "man_made").isin(_INFRA_TANK), T(t, "content"))
        .when(T(t, "power").isNotNull(), T(t, "power"))
        .when(T(t, "aeroway").isNotNull(), T(t, "aeroway"))
        .otherwise(F.lit(None).cast("string"))
    )
    # emergency=no demotes to unknown (infrastructure.lua:124-128)
    demote = (osm_type == "emergency") & (osm_subtype == "no")
    osm_type = F.when(demote, F.lit("unknown")).otherwise(osm_type)
    osm_subtype = F.when(demote, F.lit(None).cast("string")).otherwise(osm_subtype)
    cols = {
        "osm_type": osm_type,
        "osm_subtype": osm_subtype,
        "name": sc.get_name(t),
        "ele": sc.parse_to_meters(T(t, "ele")),
        "height": sc.parse_to_meters(F.coalesce(T(t, "height"), T(t, "building:height"))),
        "operator": T(t, "operator"),
        "material": T(t, "material"),
    }
    keep = osm_type != "unknown"
    return cols, keep


def _infrastructure_member(t: Column) -> Column:
    """Row-set equivalent of ``has_any_key(INFRASTRUCTURE_KEYS) &
    (osm_type != 'unknown')`` as a flat OR chain — the double CASE
    (osm_type + demote) generated ~7.7 KB of bytecode per branch, right at
    HotSpot's 8 KB never-JIT threshold. Derivation from the CASE's
    first-match semantics plus the ``emergency=no`` demotion:

    - the two hydrant/phone branches keep regardless of demotion (their
      subtype literals are never 'no');
    - otherwise a row with an ``emergency`` tag matches the bare-emergency
      branch FIRST, so it keeps iff ``emergency != 'no'`` (a demoted row is
      dropped even if power/aeroway/... tags exist — first match wins);
    - otherwise (no emergency tag) the remaining branches keep iff any of
      highway=emergency_access_point, man_made in tower+tank, power,
      utility, aeroway holds.

    Each disjunct implies its key exists → has_any_key is redundant."""
    emergency = T(t, "emergency")
    hydrant_phone = T(t, "amenity").isin("fire_hydrant", "emergency_phone") | emergency.isin(
        "fire_hydrant", "phone"
    )
    rest = (
        (T(t, "highway") == "emergency_access_point")
        | T(t, "man_made").isin(_INFRA_TOWER + _INFRA_TANK)
        | T(t, "power").isNotNull()
        | T(t, "utility").isNotNull()
        | T(t, "aeroway").isNotNull()
    )
    # redundant-but-fast gate: see _amenity_member
    return sc.has_any_key(t, INFRASTRUCTURE_KEYS) & (
        hydrant_phone
        | (emergency.isNotNull() & (emergency != "no"))
        | (emergency.isNull() & rest)
    )


def build_infrastructure(osm: DataFrame) -> dict[str, DataFrame]:
    cols, _keep = _infrastructure_cols(osm)
    member = _infrastructure_member(F.col("tags"))
    return {
        "infrastructure_point": _project(osm.filter(_is_node(osm) & member), cols),
        "infrastructure_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "infrastructure_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# public_transport (/root/reference/flex-config/style/public_transport.lua:92-135)
# ---------------------------------------------------------------------------

def _public_transport_cols(df: DataFrame) -> dict[str, Column]:
    t = F.col("tags")
    pairs = [("bus", "bus"), ("railway", "railway"), ("lightrail", "lightrail"),
             ("train", "train"), ("aerialway", "aerialway"), ("highway", "highway")]
    osm_type: Column = F.coalesce(T(t, "public_transport"), F.lit("unknown"))
    osm_subtype: Column = F.lit(None).cast("string")
    for label, key in reversed(pairs):
        osm_type = F.when(T(t, key).isNotNull(), F.lit(label)).otherwise(osm_type)
        osm_subtype = F.when(T(t, key).isNotNull(), T(t, key)).otherwise(osm_subtype)
    return {
        "osm_type": osm_type,
        "osm_subtype": osm_subtype,
        "name": sc.get_name(t),
        "public_transport": T(t, "public_transport"),
        "layer": sc.parse_layer_value(T(t, "layer")),
        "ref": sc.get_ref(t),
        "operator": T(t, "operator"),
        "network": T(t, "network"),
        "surface": T(t, "surface"),
        "wheelchair": T(t, "wheelchair"),
        "wheelchair_desc": sc.get_wheelchair_desc(t),
    }


def build_public_transport(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    member = sc.has_any_key(t, ["public_transport", "aerialway", "railway"])
    cols = _public_transport_cols(osm)
    return {
        "public_transport_point": _project(osm.filter(_is_node(osm) & member), cols),
        "public_transport_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "public_transport_polygon": _project(
            osm.filter(
                ((_is_way(osm) & _closed(osm)) | (_is_rel(osm) & _rel_is_poly(osm))) & member
            ),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# traffic (/root/reference/flex-config/style/traffic.lua:51-210)
# ---------------------------------------------------------------------------

_TRAFFIC_HIGHWAY = [
    "traffic_signals", "mini_roundabout", "stop", "crossing", "speed_camera",
    "motorway_junction", "turning_circle", "ford", "street_lamp", "services",
]
_TRAFFIC_AMENITY = ["fuel", "parking", "bicycle_parking"]


_TRAFFIC_FIRST_LEVEL_KEYS = ["highway", "railway", "barrier", "traffic_calming", "amenity", "noexit"]


def _traffic_cols(df: DataFrame) -> tuple[dict[str, Column], Column]:
    t = F.col("tags")
    osm_type = (
        F.when(T(t, "highway").isin(_TRAFFIC_HIGHWAY), T(t, "highway"))
        .when(T(t, "railway") == "level_crossing", F.lit("crossing"))
        .when(T(t, "barrier").isNotNull(), F.lit("barrier"))
        .when(T(t, "traffic_calming").isNotNull(), F.lit("traffic_calming"))
        .when(T(t, "amenity").isin(_TRAFFIC_AMENITY), F.lit("amenity"))
        .when(T(t, "noexit").isNotNull(), F.lit("noexit"))
        .otherwise(F.lit(None).cast("string"))
    )
    osm_subtype = (
        F.when(T(t, "highway").isin(_TRAFFIC_HIGHWAY), F.lit(None).cast("string"))
        .when(T(t, "railway") == "level_crossing", F.lit(None).cast("string"))
        .when(T(t, "barrier").isNotNull(), T(t, "barrier"))
        .when(T(t, "traffic_calming").isNotNull(), T(t, "traffic_calming"))
        .when(T(t, "amenity").isin(_TRAFFIC_AMENITY), T(t, "amenity"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {"osm_type": osm_type, "osm_subtype": osm_subtype}, osm_type


def _traffic_member(t: Column, with_noexit: bool = True) -> Column:
    """Row-set equivalent of ``has_any_key(first-level) &
    _traffic_cols()[1].isNotNull()`` as a flat OR chain: the CASE is
    non-NULL iff one of its six conditions holds, and each condition
    implies its key exists. ``with_noexit=False`` additionally encodes the
    polygon rule ``osm_type != 'noexit'``: the CASE takes the FIRST
    matching branch, and only the noexit branch (matched when none of the
    other five hold) yields the literal 'noexit' — every earlier branch
    yields a highway value from the traffic list, 'crossing', 'barrier',
    'traffic_calming' or 'amenity' — so membership-with-non-noexit-type is
    exactly the five-way OR."""
    member = (
        T(t, "highway").isin(_TRAFFIC_HIGHWAY)
        | (T(t, "railway") == "level_crossing")
        | T(t, "barrier").isNotNull()
        | T(t, "traffic_calming").isNotNull()
        | T(t, "amenity").isin(_TRAFFIC_AMENITY)
    )
    if with_noexit:
        member = member | T(t, "noexit").isNotNull()
    # redundant-but-fast gate: see _amenity_member
    return sc.has_any_key(t, _TRAFFIC_FIRST_LEVEL_KEYS) & member


def build_traffic(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    cols, _osm_type = _traffic_cols(osm)
    member = _traffic_member(t)
    # nodes and ways only — traffic.lua defines no relation handler
    # (traffic.lua:266-292 registers process_node/process_way exclusively);
    # closed noexit ways are skipped ("noexit does not make sense for
    # polygons", traffic.lua:242-256)
    return {
        "traffic_point": _project(osm.filter(_is_node(osm) & member), cols),
        "traffic_line": _project(osm.filter(_is_way(osm) & ~_closed(osm) & member), cols),
        "traffic_polygon": _project(
            osm.filter(_is_way(osm) & _closed(osm) & _traffic_member(t, with_noexit=False)),
            cols,
            with_members=True,
        ),
    }


# ---------------------------------------------------------------------------
# tags / unitable escape hatches (/root/reference/flex-config/style/tags.lua,
# unitable.lua)
# ---------------------------------------------------------------------------

def build_tags(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    f = osm.filter(tagf.has_tags_after_clean(t))
    out = f.select(
        "osm_id", "geom_type",
        tagf.clean_tags(t).alias("tags"),
        sc.osm_url(F.col("geom_type"), F.col("osm_id")).alias("osm_url"),
    )
    return {"tags": out}


def build_unitable(osm: DataFrame) -> dict[str, DataFrame]:
    t = F.col("tags")
    f = osm.filter(tagf.has_tags_after_clean(t))
    out = f.select(
        "osm_id", "geom_type", "lon", "lat", "geom_wkb",
        tagf.clean_tags(t).alias("tags"),
    )
    return {"unitable": out}


# ---------------------------------------------------------------------------
# combined_point layers: polygons collapse to centroid so points+polygons
# land in one table (/root/reference/flex-config/style/building_combined_point.lua:123,169)
# — centroid itself is applied by operators.centroid_collapse (pandas UDF over
# WKB); here we just union the souce rows with a marker of what needs collapsing.
# ---------------------------------------------------------------------------

def _combined(builder: Callable[[DataFrame], dict[str, DataFrame]], point_tbl: str,
              poly_tbl: str, out_name: str) -> Callable[[DataFrame], dict[str, DataFrame]]:
    def build(osm: DataFrame) -> dict[str, DataFrame]:
        parts = builder(osm)
        point = parts[point_tbl].withColumn("geom_src", F.lit("point"))
        poly = parts[poly_tbl].withColumn("geom_src", F.lit("polygon"))
        return {out_name: point.unionByName(poly, allowMissingColumns=True)}

    return build


build_building_combined_point = _combined(
    build_building, "building_point", "building_polygon", "building_combined_point"
)
build_poi_combined_point = _combined(build_poi, "poi_point", "poi_polygon", "poi_combined_point")
build_shop_combined_point = _combined(build_shop, "shop_point", "shop_polygon", "shop_combined_point")


# ---------------------------------------------------------------------------
# registry + layersets
# ---------------------------------------------------------------------------

LAYER_BUILDERS: dict[str, Callable[[DataFrame], dict[str, DataFrame]]] = {
    "amenity": build_amenity,
    "building": build_building,
    "building_combined_point": build_building_combined_point,
    "indoor": build_indoor,
    "infrastructure": build_infrastructure,
    "landuse": build_landuse,
    "leisure": build_leisure,
    "natural": build_natural,
    "place": build_place,
    "poi": build_poi,
    "poi_combined_point": build_poi_combined_point,
    "public_transport": build_public_transport,
    "road": build_road,
    "road_major": build_road_major,
    "shop": build_shop,
    "shop_combined_point": build_shop_combined_point,
    "tags": build_tags,
    "traffic": build_traffic,
    "unitable": build_unitable,
    "water": build_water,
}

# /root/reference/flex-config/layerset/*.ini
LAYERSETS: dict[str, list[str]] = {
    "minimal": ["place", "poi_combined_point", "road_major"],
    "basic": [
        "building_combined_point", "landuse", "place", "poi_combined_point",
        "road_major", "unitable",
    ],
    "default": [
        "amenity", "building", "indoor", "infrastructure", "landuse", "leisure",
        "natural", "place", "poi", "public_transport", "road", "shop", "tags",
        "traffic", "water",
    ],
    "everything": sorted(LAYER_BUILDERS),
}

# full table inventory (42 tables / 20 layers; SURVEY.md §1.3)
_LAYER_TABLES: dict[str, list[tuple[str, str]]] = {
    "amenity": [("amenity_point", "point"), ("amenity_line", "line"), ("amenity_polygon", "polygon")],
    "building": [("building_point", "point"), ("building_polygon", "polygon")],
    "building_combined_point": [("building_combined_point", "combined_point")],
    "indoor": [("indoor_point", "point"), ("indoor_line", "line"), ("indoor_polygon", "polygon")],
    "infrastructure": [("infrastructure_point", "point"), ("infrastructure_line", "line"), ("infrastructure_polygon", "polygon")],
    "landuse": [("landuse_point", "point"), ("landuse_polygon", "polygon")],
    "leisure": [("leisure_point", "point"), ("leisure_polygon", "polygon")],
    "natural": [("natural_point", "point"), ("natural_line", "line"), ("natural_polygon", "polygon")],
    "place": [("place_point", "point"), ("place_line", "line"), ("place_polygon", "polygon")],
    "poi": [("poi_point", "point"), ("poi_line", "line"), ("poi_polygon", "polygon")],
    "poi_combined_point": [("poi_combined_point", "combined_point")],
    "public_transport": [("public_transport_point", "point"), ("public_transport_line", "line"), ("public_transport_polygon", "polygon")],
    "road": [("road_point", "point"), ("road_line", "line"), ("road_polygon", "polygon")],
    "road_major": [("road_major", "line")],
    "shop": [("shop_point", "point"), ("shop_polygon", "polygon")],
    "shop_combined_point": [("shop_combined_point", "combined_point")],
    "tags": [("tags", "none")],
    "traffic": [("traffic_point", "point"), ("traffic_line", "line"), ("traffic_polygon", "polygon")],
    "unitable": [("unitable", "any")],
    "water": [("water_point", "point"), ("water_line", "line"), ("water_polygon", "polygon")],
}

TABLES: list[TableSpec] = [
    TableSpec(layer=layer, name=name, kind=kind)
    for layer, tbls in sorted(_LAYER_TABLES.items())
    for name, kind in tbls
]


def resolve_layerset_path(cli_value: str | None) -> str | None:
    """The JOB-boundary resolution the reference applies to the layerset
    directory: an explicit ``--layerset-path`` wins, else PGOSM_LAYERSET_PATH
    (docker/pgosm_flex.py:474-515), else the built-in names. Library code
    never reads the env var — :func:`layerset_layers` is argument-only so
    library results cannot change under an ambient environment (the same
    determinism contract as ``scalars.resolve_language``)."""
    if cli_value is not None:
        return cli_value or None
    return os.environ.get("PGOSM_LAYERSET_PATH") or None


def layerset_layers(layerset: str, layerset_path: str | None = None) -> list[str]:
    """Layer names a layerset enables.

    Without ``layerset_path`` the four built-in names resolve from
    :data:`LAYERSETS` — the same lists the reference ships as
    ``flex-config/layerset/{minimal,basic,default,everything}.ini``. With a
    path, ``<path>/<layerset>.ini`` is parsed with the reference's
    custom-layerset semantics
    (/root/reference/flex-config/layerset.lua:17-28, run.lua:5-103,
    docker/pgosm_flex.py:474-515): a ``[layerset]`` section where a layer is
    enabled iff its value is ``true`` (case-insensitive; missing or ``false``
    disables — the Lua nil / Python ``.lower() == 'true'`` gate), and keys
    naming no known layer are ignored exactly as run.lua's fixed checklist
    ignores them.

    Argument-only by design: PGOSM_LAYERSET_PATH is honored at the job
    boundary via :func:`resolve_layerset_path`, never here."""
    if layerset_path is None:
        try:
            return LAYERSETS[layerset]
        except KeyError:
            raise ValueError(
                f"unknown layerset {layerset!r}; options: {sorted(LAYERSETS)} "
                "(or pass layerset_path / set PGOSM_LAYERSET_PATH for a "
                "custom INI)"
            )
    import configparser

    ini_file = os.path.join(layerset_path, f"{layerset}.ini")
    parser = configparser.ConfigParser()
    if not parser.read(ini_file):
        raise FileNotFoundError(f"layerset INI not found: {ini_file}")
    if "layerset" not in parser:
        raise ValueError(f"{ini_file}: missing [layerset] section")
    return sorted(
        layer
        for layer, value in parser["layerset"].items()
        if layer in LAYER_BUILDERS and value.lower() == "true"
    )


def build_layer_tables(
    osm: DataFrame,
    layerset: str = "everything",
    layerset_path: str | None = None,
    language: str | None = None,
) -> dict[str, DataFrame]:
    """One shared scan → every enabled layer's output tables.

    Callers should ``osm.cache()`` (or persist to a staged table) before this
    at scale: each layer re-filters the same frame and Spark will otherwise
    re-read the source per table. Catalyst pushes each layer's tag predicate
    into its scan either way.

    ``language`` sets the best-name preference every table's ``name`` column
    applies (``name:<language>`` first — the reference's PGOSM_LANGUAGE,
    helpers.lua:28-34,189-196); ``None`` defers to the thread's
    :func:`pgosm_flex_spark.functions.scalars.name_language` scope (no
    preference when none is active — library results never depend on
    ambient env vars; jobs resolve PGOSM_LANGUAGE via
    ``scalars.resolve_language``), ``""`` forces the unlocalized chain.
    """
    out: dict[str, DataFrame] = {}
    with sc.name_language(language if language is not None else sc.default_name_language()):
        for layer in layerset_layers(layerset, layerset_path):
            for name, df in LAYER_BUILDERS[layer](osm).items():
                out[name] = df
    return out


# ---------------------------------------------------------------------------
# per-table membership predicates — the single-scan dispatch surface
# (layers/router.py). Each predicate is the conjunction of the same filter
# pieces its LAYER_BUILDERS twin chains through DataFrame.filter calls
# (Catalyst collapses chained filters to the same conjunction), built from
# the SAME helper functions so the logic lives once. Lockstep with the
# builders is enforced by tests/test_router.py: per-table id-set equality
# on a fixture covering every geometry variant.
# ---------------------------------------------------------------------------

def layer_table_predicates(
    layerset: str = "everything", layerset_path: str | None = None
) -> dict[str, Column]:
    """table name → boolean membership Column (unbound; evaluate against any
    frame with the osm-objects schema). NULL predicates count as non-members,
    matching ``DataFrame.filter`` three-valued semantics."""
    t = F.col("tags")
    node, way, rel = _is_node(None), _is_way(None), _is_rel(None)
    closed = _closed(None)
    way_open = way & ~closed
    way_closed = way & closed
    poly_std = way_closed | (rel & _rel_is_poly(None))

    p: dict[str, Column] = {}

    # geometry conjunct FIRST in every predicate: one column comparison
    # short-circuits the tag logic for rows of the wrong geometry class
    # (And evaluates left-to-right in both codegen and interpreted paths).
    # amenity/shop/traffic/infrastructure use the flat member helpers —
    # row-set equal to the builders' CASE.isNotNull() filters (derivations
    # on each helper; equality pinned by tests/test_router.py).
    place = _place_filter(None)
    p["place_point"] = node & place
    p["place_line"] = way_open & place
    p["place_polygon"] = (way_closed | rel) & place

    road = T(t, "highway").isNotNull()
    road_wr = (way | rel) & road
    area = _road_is_area(None)
    p["road_point"] = node & road
    p["road_line"] = road_wr & ~area
    p["road_polygon"] = road_wr & area
    p["road_major"] = p["road_line"] & sc.major_road(T(t, "highway"))

    poi = _poi_filter(None)
    p["poi_point"] = node & poi
    p["poi_line"] = way_open & poi
    p["poi_polygon"] = poly_std & poi

    building = _building_filter(None)
    p["building_point"] = node & building
    p["building_polygon"] = poly_std & building

    water = T(t, "natural").isin(WATER_NATURAL_VALUES) | T(t, "waterway").isNotNull()
    p["water_point"] = node & water
    p["water_line"] = way_open & water
    p["water_polygon"] = poly_std & water

    amenity = _amenity_member(t)
    p["amenity_point"] = node & amenity
    p["amenity_line"] = way_open & amenity
    p["amenity_polygon"] = poly_std & amenity

    shop = _shop_member(t)
    p["shop_point"] = node & shop
    p["shop_polygon"] = poly_std & shop

    for key, prefix in (("landuse", "landuse"), ("leisure", "leisure")):
        single = T(t, key).isNotNull()
        p[f"{prefix}_point"] = node & single
        p[f"{prefix}_polygon"] = poly_std & single

    natural = T(t, "natural").isNotNull() & ~T(t, "natural").isin(WATER_NATURAL_VALUES)
    p["natural_point"] = node & natural
    p["natural_line"] = way_open & natural
    p["natural_polygon"] = poly_std & natural

    indoor = sc.has_any_key(t, ["indoor", "door", "entrance"])
    p["indoor_point"] = node & indoor
    p["indoor_line"] = way_open & indoor
    p["indoor_polygon"] = poly_std & indoor

    infra = _infrastructure_member(t)
    p["infrastructure_point"] = node & infra
    p["infrastructure_line"] = way_open & infra
    p["infrastructure_polygon"] = poly_std & infra

    pt = sc.has_any_key(t, ["public_transport", "aerialway", "railway"])
    p["public_transport_point"] = node & pt
    p["public_transport_line"] = way_open & pt
    p["public_transport_polygon"] = poly_std & pt

    traffic = _traffic_member(t)
    p["traffic_point"] = node & traffic
    p["traffic_line"] = way_open & traffic
    p["traffic_polygon"] = way_closed & _traffic_member(t, with_noexit=False)

    has_tags = tagf.has_tags_after_clean(t)
    p["tags"] = has_tags
    p["unitable"] = has_tags

    for base_layer in ("building", "poi", "shop"):
        p[f"{base_layer}_combined_point"] = (
            p[f"{base_layer}_point"] | p[f"{base_layer}_polygon"]
        )

    wanted = _wanted_tables(layerset, layerset_path)
    return {name: pred for name, pred in p.items() if name in wanted}


def _wanted_tables(layerset: str, layerset_path: str | None = None) -> set[str]:
    """Table names a layerset resolves to — the ONE place layerset →
    table-set resolution lives (predicate and projection surfaces must
    filter identically or route_layer_rows silently diverges)."""
    return {
        name
        for layer in layerset_layers(layerset, layerset_path)
        for name, _kind in _LAYER_TABLES[layer]
    }


def layer_table_columns(
    layerset: str = "everything",
    layerset_path: str | None = None,
    language: str | None = None,
) -> dict[str, dict[str, Column]]:
    """table name → its FULL output projection as named Column exprs, in the
    builders' column order (base cols, member_ids for polygon tables, then
    the layer's derived columns) — the second half of the spec surface that
    ``layer_table_predicates`` starts: together they let a consumer rebuild
    any table as ``osm.filter(pred).select(cols)`` or fuse ALL tables into
    one routed pass (layers/router.py:route_layer_rows). Reuses the same
    ``_*_cols`` helpers the builders call, so the exprs cannot drift; output
    equality with the builders is pinned by tests/test_router.py.

    ``language`` as in :func:`build_layer_tables` — the name exprs capture
    it at construction time."""
    with sc.name_language(language if language is not None else sc.default_name_language()):
        return _layer_table_columns(layerset, layerset_path)


def _layer_table_columns(
    layerset: str, layerset_path: str | None
) -> dict[str, dict[str, Column]]:
    t = F.col("tags")

    def full(extra: dict[str, Column], with_members: bool = False) -> dict[str, Column]:
        out: dict[str, Column] = {c: F.col(c) for c in _BASE_COLS}
        if with_members:
            out["member_ids"] = F.col("member_ids")
        out.update(extra)
        return out

    cols: dict[str, dict[str, Column]] = {}

    place = _place_cols(None)
    cols["place_point"] = full(place)
    cols["place_line"] = full(place)
    cols["place_polygon"] = full(place, with_members=True)

    road_point = {**_road_common(t), "oneway": sc.parse_oneway(T(t, "oneway"))}
    road_line = {**road_point, **_road_routable(t)}
    road_poly = {**_road_common(t), **_road_routable(t)}
    cols["road_point"] = full(road_point)
    cols["road_line"] = full(road_line, with_members=True)
    cols["road_polygon"] = full(road_poly, with_members=True)
    cols["road_major"] = full(road_line, with_members=True)

    poi = _poi_cols(None)
    cols["poi_point"] = full(poi)
    cols["poi_line"] = full(poi)
    cols["poi_polygon"] = full(poi, with_members=True)

    building = _building_cols(None)
    cols["building_point"] = full(building)
    cols["building_polygon"] = full(building, with_members=True)

    water = _water_cols(None)
    cols["water_point"] = full(water)
    cols["water_line"] = full(water)
    cols["water_polygon"] = full(water, with_members=True)

    amenity = _amenity_cols(None)
    cols["amenity_point"] = full(amenity)
    cols["amenity_line"] = full(amenity)
    cols["amenity_polygon"] = full(amenity, with_members=True)

    shop = _shop_cols(None)
    cols["shop_point"] = full(shop)
    cols["shop_polygon"] = full(shop, with_members=True)

    for key, prefix in (("landuse", "landuse"), ("leisure", "leisure")):
        single = {"osm_type": T(t, key), "name": sc.get_name(t)}
        cols[f"{prefix}_point"] = full(single)
        cols[f"{prefix}_polygon"] = full(single, with_members=True)

    natural = {
        "osm_type": T(t, "natural"),
        "name": sc.get_name(t),
        "ele": sc.parse_to_meters(T(t, "ele")),
    }
    cols["natural_point"] = full(natural)
    cols["natural_line"] = full(natural)
    cols["natural_polygon"] = full(natural, with_members=True)

    indoor = _indoor_cols(None)
    cols["indoor_point"] = full(indoor)
    cols["indoor_line"] = full(indoor)
    cols["indoor_polygon"] = full(indoor, with_members=True)

    infra = _infrastructure_cols(None)[0]
    cols["infrastructure_point"] = full(infra)
    cols["infrastructure_line"] = full(infra)
    cols["infrastructure_polygon"] = full(infra, with_members=True)

    pt_cols = _public_transport_cols(None)
    cols["public_transport_point"] = full(pt_cols)
    cols["public_transport_line"] = full(pt_cols)
    cols["public_transport_polygon"] = full(pt_cols, with_members=True)

    traffic = _traffic_cols(None)[0]
    cols["traffic_point"] = full(traffic)
    cols["traffic_line"] = full(traffic)
    cols["traffic_polygon"] = full(traffic, with_members=True)

    cols["tags"] = {
        "osm_id": F.col("osm_id"),
        "geom_type": F.col("geom_type"),
        "tags": tagf.clean_tags(t),
        "osm_url": sc.osm_url(F.col("geom_type"), F.col("osm_id")),
    }
    cols["unitable"] = {
        "osm_id": F.col("osm_id"),
        "geom_type": F.col("geom_type"),
        "lon": F.col("lon"),
        "lat": F.col("lat"),
        "geom_wkb": F.col("geom_wkb"),
        "tags": tagf.clean_tags(t),
    }

    preds = layer_table_predicates()
    for base_layer, base_cols in (
        ("building", building), ("poi", poi), ("shop", shop)
    ):
        # combined tables union point rows + polygon rows (centroid collapse
        # happens downstream); unionByName(allowMissingColumns) puts the
        # polygon-only member_ids last and marks provenance in geom_src
        c = full(base_cols)
        c["geom_src"] = F.when(preds[f"{base_layer}_point"], F.lit("point")).otherwise(
            F.lit("polygon")
        )
        c["member_ids"] = F.when(
            preds[f"{base_layer}_polygon"], F.col("member_ids")
        ).otherwise(F.lit(None).cast("array<bigint>"))
        cols[f"{base_layer}_combined_point"] = c

    wanted = _wanted_tables(layerset, layerset_path)
    return {name: c for name, c in cols.items() if name in wanted}
