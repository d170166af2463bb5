"""The reference's scalar-function library as native Spark column expressions.

Each function re-expresses one helper from
/root/reference/flex-config/helpers.lua (cited per function) over a
``MapType(string,string)`` tags column. Everything is pure Column algebra —
no Python UDFs — so the whole tag→schema mapping layer stays inside
whole-stage codegen and its predicates remain pushdown-eligible.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import Column
from pyspark.sql import functions as F


def t(tags: Column, key: str) -> Column:
    """tags[key] (NULL when absent) — `object.tags.<key>` in Lua."""
    return F.element_at(tags, key)


# ---------------------------------------------------------------------------
# name-language preference (PGOSM_LANGUAGE)
# ---------------------------------------------------------------------------

# Sentinel distinguishing "caller said nothing" (→ resolve the scoped
# default) from an explicit language=None/"" (→ no preference).
_LANG_UNSET = object()
# Scoped override set by name_language() — THREAD-LOCAL: plan construction
# happens on driver threads (the import job builds its fixed world on a
# pool thread) and a process-global would cross-contaminate concurrent
# builds with different languages.
_lang_scope = threading.local()


@contextmanager
def name_language(language: str | None):
    """Scope the default language ``get_name`` prefers — the Spark analog of
    the reference's global ``pgosm_language``
    (/root/reference/flex-config/helpers.lua:28-34: set once, consulted by
    every style's name column). ``None``/empty means no preference. Column
    expressions capture the language at construction time, so plans built
    inside the scope keep it after exit. The scope is per-thread."""
    prev = getattr(_lang_scope, "value", None)
    _lang_scope.value = language or None
    try:
        yield
    finally:
        _lang_scope.value = prev


def default_name_language() -> str | None:
    """The language ``get_name`` uses when the caller passes none: the
    current thread's innermost :func:`name_language` scope, else no
    preference. Deliberately NOT environment-sensitive — library results
    must not change under an ambient env var (oracle parity); the import
    job resolves PGOSM_LANGUAGE (the reference's channel,
    helpers.lua:28-34) into an explicit argument at its own boundary
    (:func:`resolve_language`)."""
    return getattr(_lang_scope, "value", None)


def resolve_language(cli_value: str | None) -> str | None:
    """The JOB-boundary resolution the reference applies: an explicit
    ``--language`` wins, else PGOSM_LANGUAGE, else no preference. Library
    code never calls this — determinism stops at the job surface."""
    if cli_value is not None:
        return cli_value or None
    return os.environ.get("PGOSM_LANGUAGE") or None


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------

def has_any_key(tags: Column, keys: list[str]) -> Column:
    """make_check_in_list_func (/root/reference/flex-config/helpers.lua:59-72):
    true iff any tag key is in ``keys``."""
    return F.arrays_overlap(F.map_keys(tags), F.array(*[F.lit(k) for k in keys]))


MAJOR_ROAD_VALUES = [
    "motorway", "motorway_link", "primary", "primary_link", "secondary",
    "secondary_link", "tertiary", "tertiary_link", "trunk", "trunk_link",
]


def major_road(highway: Column) -> Column:
    """major_road (/root/reference/flex-config/helpers.lua:151-168)."""
    return F.coalesce(highway.isin(MAJOR_ROAD_VALUES), F.lit(False))


# ---------------------------------------------------------------------------
# unit parsing
# ---------------------------------------------------------------------------

def parse_to_meters(value: Column) -> Column:
    """parse_to_meters (/root/reference/flex-config/helpers.lua:75-105):
    "1800" → 1800; "1955 m" → 1955; "8001 ft" → 8001*0.3048; else NULL.
    Lua tonumber tolerates surrounding whitespace — try_cast(trim(...)) does too.
    """
    plain = F.trim(value).try_cast("double")
    no_m = F.trim(F.substring(value, 1, F.length(value) - F.lit(1))).try_cast("double")
    no_ft = F.trim(F.substring(value, 1, F.length(value) - F.lit(2))).try_cast("double")
    return F.when(value.isNull(), F.lit(None).cast("double")).otherwise(
        F.coalesce(
            plain,
            F.when(value.endswith("m"), no_m),
            F.when(value.endswith("ft"), no_ft * F.lit(0.3048)),
        )
    )


def parse_speed(value: Column) -> Column:
    """parse_speed (/root/reference/flex-config/helpers.lua:108-131):
    number → km/h as-is; "NN mph" → floor(NN*1.60934); else NULL."""
    plain = F.trim(value).try_cast("double")
    no_mph = F.trim(F.substring(value, 1, F.length(value) - F.lit(3))).try_cast("double")
    return F.coalesce(
        plain,
        F.when(value.endswith("mph"), F.floor(no_mph * F.lit(1.60934)).cast("double")),
    )


def parse_layer_value(value: Column) -> Column:
    """parse_layer_value (/root/reference/flex-config/helpers.lua:134-148):
    numeric → value else 0 (never NULL)."""
    return F.coalesce(F.trim(value).try_cast("double").cast("int"), F.lit(0))


def parse_admin_level(value: Column) -> Column:
    """parse_admin_level (/root/reference/flex-config/helpers.lua:263-276):
    numeric → value else NULL."""
    return F.trim(value).try_cast("double").cast("int")


def parse_oneway(value: Column) -> Column:
    """oneway → {-1,0,1}: osm2pgsql's ``direction`` column type
    (/root/reference/flex-config/style/road.lua:19,40) applied to
    ``tags.oneway or 0`` (road.lua:94,133): 'yes'/'true'/'1' → 1, '-1' → -1,
    everything else (incl. 'no', 'reversible', absent) → 0."""
    return (
        F.when(value.isin("yes", "true", "1"), F.lit(1))
        .when(value == "-1", F.lit(-1))
        .otherwise(F.lit(0))
        .cast("short")
    )


# ---------------------------------------------------------------------------
# best-name / best-ref / address
# ---------------------------------------------------------------------------

def _first_name_colon_value(tags: Column) -> Column:
    """get_name_last_ditch's map scan
    (/root/reference/flex-config/helpers.lua:212-227): any 'name:*' or '*:NAME'
    key. Lua's pairs() order is hash-nondeterministic; this engine makes it
    deterministic: smallest key by bytewise sort wins. Divergence documented.
    """
    matches = F.filter(
        F.array_sort(F.map_entries(tags)),
        lambda e: e["key"].startswith("name:") | e["key"].endswith(":NAME"),
    )
    return F.when(F.size(matches) > 0, F.element_at(matches, 1)["value"])


def get_name(tags: Column, language: str | None | object = _LANG_UNSET) -> Column:
    """get_name (/root/reference/flex-config/helpers.lua:184-227):
    name:<lang> > name > short_name > alt_name > loc_name > old_name >
    first name:* / *:NAME value > ''. Never NULL.

    ``language`` defaults to the scoped / PGOSM_LANGUAGE preference
    (:func:`default_name_language`); pass ``None`` or ``""`` to force the
    unlocalized chain regardless of scope."""
    if language is _LANG_UNSET:
        language = default_name_language()
    chain = []
    if language:
        chain.append(t(tags, f"name:{language}"))
    chain += [
        t(tags, "name"),
        t(tags, "short_name"),
        t(tags, "alt_name"),
        t(tags, "loc_name"),
        t(tags, "old_name"),
        _first_name_colon_value(tags),
        F.lit(""),
    ]
    return F.coalesce(*chain)


def get_ref(tags: Column) -> Column:
    """get_ref (/root/reference/flex-config/helpers.lua:239-260): priority
    chain, NULL when nothing set."""
    return F.coalesce(
        t(tags, "local_ref"),
        t(tags, "route_ref"),
        t(tags, "nat_ref"),
        t(tags, "ref"),
        t(tags, "alt_ref"),
        t(tags, "old_ref"),
    )


def get_wheelchair_desc(tags: Column) -> Column:
    """get_wheelchair_desc (/root/reference/flex-config/helpers.lua:231-234)."""
    return t(tags, "wheelchair:description")


def get_address(tags: Column) -> Column:
    """get_address (/root/reference/flex-config/helpers.lua:381-438):
    "<housenumber> <street>, <city>, <state>, <postcode>" with each comma
    emitted only between two non-empty sides; '' when nothing set (the column
    is not_null, /root/reference/flex-config/style/poi.lua:26).

    The Lua cascade of pairwise joins is equivalent to joining the non-empty
    parts [housenumber⌣street, city, state, postcode] with ', '.
    """
    hn_street = F.concat_ws(
        " ",
        t(tags, "addr:housenumber"),
        t(tags, "addr:street"),
    )
    parts = F.array(
        hn_street,
        t(tags, "addr:city"),
        t(tags, "addr:state"),
        t(tags, "addr:postcode"),
    )
    nonempty = F.filter(parts, lambda p: p.isNotNull() & (p != ""))
    return F.array_join(nonempty, ", ")


# ---------------------------------------------------------------------------
# routability (deny-list beats allow-list)
# ---------------------------------------------------------------------------

_FOOT_HIGHWAYS = [
    "footway", "pedestrian", "crossing", "platform", "social_path", "steps",
    "trailhead", "track", "path", "unclassified", "service", "residential",
    "living_street", "elevator", "corridor", "foot",
]
_CYCLE_HIGHWAYS = [
    "cycleway", "track", "path", "unclassified", "service", "residential",
    "tertiary", "tertiary_link", "secondary", "secondary_link", "living_street",
]
_MOTOR_HIGHWAYS = [
    "motorway", "motorway_link", "trunk", "trunk_link", "primary",
    "primary_link", "secondary", "secondary_link", "tertiary", "tertiary_link",
    "residential", "service", "unclassified", "living_street", "rest_area",
    "raceway",
]


def _denied(tags: Column, mode_key: str) -> Column:
    access = t(tags, "access")
    mode = t(tags, mode_key)
    return (
        access.isin("no", "private") | mode.isin("no", "private")
    )


def routable_foot(tags: Column) -> Column:
    """routable_foot (/root/reference/flex-config/helpers.lua:279-310)."""
    allowed = (
        t(tags, "highway").isin(_FOOT_HIGHWAYS)
        | t(tags, "footway").isNotNull()
        | t(tags, "foot").isin("yes", "permissive", "designated")
    )
    return F.when(_denied(tags, "foot"), F.lit(False)).otherwise(
        F.coalesce(allowed, F.lit(False))
    )


def routable_cycle(tags: Column) -> Column:
    """routable_cycle (/root/reference/flex-config/helpers.lua:313-341)."""
    allowed = (
        t(tags, "cycleway").isNotNull()
        | t(tags, "bicycle").isin("yes", "designated", "permissive")
        | t(tags, "highway").isin(_CYCLE_HIGHWAYS)
    )
    return F.when(_denied(tags, "bicycle"), F.lit(False)).otherwise(
        F.coalesce(allowed, F.lit(False))
    )


def routable_motor(tags: Column) -> Column:
    """routable_motor (/root/reference/flex-config/helpers.lua:343-373)."""
    allowed = (
        t(tags, "highway").isin(_MOTOR_HIGHWAYS)
        | t(tags, "motor_vehicle").isin("yes", "permissive")
    )
    return F.when(_denied(tags, "motor_vehicle"), F.lit(False)).otherwise(
        F.coalesce(allowed, F.lit(False))
    )


# ---------------------------------------------------------------------------
# computed columns
# ---------------------------------------------------------------------------

def osm_url(geom_type: Column, osm_id: Column) -> Column:
    """Generated osm_url (/root/reference/flex-config/sql/tags.sql:9-19)."""
    return F.concat(
        F.lit("https://www.openstreetmap.org/"),
        F.when(geom_type == "N", F.lit("node"))
        .when(geom_type == "W", F.lit("way"))
        .otherwise(F.lit("relation")),
        F.lit("/"),
        osm_id.cast("string"),
    )


def maxspeed_mph(maxspeed_kmh: Column) -> Column:
    """Generated maxspeed_mph (/root/reference/db/deploy/pgosm_road.sql:16-18:
    ``maxspeed / 1.609344`` — the same formula sources/lookup.py applies, so
    the two surfaces can never drift in the low digits)."""
    return maxspeed_kmh / F.lit(1.609344)


def kmh_to_seconds_per_meter(speed_kmh: Column) -> Column:
    """convert.ttt_meters_km_hr_to_seconds
    (/root/reference/db/deploy/routing_functions.sql:328-333): traversal cost
    in seconds for 1 m at speed_kmh."""
    return F.lit(3.6) / speed_kmh
