"""QC lint rules over the ``tags`` table — SURVEY.md U4.

Re-expresses /root/reference/db/qc/osm_tag_suggestions.sql:11-75: a UNION of
rule queries flagging tag combinations a human mapper should review. Each
rule is a native Column predicate over the tags map; the union is a plain
unionByName (the reference's UNION dedup is a no-op here — a row matching
two different rules yields two distinct suggestion rows either way).

Suggestion strings are verbatim from the reference (including its typos
'Invald'/'wheelchar') so downstream consumers match byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.functions.scalars import t as T

SUGGESTION_BICYCLE_PARKING = (
    "Update to: amenity=bicycle_parking per "
    "https://wiki.openstreetmap.org/wiki/Key:bicycle_parking"
)
SUGGESTION_BENCH = (
    'Invald bench value. Valid values for `bench` are "yes" and "no" per '
    "https://wiki.openstreetmap.org/wiki/Key:bench"
)
SUGGESTION_WHEELCHAIR = (
    'Invald wheelchair value. Valid values for `wheelchar` are "yes", "no" '
    'and "limited" per https://wiki.openstreetmap.org/wiki/Key:wheelchair'
)
SUGGESTION_SHOP_CAFE = (
    "Invalid shop value.  Consider amenity=cafe for a sit-down coffee shop, "
    "or shop=coffee for places without seating.  See "
    "https://wiki.openstreetmap.org/wiki/Tag:shop%3Dcoffee."
)
SUGGESTION_NATURAL_STREET_LAMP = (
    "Invalid natural value.  Consider highway=street_lamp.  If a light is "
    "attached to a tree, consider adding support=tree as well. "
    "https://wiki.openstreetmap.org/wiki/Tag:highway%3Dstreet_lamp"
)
SUGGESTION_MISSING_STREET = (
    "Missing addr:street tag when record has addr:housenumber."
)


def _rules(t: Column) -> list[tuple[Column, str]]:
    """(predicate, suggestion) pairs — one per reference rule, same order
    (osm_tag_suggestions.sql:12-57)."""
    return [
        (
            T(t, "bicycle_parking").isNotNull() & T(t, "amenity").isNull(),
            SUGGESTION_BICYCLE_PARKING,
        ),
        (
            T(t, "amenity").isNull()
            & T(t, "bench").isNotNull()
            & ~T(t, "bench").isin("yes", "no"),
            SUGGESTION_BENCH,
        ),
        (
            T(t, "wheelchair").isNotNull()
            & ~T(t, "wheelchair").isin("yes", "no", "limited"),
            SUGGESTION_WHEELCHAIR,
        ),
        (T(t, "shop") == "cafe", SUGGESTION_SHOP_CAFE),
        (T(t, "natural") == "street_lamp", SUGGESTION_NATURAL_STREET_LAMP),
        (
            T(t, "addr:housenumber").isNotNull() & T(t, "addr:street").isNull(),
            SUGGESTION_MISSING_STREET,
        ),
    ]


def qc_tag_suggestions(tags_table: DataFrame) -> DataFrame:
    """tags table (osm_id, geom_type, tags, osm_url) → suggestion rows
    (geom_type, osm_id, suggestion, osm_url, tags)."""
    t = F.col("tags")
    parts = [
        tags_table.filter(cond).select(
            "geom_type", "osm_id", F.lit(text).alias("suggestion"), "osm_url", "tags"
        )
        for cond, text in _rules(t)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
