"""Relation-member dedup — SURVEY.md J2.

The reference deletes standalone ways whose osm_id appears in any relation's
``member_ids`` array, per layer (place: /root/reference/flex-config/sql/place.sql:34-56;
water: sql/water.sql:42-87; road: sql/road.sql:39-84; road_major:
sql/road_major.sql:20-38; public_transport: sql/public_transport.sql:59-104).

Spark shape: explode the relations' member arrays and left-anti join. The
member list (relations only) is tiny relative to the way side, so it is
broadcast — the way side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relation_member_dedup(table: DataFrame, id_col: str = "osm_id") -> DataFrame:
    """Remove ways (osm_id > 0) that are members of any relation (osm_id < 0)
    present in the same table."""
    members = (
        table.filter(F.col(id_col) < 0)
        .select(F.explode("member_ids").alias(id_col))
        .distinct()
    )
    ways = table.filter(F.col(id_col) > 0)
    keep_ways = ways.join(F.broadcast(members), id_col, "left_anti")
    return keep_ways.unionByName(table.filter(F.col(id_col) < 0))
