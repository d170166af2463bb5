"""Seeded lookup/dimension tables — SURVEY.md S6.

``pgosm.road``: per-osm_type routability defaults, maxspeed and traffic
penalty, seeded verbatim from /root/reference/db/data/roads-us.sql:3-36
(25 rows; golden count check tests/sql/pgosm_road_row_count.sql). The
``maxspeed_mph`` generated column (db/deploy/pgosm_road.sql:16-18) is a
plain computed column here. Always broadcast — it's the canonical small dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (osm_type, route_motor, route_foot, route_cycle, maxspeed_kmh, traffic_penalty)
ROADS_US = [
    ("motorway", True, False, False, 104.60736, 0.75),
    ("motorway_link", True, False, False, 104.60736, 0.72),
    ("trunk", True, False, True, 96.56064, 0.75),
    ("trunk_link", True, False, True, 96.56064, 0.72),
    ("primary", True, False, True, 96.56064, 0.6),
    ("primary_link", True, False, True, 96.56064, 0.6),
    ("secondary", True, False, True, 72.42048, 0.6),
    ("secondary_link", True, False, True, 72.42048, 0.6),
    ("tertiary", True, False, True, 72.42048, 0.6),
    ("tertiary_link", True, False, True, 72.42048, 0.6),
    ("residential", True, True, True, 40.2336, 0.95),
    ("service", True, True, True, 40.2336, 0.95),
    ("unclassified", True, True, True, 30.0, 0.95),
    ("proposed", False, False, False, -1.0, 1.0),
    ("planned", False, False, False, -1.0, 1.0),
    ("path", False, True, True, 4.0, 1.0),
    ("footway", False, True, False, 4.0, 1.0),
    ("track", False, True, True, 2.0, 1.0),
    ("pedestrian", False, True, False, 4.0, 1.0),
    ("cycleway", False, True, True, 32.0, 0.95),
    ("crossing", False, True, True, 2.0, 0.3),
    ("platform", False, True, False, 2.0, 0.3),
    ("social_path", False, True, False, 3.0, 0.7),
    ("steps", False, True, False, 2.0, 0.9),
    ("trailhead", False, True, True, 3.0, 0.9),
]


def pgosm_road(spark: SparkSession, region: str = "United States") -> DataFrame:
    df = spark.createDataFrame(
        [(region, *r) for r in ROADS_US],
        schema="region string, osm_type string, route_motor boolean, "
        "route_foot boolean, route_cycle boolean, maxspeed double, "
        "traffic_penalty_normal double",
    )
    return df.withColumn("maxspeed_mph", F.round(F.col("maxspeed") / 1.609344, 2))
