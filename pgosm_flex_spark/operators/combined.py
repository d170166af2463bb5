"""Centroid collapse for *_combined_point layers — SURVEY.md P20.

The reference's building/shop/poi combined_point layers insert polygon rows
as their centroid so points+polygons share one point table
(/root/reference/flex-config/style/building_combined_point.lua:123,169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.geometry.udfs import centroid_udf


def collapse_to_points(combined: DataFrame) -> DataFrame:
    """Rows marked geom_src='polygon' get lon/lat replaced by the polygon
    centroid (vectorized UDF); point rows pass through untouched."""
    needs = F.col("geom_src") == "polygon"
    c = centroid_udf(F.col("geom_wkb"))
    return (
        combined.withColumn("__c", F.when(needs, c))
        .withColumn("lon", F.coalesce(F.col("__c.lon"), F.col("lon")))
        .withColumn("lat", F.coalesce(F.col("__c.lat"), F.col("lat")))
        .drop("__c", "geom_wkb")
    )
