"""End-to-end flagship pipeline — the Spark analog of a full PgOSM Flex import
(/root/reference/docker/pgosm_flex.py:76-195 steps 2-9, SURVEY.md §3.1).

One driver program: images → tag parse → layer registry → relation dedup →
containment join into the admin hierarchy → golden-count aggregates +
tile assignment. Process boundaries of the reference (Python↔osm2pgsql↔Lua↔PG)
collapse into Spark stage boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgosm_flex_spark import fixtures
from pgosm_flex_spark.functions import tags as tagf
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.operators import pip_join, relation_member_dedup
from pgosm_flex_spark.operators.pip_join import build_polygon_cover
from pgosm_flex_spark.operators.tiles import tile_counts


def image_points(images: DataFrame) -> DataFrame:
    """images table → geotagged tag-mapped point rows (caption → lon/lat/tags)."""
    return tagf.with_tags(images).filter(
        F.col("lon").isNotNull() & F.col("lat").isNotNull()
    )


def flagship_place_counts(
    spark: SparkSession,
    images: DataFrame,
    layerset: str = "everything",
) -> DataFrame:
    """PIP-join image points into the deduped place polygons and produce the
    reference's golden-count shape: rows of (osm_type, admin_level, n_images)
    (tests/sql/place_polygon_osm_type_count.sql shape, ordered bytewise —
    COLLATE "C" ≙ Spark's default binary string ordering)."""
    pts = image_points(images)
    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset=layerset)
    place = relation_member_dedup(tables["place_polygon"])
    polys = place.filter(F.col("geom_wkb").isNotNull())
    cover = build_polygon_cover(polys).persist()
    pairs = pip_join(pts, polys, point_cols=["image_id"], cover=cover)
    attrs = polys.select("osm_id", "osm_type", "admin_level")
    out = (
        pairs.join(F.broadcast(attrs), "osm_id")
        .groupBy("osm_type", "admin_level")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .orderBy("osm_type", "admin_level")
    )
    # materialize the (small) grouped result while the cover is cached,
    # then release the cache — repeated sweeps must not pile one orphaned
    # persist per call, and the returned frame must not lazily recompute
    # the whole join after the unpersist
    rows = out.collect()
    cover.unpersist(blocking=False)
    return spark.createDataFrame(rows, schema=out.schema)


def flagship_tiles(images: DataFrame, zoom: int = 12) -> DataFrame:
    return tile_counts(image_points(images), zoom)
