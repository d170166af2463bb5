"""kNN nearest-feature join — SURVEY.md J8.

The reference delegates nearest-feature lookups to PostGIS GiST ``<->``
practice (no SQL in-tree; closest analog: vertex inputs to
/root/reference/db/deploy/routing_functions.sql:553-561). The north star
requires it explicitly: H3-style k-ring expansion + equi-join + window.

Plan shape: features are bucketed by cell at ``res``; each query point
explodes its (2k+1)² ring of neighbor cells (native sequence/transform —
no UDF), equi-joins feature buckets on the cell key, computes haversine
distance JVM-side, and keeps the top-k per point with a window. With a
broadcast feature side this is map-only over the points.

Completeness: a neighbor beyond the ring radius is missed. Callers pick
``res``/``ring`` so that the ring radius covers the max expected
nearest-neighbor distance (ring_radius ≈ ring × cell_width(res)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pgosm_flex_spark.index import cells

EARTH_RADIUS_M = 6_371_008.8


def haversine_m_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Geodesic distance in meters — native column math (JVM codegen)."""
    rl1 = F.radians(lat1)
    rl2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def knn_join(
    points: DataFrame,
    features: DataFrame,
    k: int,
    point_id: str = "image_id",
    feature_id: str = "osm_id",
    res: int = 10,
    ring: int = 1,
    lon: str = "lon",
    lat: str = "lat",
    f_lon: str = "lon",
    f_lat: str = "lat",
    broadcast_features: bool = True,
) -> DataFrame:
    """For each point, its k nearest features within the cell ring.

    Output: point columns ``point_id``, ``feature_id``, ``distance_m``,
    ``knn_rank`` (1-based). Deterministic ties: (distance, feature_id).
    """
    feats = features.select(
        F.col(feature_id).alias("__fid"),
        F.col(f_lon).alias("__flon"),
        F.col(f_lat).alias("__flat"),
    ).withColumn("__fcell", cells.cell_col(F.col("__flon"), F.col("__flat"), res))
    if broadcast_features:
        feats = F.broadcast(feats)

    pts = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lon).alias("__plon"),
        F.col(lat).alias("__plat"),
    ).withColumn("__pcell", cells.cell_col(F.col("__plon"), F.col("__plat"), res))

    ringed = pts.withColumn(
        "__cell", F.explode(cells.kring_col(F.col("__pcell"), ring, res))
    )
    cand = ringed.join(feats, ringed["__cell"] == feats["__fcell"], "inner")
    cand = cand.withColumn(
        "__dist",
        haversine_m_col(F.col("__plon"), F.col("__plat"), F.col("__flon"), F.col("__flat")),
    )
    w = Window.partitionBy("__pid").orderBy(F.col("__dist").asc(), F.col("__fid").asc())
    out = (
        cand.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            F.col("__pid").alias(point_id),
            F.col("__fid").alias(feature_id),
            F.col("__dist").alias("distance_m"),
            "knn_rank",
        )
    )
    return out
