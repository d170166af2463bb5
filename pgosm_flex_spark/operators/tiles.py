"""Raster↔vector tile assignment — the north star's tiling step.

Maps each (image) point to its web-mercator z/x/y slippy tile and H3-style
cell per zoom, all native column math (the reference's SRID-3857 projection
convention, /root/reference/flex-config/helpers.lua:5-12, fixes the grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.index import cells, tiles


def assign_tiles(
    df: DataFrame,
    zooms: list[int],
    lon: str = "lon",
    lat: str = "lat",
    cell_res: int | None = None,
) -> DataFrame:
    """Add tile_z{z}_x / tile_z{z}_y columns per zoom (+ optional cell id)."""
    out = df
    for z in zooms:
        out = out.withColumn(f"tile_z{z}_x", tiles.tile_x_col(F.col(lon), z))
        out = out.withColumn(f"tile_z{z}_y", tiles.tile_y_col(F.col(lat), z))
    if cell_res is not None:
        out = out.withColumn("cell", cells.cell_col(F.col(lon), F.col(lat), cell_res))
    return out


def tile_counts(df: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Per-tile aggregate: (z, x, y, n) — deterministic ordering."""
    return (
        df.select(
            tiles.tile_x_col(F.col(lon), zoom).alias("x"),
            tiles.tile_y_col(F.col(lat), zoom).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("z", F.lit(zoom))
        .select("z", "x", "y", "n")
        .orderBy("z", "x", "y")
    )
