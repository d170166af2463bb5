"""Web-mercator z/x/y tile assignment — native Column expressions.

The raster↔vector step of the north star: each image point maps to its slippy
tile at a zoom level. Same grid math as :mod:`cells` (SRID-3857 convention,
/root/reference/flex-config/helpers.lua:5-12) but exposed as separate z/x/y
columns because tile ids are a user-facing output, not a join key.

Pure JVM math (ln/tan/radians) so the expression mirrors one-to-one into the
DuckDB oracle SQL used by the correctness harness.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878


def tile_x_col(lon: Column, zoom: int) -> Column:
    n = 1 << zoom
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(x, F.lit(0)), F.lit(n - 1)).cast("int")


def tile_y_col(lat: Column, zoom: int) -> Column:
    n = 1 << zoom
    lat = F.greatest(F.least(lat, F.lit(MAX_LAT)), F.lit(-MAX_LAT))
    lat_rad = F.radians(lat)
    y = F.floor(
        (F.lit(1.0) - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(float(n))
    )
    return F.least(F.greatest(y, F.lit(0)), F.lit(n - 1)).cast("int")


def tile_y_sql(lat_expr: str, zoom: int) -> str:
    """ANSI-SQL text of tile_y_col — shared by Spark SQL and the DuckDB oracle."""
    n = float(1 << zoom)
    clamped = f"greatest(least({lat_expr}, {MAX_LAT}), {-MAX_LAT})"
    return (
        f"cast(least(greatest(floor((1.0 - ln(tan(radians({clamped}))"
        f" + 1.0/cos(radians({clamped}))) / pi()) / 2.0 * {n}), 0), {int(n) - 1}) as int)"
    )


def tile_x_sql(lon_expr: str, zoom: int) -> str:
    n = float(1 << zoom)
    return (
        f"cast(least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {n}), 0), {int(n) - 1}) as int)"
    )
