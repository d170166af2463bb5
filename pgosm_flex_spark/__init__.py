"""pgosm_flex_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
rustprooflabs/pgosm-flex (osm2pgsql flex styles + PostGIS post-processing)
as an idiomatic Spark DataFrame engine:

- tag→schema layer mapping (Lua flex styles)  → declarative layer registry of
  native Column expressions (``layers/``)
- GiST spatial index + ST_Subdivide           → web-mercator quadtree cell
  index, polygon covering-cell explode (``index/``)
- PostGIS containment / intersection joins    → broadcast cell-equi-join
  prefilter + vectorized numpy refinement (``operators/``)
- nested admin polygons, routing graph        → groupBy/window/anti-join
  compositions (``operators/``)
- import journal / replication mode           → checkpoint + lineage tables,
  idempotent per-partition recompute (``plans/``, ``streaming/``)

Everything geometric is implemented from scratch on numpy (WKB codec,
point-in-polygon, centroids, geodesic lengths) because the engine's hot path
must stay in JVM whole-stage codegen wherever possible and fall back only to
Arrow-batched pandas UDFs — never per-row Python.
"""

__version__ = "0.1.0"
