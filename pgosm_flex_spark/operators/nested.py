"""Nested admin polygon hierarchy — SURVEY.md J1 + A1 + J7.

Re-expresses /root/reference/flex-config/sql/place_polygon_nested.sql:

- population filter (populate_place_polygon_nested, lines 55-75):
  rows participate when ``boundary = 'administrative'`` OR osm_type ∈
  {neighborhood, city, suburb, town, admin_level, locality}, name not null;
  the stored admin_level is ``COALESCE(admin_level, 99)``.
- containment paths (build_nested_admin_polygons, lines 96-150):
  ``INNER JOIN LATERAL ... ST_Within(p.geom, i.geom)`` with
  ``ARRAY_AGG(... ORDER BY COALESCE(admin_level, 99))`` → ``nest_level`` +
  ``name_path``/``osm_id_path``/``admin_level_path``.
- ``row_innermost`` generated column (lines 12-16): last path entry == own id.
- ``innermost`` (lines 156-172): row_innermost AND the id appears in no
  *other* row's osm_id_path.

Polygon-within-polygon runs PostGIS's plan shape: cheap prefilter (child
centroid inside container via the cell-indexed PIP join, then child bbox ⊆
container bbox) followed by the EXACT ST_Within test
(kernels.polygon_within: all child vertices inside + no boundary crossing)
on the surviving pairs only — concave containers (an L-shaped county whose
bbox covers a neighboring town) reject correctly. The reference's LIMIT-100
batched loop (lines 96-150) is unnecessary set-at-once in Spark; its restart
property lives in plans/checkpoint.py instead. Path ties at equal
admin_level are broken by (name, osm_id) for determinism (the reference
leaves them unordered).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.geometry import kernels, wkb as wkb_mod
from pgosm_flex_spark.geometry.udfs import bbox_udf, point_on_surface_udf
from pgosm_flex_spark.operators.pip_join import pip_join

_NESTED_OSM_TYPES = ["neighborhood", "city", "suburb", "town", "admin_level", "locality"]


def build_nested_admin_polygons(
    place_polygon: DataFrame,
    id_col: str = "osm_id",
    fine_res: int = 15,
    broadcast_containers: bool = True,
    salt: int = 8,
) -> DataFrame:
    """place_polygon → one row per participating polygon with path columns.

    Output: osm_id, name, osm_type, admin_level (coalesced to 99),
    nest_level, name_path, osm_id_path, admin_level_path, row_innermost,
    innermost.

    ``broadcast_containers=True`` (default) broadcasts every small side
    (admin hierarchies are small in practice): the polygon cover inside the
    centroid pip_join, the container-attribute join, and the innermost
    ``others`` anti-join side. Pass False when a continental place_polygon
    set would overflow the broadcast limit — then NO stage broadcasts this
    table: the pip_join runs its salted shuffle fallback (``salt`` replicas
    spread hot cells), and the attribute/anti joins shuffle on their keys.
    """
    participates = (
        (F.col("boundary") == "administrative")
        | F.col("osm_type").isin(_NESTED_OSM_TYPES)
    ) & F.col("name").isNotNull()
    polys = (
        place_polygon.filter(participates)
        .select(
            id_col,
            "name",
            "osm_type",
            F.coalesce(F.col("admin_level"), F.lit(99)).alias("admin_level"),
            "geom_wkb",
        )
    )

    # child representative points + bboxes — vectorized UDFs. The
    # representative MUST lie inside the child (ST_PointOnSurface), not at
    # its centroid: a concave child's centroid can fall outside the child —
    # and outside its true container — so centroid candidates silently drop
    # real ST_Within pairs (including the self-pair the reference's lateral
    # join always emits).
    with_geo = polys.withColumn(
        "__c", point_on_surface_udf(F.col("geom_wkb"))
    ).withColumn(
        "__b", bbox_udf(F.col("geom_wkb"))
    )
    reps = with_geo.select(
        F.col(id_col).alias("child_id"),
        F.col("__c.lon").alias("lon"),
        F.col("__c.lat").alias("lat"),
        F.col("__b").alias("child_bbox"),
    )
    # candidate containment pairs: child interior point within container
    # polygon (self included: the interior point is inside the child by
    # construction, so ST_Within(p, p) candidates always survive); then
    # refine with the bbox-containment condition
    pairs = pip_join(
        reps,
        polys,
        point_cols=["child_id", "child_bbox"],
        poly_id=id_col,
        fine_res=fine_res,
        broadcast_cover=broadcast_containers,
        salt=salt,
    ).withColumnRenamed(id_col, "container_id")

    containers = with_geo.select(
        F.col(id_col).alias("container_id"),
        F.col("admin_level").alias("c_admin_level"),
        F.col("name").alias("c_name"),
        F.col("__b").alias("container_bbox"),
        F.col("geom_wkb").alias("container_wkb"),
    )
    if broadcast_containers:
        containers = F.broadcast(containers)
    prefiltered = pairs.join(containers, "container_id").filter(
        (F.col("child_bbox.xmin") >= F.col("container_bbox.xmin"))
        & (F.col("child_bbox.ymin") >= F.col("container_bbox.ymin"))
        & (F.col("child_bbox.xmax") <= F.col("container_bbox.xmax"))
        & (F.col("child_bbox.ymax") <= F.col("container_bbox.ymax"))
    )
    # EXACT ST_Within on the surviving pairs (self-pairs are within by
    # definition and skip the geometry test — their vertices lie ON the
    # boundary, which strict interiority would reject)
    child_geoms = polys.select(
        F.col(id_col).alias("child_id"), F.col("geom_wkb").alias("child_wkb")
    )
    cand = prefiltered.join(child_geoms, "child_id")
    within_schema = "child_id long, container_id long, c_admin_level int, c_name string"

    def exact_within(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batched by container: each container decodes ONCE per Arrow batch
        # and its candidate children run through the vectorized batch kernel
        # (kernels.polygons_within_container); child decodes are memoized
        # across containers within the batch. No per-pair Python work.
        for b in batches:
            if len(b) == 0:
                continue
            child_cache: dict[int, object] = {}
            keep = np.zeros(len(b), dtype=bool)
            groups = b.groupby("container_id", sort=False).indices
            for _cid, idx in groups.items():
                rows = b.iloc[idx]
                self_mask = (rows["child_id"] == rows["container_id"]).to_numpy()
                # self-pairs are within by definition and skip the geometry
                # test — their vertices lie ON the boundary, which strict
                # interiority would reject
                keep[idx[self_mask]] = True
                todo = idx[~self_mask]
                if todo.size == 0:
                    continue
                container = wkb_mod.decode(bytes(rows["container_wkb"].iloc[0]))
                kids = []
                for cid_child, raw in zip(
                    b["child_id"].to_numpy()[todo], b["child_wkb"].to_numpy()[todo]
                ):
                    g = child_cache.get(cid_child)
                    if g is None:
                        g = wkb_mod.decode(bytes(raw))
                        child_cache[cid_child] = g
                    kids.append(g)
                keep[todo] = kernels.polygons_within_container(kids, container)
            out = b.loc[keep]
            yield pd.DataFrame(
                {
                    "child_id": out["child_id"],
                    "container_id": out["container_id"],
                    "c_admin_level": out["c_admin_level"],
                    "c_name": out["c_name"],
                }
            )

    enriched = cand.select(
        "child_id", "container_id", "c_admin_level", "c_name",
        "child_wkb", "container_wkb",
    ).mapInPandas(exact_within, schema=within_schema)

    # A1: ordered path arrays — order encoded in the struct sort key
    paths = enriched.groupBy("child_id").agg(
        F.count("container_id").alias("nest_level"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("c_admin_level").alias("lvl"),
                    F.col("c_name").alias("name"),
                    F.col("container_id").alias("cid"),
                )
            )
        ).alias("chain"),
    )
    paths = paths.select(
        F.col("child_id").alias(id_col),
        "nest_level",
        F.transform("chain", lambda s: s["name"]).alias("name_path"),
        F.transform("chain", lambda s: s["cid"]).alias("osm_id_path"),
        F.transform("chain", lambda s: s["lvl"]).alias("admin_level_path"),
    )

    out = polys.drop("geom_wkb").join(paths, id_col, "left")

    # row_innermost (place_polygon_nested.sql:12-16)
    out = out.withColumn(
        "row_innermost",
        F.coalesce(F.element_at("osm_id_path", -1) == F.col(id_col), F.lit(False)),
    )

    # innermost (place_polygon_nested.sql:156-172)
    others = (
        out.select(F.col(id_col).alias("row_id"), F.explode("osm_id_path").alias("member"))
        .filter(F.col("row_id") != F.col("member"))
        .select(F.col("member").alias(id_col))
        .distinct()
        .withColumn("__contains_others", F.lit(True))
    )
    if broadcast_containers:
        others = F.broadcast(others)
    out = out.join(others, id_col, "left")
    out = out.withColumn(
        "innermost", F.col("row_innermost") & F.col("__contains_others").isNull()
    ).drop("__contains_others")
    return out
