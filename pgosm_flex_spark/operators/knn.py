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


def topk_per_point(
    cand: DataFrame,
    pid_col: str,
    dist_col: str,
    fid_col: str,
    k: int,
) -> DataFrame:
    """Bounded top-k per point WITHOUT shuffling the candidate set.

    Ring-join candidates of one point are colocated (the point side expands
    via explode + broadcast join, staying in its partition), so a
    ``row_number`` window's hash shuffle of the full candidate set is wasted
    work. Instead: partition-local sort by (pid, dist, fid), then a streaming
    rank in mapInPandas that carries the last group's count across Arrow
    batch boundaries. Output adds ``knn_rank`` (1-based) and keeps ≤k rows
    per point.
    """
    import pandas as pd

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields)
    schema += ", knn_rank int"

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df.assign(knn_rank=pd.Series([], dtype="int32"))
        s = df.sort_values([pid_col, dist_col, fid_col], kind="stable")
        ranks = s.groupby(pid_col, sort=False).cumcount()
        out = s.loc[ranks.to_numpy() < k].copy()
        out["knn_rank"] = (ranks[ranks < k] + 1).astype("int32").to_numpy()
        return out

    def stream(batches):
        # contract: a point's candidate rows are contiguous within the
        # partition (explode + broadcast join preserve probe order), so only
        # the group straddling a batch boundary needs carrying
        carry: pd.DataFrame | None = None
        for b in batches:
            if len(b) == 0:
                continue
            if carry is not None:
                if b[pid_col].iloc[0] == carry[pid_col].iloc[0]:
                    b = pd.concat([carry, b], ignore_index=True)
                else:
                    yield _topk(carry)
            last_pid = b[pid_col].iloc[-1]
            is_last = (b[pid_col] == last_pid).to_numpy()
            carry = b.loc[is_last]
            main = b.loc[~is_last]
            if len(main):
                yield _topk(main)
        if carry is not None and len(carry):
            yield _topk(carry)

    return cand.mapInPandas(stream, schema=schema)


def knn_join_adaptive(
    points: DataFrame,
    features: DataFrame,
    k: int,
    point_id: str = "image_id",
    feature_id: str = "osm_id",
    res_levels: tuple[int, ...] = (19, 16, 13, 10),
    lon: str = "lon",
    lat: str = "lat",
    f_lon: str = "lon",
    f_lat: str = "lat",
) -> DataFrame:
    """Exact kNN that adapts cell resolution to local feature density — the
    skew answer for dense urban cells (SURVEY.md §7.3): a hot disc holding
    30% of all features would make a single-resolution ring join explode;
    here dense points resolve at fine resolutions with tiny rings while
    sparse points escalate to coarser cells.

    Correctness invariant per pass (ring=1 at resolution r): a point's
    result is accepted only if it found ≥k candidates AND its k-th candidate
    distance ≤ the guaranteed covered radius (one full cell width in the
    worst case — the 3×3 block always extends at least one cell beyond the
    point's own cell). Otherwise the point escalates to the next coarser
    level; the final level accepts unconditionally (callers size the
    coarsest level to cover the domain).
    """
    feats = features.select(
        F.col(feature_id).alias("__fid"),
        F.col(f_lon).alias("__flon"),
        F.col(f_lat).alias("__flat"),
    ).persist()

    remaining = points.select(
        F.col(point_id).alias("__pid"),
        F.col(lon).alias("__plon"),
        F.col(lat).alias("__plat"),
    )
    resolved_parts: list[DataFrame] = []
    for level_i, res in enumerate(res_levels):
        is_last = level_i == len(res_levels) - 1
        fcell = feats.withColumn(
            "__fcell", cells.cell_col(F.col("__flon"), F.col("__flat"), res)
        )
        pts = remaining.withColumn(
            "__pcell", cells.cell_col(F.col("__plon"), F.col("__plat"), res)
        )
        ringed = pts.withColumn(
            "__cell", F.explode(cells.kring_col(F.col("__pcell"), 1, res))
        )
        cand = ringed.join(F.broadcast(fcell), ringed["__cell"] == fcell["__fcell"])
        cand = cand.withColumn(
            "__dist",
            haversine_m_col(F.col("__plon"), F.col("__plat"), F.col("__flon"), F.col("__flat")),
        ).select("__pid", "__plon", "__plat", "__fid", "__dist")
        topk = topk_per_point(cand, "__pid", "__dist", "__fid", k).persist()
        per_point = topk.groupBy("__pid", "__plon", "__plat").agg(
            F.count(F.lit(1)).alias("__n"), F.max("__dist").alias("__kth")
        )
        if is_last:
            ok_ids = per_point.select("__pid")
        else:
            # guaranteed covered radius: one cell width in meters at this
            # latitude (conservative: min of x/y extents of the mercator cell)
            cell_deg = 360.0 / (1 << res)
            guaranteed_m = (
                F.lit(cell_deg)
                * F.lit(111_319.49)
                * F.cos(F.radians(F.col("__plat")))
                * F.lit(0.95)
            )
            ok_ids = per_point.filter(
                (F.col("__n") >= k) & (F.col("__kth") <= guaranteed_m)
            ).select("__pid")
        resolved_parts.append(
            topk.join(F.broadcast(ok_ids), "__pid").select(
                F.col("__pid").alias(point_id),
                F.col("__fid").alias(feature_id),
                F.col("__dist").alias("distance_m"),
                "knn_rank",
            )
        )
        if is_last:
            break
        remaining = remaining.join(F.broadcast(ok_ids), "__pid", "left_anti")

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.unionByName(p)
    return out


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
