"""Flagship PIP+rollup job for MULTI-EXECUTOR scaling evidence.

The north rule's scaling criterion is "N and 4N executors" — executor
COUNT, not thread count inside one JVM. ``tools/cluster_scaling.py`` runs
this job twice through a real Spark standalone master/worker (the full
distribution at $SPARK_HOME), first with ``--total-executor-cores 4N·c``
then ``4·c`` at fixed ``--executor-cores c``, so the two legs differ only
in the number of executor JVMs — exactly how a production cluster scales
out, and the configuration the single-JVM local[n] pairs cannot model
(one JVM's allocator/GC is shared contention a real cluster doesn't have).

Reads the pre-materialized point cache (tools/prep_scale_input.py) so the
timed window is the join, not fixture generation. Reference behavior
mirrored: the PgOSM Flex containment pipeline (place layer polygon match +
admin rollup), /root/reference/flex-config/place.lua + docs layerset
counts.

Submitted via spark-submit (client mode); env SPARK_GRAFT_MASTER carries
the master URL into get_spark, SCALE_INPUT/NPOINTS/REPS size the run.
"""

import json
import os
import sys
import time

from pyspark.sql import functions as F

from pgosm_flex_spark.session import get_spark
from pgosm_flex_spark import fixtures
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.operators import pip_join, relation_member_dedup
from pgosm_flex_spark.operators.pip_join import build_polygon_cover, cover_res_levels


def main() -> None:
    n = int(os.environ.get("NPOINTS", "48000000"))
    reps = int(os.environ.get("REPS", "2"))
    total_cores = int(os.environ["TOTAL_CORES"])
    cache_dir = os.environ["SCALE_INPUT"]

    spark = get_spark("cluster-pip-scaling", cores=total_cores)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    nparts = max(total_cores * 2, 8)
    pts = spark.read.parquet(cache_dir).filter(
        F.col("image_id") < "img%012d" % n
    )
    # prefix-filtering a contiguous-id cache can collapse the subset into
    # 1-2 read splits (tools/knn_scaling.py trap #3) — but when the scan
    # already yields enough splits, a repartition is a pure-cost full
    # shuffle of the point set across executors; skip it then
    if pts.rdd.getNumPartitions() < nparts:
        pts = pts.repartition(nparts)
    pts = pts.persist()
    n_actual = pts.count()
    t_load = time.time() - t0

    osm = fixtures.osm_objects_df(spark)
    place = (
        relation_member_dedup(build_layer_tables(osm)["place_polygon"])
        .filter(F.col("geom_wkb").isNotNull())
        .persist()
    )
    place.count()
    cover = build_polygon_cover(place).persist()
    cover.count()
    # res_levels is a property of the (cached, fixed) cover; probing it per
    # rep re-pays a ~1.4 s fixed driver job every repetition — pure Amdahl
    # overhead a production job amortizes over the whole corpus.
    res_levels = cover_res_levels(cover)
    attrs = place.select("osm_id", "osm_type", "admin_level")

    def run() -> int:
        pairs = pip_join(
            pts, place, point_cols=["image_id"], cover=cover,
            res_levels=res_levels,
        )
        return (
            pairs.join(F.broadcast(attrs), "osm_id")
            .groupBy("osm_type", "admin_level")
            .agg(F.count(F.lit(1)))
            .count()
        )

    rep_times = []
    for i in range(reps):
        t0 = time.time()
        run()
        dt = time.time() - t0
        sys.stderr.write(f"[cluster_pip_job] rep {i}: {dt:.2f}s\n")
        rep_times.append(round(dt, 2))
    best = min(rep_times)

    print(
        json.dumps(
            {
                "total_cores": total_cores,
                "executors": total_cores
                // int(os.environ.get("EXECUTOR_CORES", "4")),
                "n_points": n_actual,
                "load_secs": round(t_load, 2),
                "pip_secs_best": round(best, 2),
                "reps": rep_times,
                "throughput": round(n_actual / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
