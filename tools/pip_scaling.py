"""Focused scaling evidence for the north rule: the flagship PIP+rollup
query at N and 4N cores over the SAME input, sized so per-core work
dominates fixed stage overheads (a 3-second job measures scheduler latency,
not scaling).

Runs each level in its own JVM (subprocess), best-of-R timing.

  PYTHONPATH=/root/repo python tools/pip_scaling.py [n_points] [n_low]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from pgosm_flex_spark.session import get_spark
from pgosm_flex_spark import fixtures
from pgosm_flex_spark.functions import tags as tagf
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.operators import pip_join, relation_member_dedup
from pgosm_flex_spark.operators.pip_join import build_polygon_cover, cover_res_levels

cpus = int(os.environ["CPUS"]); n = int(os.environ["NPOINTS"]); reps = int(os.environ.get("REPS", "3"))
spark = get_spark("pip-scaling", cores=cpus)
spark.sparkContext.setLogLevel("ERROR")
cache_dir = os.environ.get("SCALE_INPUT")
if cache_dir and os.path.isdir(cache_dir):
    # pre-materialized points (tools/prep_scale_input.py): the fixture
    # generation otherwise dominates each leg's wall time and drags the
    # timed window outside the quiet period being measured. Same prefix
    # filter + repartition as knn_scaling: without it a cache prepped at a
    # different size mislabels n_points/throughput, and the contiguous-id
    # packing leaves the subset in 1-2 read partitions
    nparts = int(os.environ.get("NPARTS", "0")) or max(cpus * 2, 8)
    pts = (
        spark.read.parquet(cache_dir)
        .filter(F.col("image_id") < "img%012d" % n)
        .repartition(nparts)
        .persist()
    )
else:
    pts = tagf.with_tags(fixtures.images_df(spark, n, with_pixels=False)).select("image_id", "lon", "lat").persist()
# report the ACTUAL materialized count, not the requested n: a cache
# prepped smaller than n passes everything through the prefix filter, and
# quoting n would inflate the throughput by the cache-size ratio
n_actual = pts.count()
osm = fixtures.osm_objects_df(spark)
place = relation_member_dedup(build_layer_tables(osm)["place_polygon"]).filter(F.col("geom_wkb").isNotNull()).persist()
place.count()
cover = build_polygon_cover(place).persist(); cover.count()
# res_levels is fixed per cover — probe once outside the timed loop
# (a per-rep probe is ~1.4 s of fixed driver-job overhead a production
# corpus amortizes away)
res_levels = cover_res_levels(cover)
attrs = place.select("osm_id", "osm_type", "admin_level")

def run():
    pairs = pip_join(pts, place, point_cols=["image_id"], cover=cover,
                     res_levels=res_levels)
    return pairs.join(F.broadcast(attrs), "osm_id").groupBy("osm_type", "admin_level").agg(F.count(F.lit(1))).count()

best = None
for _ in range(reps):
    t0 = time.time(); run(); dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "n_points": n_actual, "n_requested": n,
                  "pip_secs_best": round(best, 2),
                  "throughput": round(n_actual / best, 1)}))
"""


def run_level(cpus: int, n_points: int, reps: int) -> dict:
    env = dict(os.environ)
    env.update(REPO=REPO, CPUS=str(cpus), NPOINTS=str(n_points), REPS=str(reps),
               PYTHONPATH=REPO)
    l0 = os.getloadavg()[0]
    out = subprocess.run([sys.executable, "-c", WORKER], capture_output=True,
                         text=True, env=env, check=True)
    rec = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    rec["load_before"] = round(l0, 2)
    rec["load_after"] = round(os.getloadavg()[0], 2)
    return rec


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(os.environ.get("REPS", "3"))
    # high leg first — it needs the quiet window most (see knn_scaling.py)
    high = run_level(4 * n_low, n_points, reps)
    low = run_level(n_low, n_points, reps)
    eff = round(low["pip_secs_best"] / high["pip_secs_best"] / 4.0, 3)
    print(json.dumps({
        "n_points": n_points,
        f"local{n_low}": low,
        f"local{4*n_low}": high,
        "scaling_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
