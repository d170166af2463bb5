"""Append/incremental drive at volume: one create → append(diff) cycle at
≥10M points, with the stored result verified EQUAL to a from-scratch full
recompute (the I2/I3 invariant the fixture-scale pytest pins, exercised at
scale and timed per section).

  PYTHONPATH=/root/repo python tools/append_scale.py [n_base] [n_diff]

Env:
  CPUS       local[N] for each job leg (default 16)
  CLUSTER=1  run each leg against the standalone master instead
             (tools/cluster_scaling.py topology; EXECUTOR_CORES etc. as in
             tools/import_scaling.py)
  KEEP=1     keep the /tmp work dirs
  DIFF_MODE  "id" (default): diff = the id-range tail — spatially uniform,
             touches every unit cell (worst case: append ≈ full recompute).
             "box": diff = the points inside a lon/lat box of BOX_FRAC
             (default 0.3) of each extent dimension — the reference's
             real replication shape (a region update), touching only the
             box's unit cells; append should cost ~the touched share.
  UNIT_RES   --unit-res for every leg (default 4 — the whole fixture world
             is ONE res-4 cell, so pass 6-7 with DIFF_MODE=box to give the
             invalidation something to skip)

Flow: materialize full input (n_base + n_diff pre-parsed points) once →
create on the base slice → append with the diff slice → create on the full
input in a second dir → compare stored pair sets (count + order-independent
bit_xor row checksum). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_job(argv: list[str], cpus: int) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "jobs", "import_job.py"),
           "--cpus", str(cpus), *argv]
    env = dict(os.environ, PYTHONPATH=REPO)
    if os.environ.get("CLUSTER") == "1":
        ec = int(os.environ.get("EXECUTOR_CORES", "4"))
        env["SPARK_GRAFT_MASTER"] = os.environ.get(
            "MASTER_URL", "spark://127.0.0.1:7077"
        )
        env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps({
            "spark.cores.max": cpus,
            "spark.executor.cores": ec,
            "spark.executor.memory": os.environ.get("EXECUTOR_MEM", "18g"),
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.pyspark.python": sys.executable,
        })
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=3600, check=True)
    rec = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    rec["leg_wall_s"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_diff = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(os.environ.get("CPUS", "16"))
    diff_mode = os.environ.get("DIFF_MODE", "id")
    box_frac = float(os.environ.get("BOX_FRAC", "0.3"))
    unit_res = int(os.environ.get("UNIT_RES", "4"))
    cut = f"img{n_base:012d}"

    work = "/tmp/append_scale"
    full_in = os.path.join(work, "full_in")
    base_in = os.path.join(work, "base_in")
    diff_in = os.path.join(work, "diff_in")
    out_inc = os.path.join(work, "out_incremental")
    out_full = os.path.join(work, "out_full")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from pyspark.sql import functions as F

    from pgosm_flex_spark import fixtures
    from pgosm_flex_spark.functions import tags as tagf
    from pgosm_flex_spark.session import get_spark

    spark = get_spark("append-scale-prep", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    full = tagf.with_lonlat(
        fixtures.images_df(spark, n_base + n_diff, with_pixels=False)
    ).select("image_id", "lon", "lat")
    full.write.parquet(full_in)
    full = spark.read.parquet(full_in)
    if diff_mode == "box":
        # a spatially-local diff (the reference's region-update shape):
        # everything inside the box arrives "later"
        lon_hi = fixtures.LON_MIN + (fixtures.LON_MAX - fixtures.LON_MIN) * box_frac
        lat_hi = fixtures.LAT_MIN + (fixtures.LAT_MAX - fixtures.LAT_MIN) * box_frac
        in_box = (F.col("lon") < lon_hi) & (F.col("lat") < lat_hi)
        full.filter(~in_box).write.parquet(base_in)
        full.filter(in_box).write.parquet(diff_in)
        # a NULL lon/lat row fails BOTH filters under three-valued logic;
        # the fixture never emits one, but assert the split is lossless so
        # a non-fixture input cannot silently lose points (ADVICE r5)
        n_full = full.count()
        n_split = (
            spark.read.parquet(base_in).count()
            + spark.read.parquet(diff_in).count()
        )
        if n_split != n_full:
            raise SystemExit(
                f"box split lost rows ({n_full} -> {n_split}): "
                "input has NULL lon/lat points"
            )
    else:
        full.filter(F.col("image_id") < cut).write.parquet(base_in)
        full.filter(F.col("image_id") >= cut).write.parquet(diff_in)
    n_diff_actual = spark.read.parquet(diff_in).count()

    common = ["--routed-export", "--skip-qgis-style",
              "--unit-res", str(unit_res)]
    create = run_job(["--input", base_in, "--out", out_inc, "--force",
                      *common], cpus)
    append = run_job(["--input", full_in, "--diff", diff_in, "--out", out_inc,
                      "--mode", "append", "--date", "2026-02-01",
                      *common], cpus)
    full_run = run_job(["--input", full_in, "--out", out_full, "--force",
                        *common], cpus)

    def pair_sig(out_dir: str):
        df = spark.read.parquet(os.path.join(out_dir, "image_place_pairs"))
        df = df.drop("unit")  # partition col; unit grids are identical anyway
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(sorted(df.columns)) + "))"
            ).alias("sig"),
        ).collect()[0]
        return row["n"], row["sig"]

    n_inc, sig_inc = pair_sig(out_inc)
    n_full, sig_full = pair_sig(out_full)
    print(json.dumps({
        "metric": "append_at_volume",
        "n_base": n_base,
        "n_diff": n_diff,
        "diff_mode": diff_mode,
        "n_diff_actual": n_diff_actual,
        "unit_res": unit_res,
        "cpus": cpus,
        "cluster": os.environ.get("CLUSTER") == "1",
        "create_wall_s": create["wall_seconds"],
        "create_sections": create["sections"],
        "append_wall_s": append["wall_seconds"],
        "append_sections": append["sections"],
        "append_touched_cells": append.get("append_touched_cells"),
        "full_recompute_wall_s": full_run["wall_seconds"],
        "pairs_incremental": n_inc,
        "pairs_full": n_full,
        "stored_equals_full_recompute": (n_inc, sig_inc) == (n_full, sig_full),
        "load1": round(os.getloadavg()[0], 1),
    }))
    if os.environ.get("KEEP") != "1":
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
