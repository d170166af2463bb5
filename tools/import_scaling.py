"""Full-pipeline scaling pair: the ENTIRE import job (read → tag→schema
layer mapping → relation dedup → nested polygons → checkpointed PIP join →
export bundle) at two parallelism levels on the same pre-materialized
input — the north rule's two-cluster-size criterion applied to the whole
job rather than a single operator. High-core leg runs first (it is the
contention-sensitive one on this shared host).

  PYTHONPATH=/root/repo python tools/import_scaling.py

Env:
  IMPORT_INPUT  pre-materialized images parquet (default
                /tmp/import_scale_imgs_6m; tools note in BASELINE.md)
  LO / HI       core counts (default 4 / 16)
  ROUTED        "1" (default) → --routed-export, the single-scan write path
  SINK          "parquet" (default) | "noop" → --dry-run: every sink plan
                executes through Spark's noop writer. Models the cluster
                case where write bandwidth scales WITH the fleet (each
                executor writes to its own disks / object-store shards)
                instead of both legs contending on this sandbox's single
                shared disk — report alongside the raw (parquet) pair.

Prints one JSON line with both legs' total wall + per-section times and
the raw scaling efficiency (T_lo / T_hi) / (HI / LO).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(cpus: int, inp: str, routed: bool, noop: bool = False,
            world_scale: int = 1) -> dict:
    out_dir = f"/tmp/import_scaling_out_{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "import_job.py"),
        "--input", inp, "--out", out_dir, "--cpus", str(cpus), "--force",
    ]
    if world_scale > 1:
        cmd += ["--world-scale", str(world_scale)]
    # IMPORT_ARGS: extra import_job flags, whitespace-split (e.g.
    # "--unit-res 2 --skip-qgis-style" — a world-scaled extent spans several
    # res-4 unit cells, and each unit is a separate checkpointed join pass
    # whose fixed cost lands identically on both legs)
    extra = os.environ.get("IMPORT_ARGS", "")
    if extra:
        import shlex

        # shell-like tokenization: a quoted flag value with spaces must
        # reach import_job as one argv entry (ADVICE r5)
        cmd += shlex.split(extra)
    if routed:
        cmd.append("--routed-export")
    if noop:
        cmd.append("--dry-run")
    env = dict(os.environ, PYTHONPATH=REPO)
    if os.environ.get("CLUSTER") == "1":
        # N-vs-4N EXECUTOR mode: the leg's parallelism comes from executor
        # count against the standalone master (tools/cluster_scaling.py
        # topology), not local[n] threads — each executor is its own JVM
        ec = int(os.environ.get("EXECUTOR_CORES", "4"))
        env["SPARK_GRAFT_MASTER"] = os.environ.get(
            "MASTER_URL", "spark://127.0.0.1:7077"
        )
        env["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get("DRIVER_MEM", "12g")
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
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["leg_wall_s"] = round(time.time() - t0, 1)
    rec["cpus"] = cpus
    rec["load1_at_end"] = round(os.getloadavg()[0], 1)
    return rec


def main() -> None:
    inp = os.environ.get("IMPORT_INPUT", "/tmp/import_scale_imgs_6m")
    lo = int(os.environ.get("LO", "4"))
    hi = int(os.environ.get("HI", "16"))
    routed = os.environ.get("ROUTED", "1") == "1"
    noop = os.environ.get("SINK", "parquet") == "noop"
    # WORLD_SCALE > 1 replicates the feature world K× (disjoint tiles) and
    # spreads the points over the tiles — the fixed-world sections become
    # data-proportional instead of a flat Amdahl term
    world_scale = int(os.environ.get("WORLD_SCALE", "1"))
    # MODE=weak: fixed per-core work — the low leg reads LO_INPUT (a
    # (lo/hi)-sized point fixture) at LO_WORLD_SCALE (= WORLD_SCALE·lo/hi,
    # so the feature world shrinks with the points). The production 100 TB
    # configuration: the fleet grows WITH the data; ideal is equal wall
    # time, eff = T_lo / T_hi.
    weak = os.environ.get("MODE", "strong") == "weak"
    if weak and not os.environ.get("LO_INPUT"):
        # a weak pair needs a (lo/hi)-sized fixture for the low leg;
        # silently reusing the full-size input would print a strong-scaling
        # ratio mislabeled as weak (ADVICE r5)
        raise SystemExit("MODE=weak requires LO_INPUT (a lo/hi-sized point fixture)")
    lo_inp = os.environ.get("LO_INPUT", inp) if weak else inp
    lo_ws = (
        int(os.environ.get("LO_WORLD_SCALE", max(1, world_scale * lo // hi)))
        if weak
        else world_scale
    )
    load0 = round(os.getloadavg()[0], 1)
    hi_leg = run_leg(hi, inp, routed, noop, world_scale)
    lo_leg = run_leg(lo, lo_inp, routed, noop, lo_ws)
    # efficiency over the JOB's own wall (excludes JVM start, which a real
    # cluster pays once per executor fleet, not per measurement)
    if weak:
        eff = lo_leg["wall_seconds"] / hi_leg["wall_seconds"]
    else:
        eff = (lo_leg["wall_seconds"] / hi_leg["wall_seconds"]) / (hi / lo)
    print(json.dumps({
        "metric": "full_import_scaling",
        "mode": "weak" if weak else "strong",
        "n_points": hi_leg["n_points"],
        "lo_n_points": lo_leg["n_points"],
        "world_scale": world_scale,
        "lo_world_scale": lo_ws,
        "routed_export": routed,
        "sink": "noop" if noop else "parquet",
        "lo_cpus": lo, "hi_cpus": hi,
        "lo_wall_s": lo_leg["wall_seconds"],
        "hi_wall_s": hi_leg["wall_seconds"],
        "lo_sections": lo_leg["sections"],
        "hi_sections": hi_leg["sections"],
        "lo_throughput_pts_per_s": round(lo_leg["n_points"] / lo_leg["wall_seconds"], 1),
        "hi_throughput_pts_per_s": round(hi_leg["n_points"] / hi_leg["wall_seconds"], 1),
        "efficiency": round(eff, 3),
        "load1_before": load0,
        "lo_load1_end": lo_leg["load1_at_end"],
        "hi_load1_end": hi_leg["load1_at_end"],
    }))


if __name__ == "__main__":
    main()
