"""N-vs-4N EXECUTOR scaling through a real Spark standalone cluster.

The north rule's criterion is throughput scaling efficiency >= 0.8 between
two cluster sizes, N and 4N executors, driven by spark-submit --py-files.
The local[n] pairs elsewhere in BASELINE.md scale THREADS inside one JVM —
a stricter-than-cluster setup (one shared allocator/GC/heap for all cores).
This tool reproduces the rule's actual topology on the sandbox host:

  master (standalone) <- 1 worker offering 16 cores
      leg A: spark-submit --executor-cores 4 --total-executor-cores 16
             -> FOUR executor JVMs  (the "4N" cluster)
      leg B: spark-submit --executor-cores 4 --total-executor-cores 4
             -> ONE executor JVM    (the "N" cluster)

Each executor is its own JVM with its own heap and Python workers, exactly
like a production node; only executor COUNT differs between legs. The job
(jobs/cluster_pip_job.py) reads the same pre-materialized point parquet in
both legs, high leg first (quiet-window methodology, tools/knn_scaling.py).

  PYTHONPATH=/root/repo python tools/cluster_scaling.py [n_points]

Daemon logs/work dirs go under /tmp; master/worker are stopped on exit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
EXECUTOR_CORES = int(os.environ.get("EXECUTOR_CORES", "4"))
WORKER_CORES = int(os.environ.get("WORKER_CORES", "16"))


def daemon_env() -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_HOME=SPARK_HOME,
        SPARK_LOG_DIR="/tmp/spark-logs",
        SPARK_WORKER_DIR="/tmp/spark-work",
        SPARK_MASTER_HOST="127.0.0.1",
        SPARK_LOCAL_IP="127.0.0.1",
        SPARK_IDENT_STRING="graft",
    )
    return env


def start_cluster() -> None:
    env = daemon_env()
    stop_cluster()  # a stale daemon from a previous run makes start a no-op failure
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-master.sh", "--port", "7077",
         "--webui-port", "8091"],
        env=env, check=True, capture_output=True,
    )
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL,
         "--cores", str(WORKER_CORES),
         "--memory", os.environ.get("WORKER_MEM", "100g"),
         "--webui-port", "8092"],
        env=env, check=True, capture_output=True,
    )
    # wait until the worker registers with the master
    import urllib.request

    for _ in range(60):
        try:
            with urllib.request.urlopen("http://127.0.0.1:8091/json/") as r:
                j = json.loads(r.read())
            if j.get("aliveworkers", 0) >= 1:
                return
        except Exception:
            pass
        time.sleep(1)
    raise RuntimeError("worker never registered with standalone master")


def stop_cluster() -> None:
    env = daemon_env()
    for script in ("stop-worker.sh", "stop-master.sh"):
        subprocess.run([f"{SPARK_HOME}/sbin/{script}"], env=env,
                       capture_output=True)


def wait_quiet(threshold: float, max_wait_s: float = 600.0) -> None:
    """Block until 1-min load < threshold (or max_wait_s elapses).

    A leg launched into the previous leg's load decay measures the decay,
    not the topology: pair 5 (BASELINE.md) launched its 1-executor leg at
    ambient 8.2 and read 48.4 s where quiet pairs read 47.3 s.
    """
    deadline = time.time() + max_wait_s
    while os.getloadavg()[0] >= threshold and time.time() < deadline:
        time.sleep(10)


def membw_probe_gbps(n_bytes: int = 200_000_000, tries: int = 3) -> float:
    """Best-of-N single-thread memcpy bandwidth (GB/s) — a host-phase score.

    The 48M-point legs are memory-bandwidth-bound, so external pressure that
    load-average misses (a neighbor saturating the bus at low process count)
    shows up here: pairs 7-9 (BASELINE.md) launched at load 0.28-0.35 yet ran
    13-34% over the quiet band, the 8-core leg hit hardest. Recording the
    score per leg makes a polluted pair self-identifying instead of only
    diagnosable against historical leg times.
    """
    import numpy as np

    src = np.empty(n_bytes, dtype=np.uint8)
    dst = np.empty_like(src)
    best = 0.0
    for _ in range(tries):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        gbps = n_bytes / (time.perf_counter() - t0) / 1e9
        best = max(best, gbps)
    return round(best, 2)


def run_leg(zip_path: str, total_cores: int, n_points: int, reps: int) -> dict:
    quiet = float(os.environ.get("WAIT_QUIET", "0"))
    if quiet > 0:
        wait_quiet(quiet)
    membw = membw_probe_gbps()
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=MASTER_URL,
        TOTAL_CORES=str(total_cores),
        EXECUTOR_CORES=str(EXECUTOR_CORES),
        NPOINTS=str(n_points),
        REPS=str(reps),
        SCALE_INPUT=os.environ.get("SCALE_INPUT", "/tmp/scale_pts"),
        PYTHONPATH=REPO,
    )
    l0 = os.getloadavg()[0]
    out = subprocess.run(
        [
            f"{SPARK_HOME}/bin/spark-submit",
            "--master", MASTER_URL,
            "--deploy-mode", "client",
            "--driver-memory", os.environ.get("DRIVER_MEM", "12g"),
            "--executor-cores", str(EXECUTOR_CORES),
            "--executor-memory", os.environ.get("EXECUTOR_MEM", "18g"),
            "--total-executor-cores", str(total_cores),
            "--conf", f"spark.pyspark.python={sys.executable}",
            "--py-files", zip_path,
            f"{REPO}/jobs/cluster_pip_job.py",
        ],
        capture_output=True, text=True, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise RuntimeError(f"leg total_cores={total_cores} failed")
    rec = json.loads(lines[-1])
    rec["load_before"] = round(l0, 2)
    rec["load_after"] = round(os.getloadavg()[0], 2)
    rec["membw_gbps_before"] = membw
    return rec


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    reps = int(os.environ.get("REPS", "2"))
    # strong (default): same input both legs — the north rule's literal
    # criterion. weak: fixed per-executor work (low leg gets n/4) — the
    # production 100 TB question, where the fleet grows WITH the data;
    # ideal is equal wall time, eff = T_1exec / T_4exec.
    weak = os.environ.get("MODE", "strong") == "weak"

    zip_path = os.path.join(tempfile.mkdtemp(), "pgosm_flex_spark.zip")
    subprocess.run(["zip", "-qr", zip_path, "pgosm_flex_spark"],
                   cwd=REPO, check=True)

    start_cluster()
    try:
        # high leg (4N executors) first — needs the quiet window most
        high = run_leg(zip_path, 4 * EXECUTOR_CORES, n_points, reps)
        low = run_leg(zip_path, EXECUTOR_CORES,
                      n_points // 4 if weak else n_points, reps)
    finally:
        stop_cluster()

    if weak:
        eff = round(low["pip_secs_best"] / high["pip_secs_best"], 3)
    else:
        eff = round(low["pip_secs_best"] / high["pip_secs_best"] / 4.0, 3)
    print(json.dumps({
        "topology": f"standalone, executor JVMs of {EXECUTOR_CORES} cores",
        "mode": "weak" if weak else "strong",
        "n_points": n_points,
        "executors_1": low,
        "executors_4": high,
        "scaling_efficiency": eff,
    }))


if __name__ == "__main__":
    main()
