"""Run bench.py at two parallelism levels and compute scaling efficiency.

Sandbox stand-in for the north rule's N vs 4N executors: same job, same
input, local[8] vs local[32]. Efficiency = (T_N / T_4N) / 4 for the headline
PIP query (perfect scaling → 1.0). Spark must run in separate processes so
each gets its own JVM with the right core count.

Usage: PYTHONPATH=/root/repo python tools/bench_scaling.py [sf_dir]
Prints one JSON line with both runs + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_BENCH_REPEAT", "3")
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, check=True,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_low = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n_high = 4 * n_low
    # high leg FIRST — the 4N-core leg is the contention-sensitive one and
    # must get the freshest quiet window (knn_scaling.py methodology); run
    # low second so the high leg never launches into the other leg's load
    # decay, which systematically understates efficiency
    high = run_bench(n_high, sf_dir)
    low = run_bench(n_low, sf_dir)
    t_low = low["queries"]["q_pip_join"]
    t_high = high["queries"]["q_pip_join"]
    efficiency = round((t_low / t_high) / 4.0, 3)
    print(json.dumps({
        "sf_dir": sf_dir,
        f"local{n_low}": low,
        f"local{n_high}": high,
        f"pip_secs_local{n_low}": t_low,
        f"pip_secs_local{n_high}": t_high,
        f"throughput_local{n_low}": low["value"],
        f"throughput_local{n_high}": high["value"],
        f"scaling_efficiency_{n_low}_to_{n_high}": efficiency,
    }))


if __name__ == "__main__":
    main()
