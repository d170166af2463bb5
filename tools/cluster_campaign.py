"""Repeating N-vs-4N-EXECUTOR scaling campaign (standalone cluster).

Wraps tools/cluster_scaling.py in the quiet-window watcher pattern of
tools/quiet_campaign.py: fire a pair only when the 1-minute load is below
LOAD_MAX, append EVERY attempt (with the loads each leg saw) to a JSONL
log, track each leg's cross-attempt best for the conservative floor, stop
at the deadline or once a same-window pair reaches TARGET.

  PYTHONPATH=/root/repo python tools/cluster_campaign.py [deadline_min] [n_points]

Env: LOAD_MAX (default 3.0), TARGET (default 0.8),
LOG (default /tmp/cluster_scaling_log.jsonl), SCALE_INPUT, REPS,
LOW_LEG_MAX (seconds; default 0 = off) — a pair only satisfies TARGET when
its low leg ran at or under this bound. Guards against ratio-inflated
"wins": a degraded-phase pair with a slow LOW leg (e.g. 62.7/18.2 s →
0.862 while the quiet band's low leg is 47.3 s) measures the host phase
hitting the denominator, not the topology. Every pair is still logged.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.environ.get("LOG", "/tmp/cluster_scaling_log.jsonl")
LOAD_MAX = float(os.environ.get("LOAD_MAX", "3.0"))
TARGET = float(os.environ.get("TARGET", "0.8"))
LOW_LEG_MAX = float(os.environ.get("LOW_LEG_MAX", "0"))
BUSY_FLAG = "/tmp/spark_graft_busy"


def append(rec: dict) -> None:
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main() -> None:
    deadline = time.time() + 60 * float(sys.argv[1] if len(sys.argv) > 1 else 180)
    n_points = sys.argv[2] if len(sys.argv) > 2 else "48000000"
    best = 0.0
    leg_best: dict[str, float] = {}
    while time.time() < deadline and best < TARGET:
        if os.getloadavg()[0] > LOAD_MAX or os.path.exists(BUSY_FLAG):
            time.sleep(60)
            continue
        env = dict(os.environ, PYTHONPATH=REPO)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "cluster_scaling.py"),
                 n_points],
                capture_output=True, text=True, env=env, timeout=2400, check=True,
            )
            rec = json.loads(
                [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            )
        except Exception as exc:  # noqa: BLE001 — log-and-continue watcher
            append({"error": str(exc)[:300]})
            time.sleep(60)
            continue
        for leg in ("executors_1", "executors_4"):
            t = rec[leg]["pip_secs_best"]
            if leg not in leg_best or t < leg_best[leg]:
                leg_best[leg] = t
        # weak mode runs the low leg at n/4 points (fixed per-executor
        # work), so its efficiency is the plain time ratio — the strong
        # /4.0 would log ~0.25x nonsense next to the real number
        denom = 1.0 if os.environ.get("MODE", "strong") == "weak" else 4.0
        rec["cross_best_eff"] = round(
            leg_best["executors_1"] / leg_best["executors_4"] / denom, 3
        )
        append(rec)
        if not LOW_LEG_MAX or rec["executors_1"]["pip_secs_best"] <= LOW_LEG_MAX:
            best = max(best, rec["scaling_efficiency"])
        time.sleep(30)
    append({"done": True, "best_same_window": best, "leg_best": leg_best})


if __name__ == "__main__":
    main()
