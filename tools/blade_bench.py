"""A/B measurement for the blade cut-stage batching (round-4 change).

Builds a dense synthetic street grid (every horizontal crosses every
vertical — pair volume maximal per cell), then times
``edge_intersection_blades`` from the CURRENT tree against the PRE-BATCHING
implementation extracted from git history into a temp module, and asserts
both produce the identical blade set.

  PYTHONPATH=/root/repo python tools/blade_bench.py [n_each] [old_rev]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_old_routing(rev: str):
    """Materialize pgosm_flex_spark/operators/routing.py at ``rev`` as an
    importable module (package context preserved so its relative imports
    resolve against the CURRENT library)."""
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{rev}:pgosm_flex_spark/operators/routing.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="old_routing_"), "routing_old.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "pgosm_flex_spark.operators.routing_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    n_each = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "1ffcba7"

    import numpy as np
    import pandas as pd

    from pgosm_flex_spark.geometry import wkb
    from pgosm_flex_spark.operators import routing as routing_new
    from pgosm_flex_spark.session import get_spark

    routing_old = load_old_routing(old_rev)

    spark = get_spark("blade-bench", cores=int(os.environ.get("CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for i in range(n_each):
        y = 38.50 + i * 0.004
        x = -77.30 + i * 0.004
        rows.append((i, wkb.encode_linestring(
            np.array([[-77.31, y], [-77.30 + n_each * 0.004 + 0.01, y]])), 0))
        rows.append((1000 + i, wkb.encode_linestring(
            np.array([[x, 38.49], [x, 38.50 + n_each * 0.004 + 0.01]])), 0))
    lines = spark.createDataFrame(
        pd.DataFrame(rows, columns=["edge_id", "geom_wkb", "layer"])
    ).persist()
    lines.count()

    def timed(fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    new_blades = routing_new.edge_intersection_blades(lines)
    old_blades = routing_old.edge_intersection_blades(lines)
    t_new = timed(lambda: new_blades.count())
    t_old = timed(lambda: old_blades.count())
    a = sorted(map(tuple, new_blades.collect()))
    b = sorted(map(tuple, old_blades.collect()))
    assert a == b, f"blade sets diverge: {len(a)} vs {len(b)} rows"
    print(json.dumps({
        "n_lines": 2 * n_each, "n_crossings": n_each * n_each,
        "n_blade_rows": len(a),
        "old_per_pair_s": t_old, "new_batched_s": t_new,
        "speedup": round(t_old / t_new, 2),
    }))


if __name__ == "__main__":
    main()
