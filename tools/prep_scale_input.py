"""Pre-materialize the scaling-run point fixture to parquet so each
pip_scaling leg only reads + persists it (fixture generation otherwise
dominates the leg's wall time and pushes the timed window outside the quiet
period being measured on this shared host).

  PYTHONPATH=/root/repo python tools/prep_scale_input.py [n_points] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_pts"

    from pgosm_flex_spark import fixtures
    from pgosm_flex_spark.functions import tags as tagf
    from pgosm_flex_spark.session import get_spark

    spark = get_spark("prep-scale-input")
    spark.sparkContext.setLogLevel("ERROR")
    pts = tagf.with_lonlat(fixtures.images_df(spark, n, with_pixels=False)).select(
        "image_id", "lon", "lat"
    )
    pts.write.mode("overwrite").parquet(out)
    print(out, spark.read.parquet(out).count())


if __name__ == "__main__":
    main()
