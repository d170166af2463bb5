"""Per-query isolation bench + plan capture for the optimization rounds.

NOT the driver's bench (bench.py is frozen): this file reproduces each timed
bench query in isolation so a change can be measured without the full-run
noise, splits driver-side planning from execution (the same Dataset object is
executed twice — the second run reuses its QueryExecution, so rep1 − rep2 ≈
analysis+optimization+codegen cost), and dumps ``explain("formatted")`` to
plans/r06/ for the before/after evidence.

Usage:
  python bench_extra.py [query ...] [--plans SUFFIX] [--reps N]

With --plans, each query's formatted plan is written to
plans/r06/<query>_<SUFFIX>.txt. Queries default to all.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pgosm_flex_spark import fixtures  # noqa: E402
from pgosm_flex_spark.functions import tags as tagf  # noqa: E402
from pgosm_flex_spark.layers import build_layer_tables  # noqa: E402
from pgosm_flex_spark.operators import relation_member_dedup  # noqa: E402
from pgosm_flex_spark.operators.pip_join import (  # noqa: E402
    build_polygon_cover,
    cover_res_levels,
    pip_join,
)
from pgosm_flex_spark.operators.tiles import tile_counts  # noqa: E402
from pgosm_flex_spark.session import get_spark  # noqa: E402
from pgosm_flex_spark.similarity import ann  # noqa: E402
from pgosm_flex_spark.text import dedup  # noqa: E402
from pgosm_flex_spark.images import ops as img_ops  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="subset of query names")
    ap.add_argument("--plans", default=None, help="suffix: write plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=None, help="override image count")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pgosm-flex-spark-bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n_images = args.n or spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    images = fixtures.images_df(spark, n_images, with_pixels=False)
    pts = tagf.with_lonlat(images).select("image_id", "lon", "lat").persist()
    pts.count()

    wanted = set(args.queries) if args.queries else None

    def run(name: str, df_fn, action="count"):
        """df_fn() -> DataFrame. Times: rep1 (plan+exec), then reps-1 execs of
        the SAME Dataset (no re-plan), then fresh-Dataset reps like bench.py
        does (re-plan each time)."""
        if wanted is not None and name not in wanted:
            return
        spark.sparkContext.setJobDescription(name)
        df = df_fn()
        if args.plans is not None:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(buf.getvalue())

        def act(d):
            if action == "count":
                return d.count()
            d.write.format("noop").mode("overwrite").save()
            return None

        # same-Dataset reps: rep1 pays planning, later reps reuse QueryExecution
        same = []
        for _ in range(args.reps):
            t0 = time.time()
            act(df)
            same.append(time.time() - t0)
        # fresh-Dataset reps (bench.py methodology: new plan per rep)
        fresh = []
        for _ in range(args.reps):
            d = df_fn()
            t0 = time.time()
            act(d)
            fresh.append(time.time() - t0)
        fmt = lambda xs: "[" + ", ".join(f"{x:.3f}" for x in xs) + "]"  # noqa: E731
        print(
            f"{name}: same-ds {fmt(same)} | fresh-ds {fmt(fresh)} "
            f"| plan_overhead≈{same[0] - min(same[1:]):.3f}s",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)

    # ---- pip_join chain
    osm = fixtures.osm_objects_df(spark).persist()
    tables = build_layer_tables(osm, layerset="everything")
    place = relation_member_dedup(tables["place_polygon"]).persist()
    place.count()
    cover = build_polygon_cover(place.filter(F.col("geom_wkb").isNotNull())).persist()
    cover.count()
    osm.unpersist()
    res_levels = cover_res_levels(cover)

    def mk_pip():
        pairs = pip_join(
            pts,
            place.filter(F.col("geom_wkb").isNotNull()),
            point_cols=["image_id"],
            cover=cover,
            res_levels=res_levels,
        )
        attrs = place.select("osm_id", "osm_type", "admin_level")
        return (
            pairs.join(F.broadcast(attrs), "osm_id")
            .groupBy("osm_type", "admin_level")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    run("q_pip_join", mk_pip)
    run("q_tiles_z12", lambda: tile_counts(pts, zoom=12))
    place.unpersist()
    cover.unpersist()

    # ---- layer mapping
    captions = tagf.with_tags(images).select(
        F.col("image_id").cast("string").alias("caption_id"), "tags", "lon", "lat"
    )
    osm_like = captions.select(
        F.xxhash64("caption_id").alias("osm_id"),
        F.lit("N").alias("geom_type"), F.lit(False).alias("is_closed"),
        "tags", "lon", "lat",
        F.lit(None).cast("binary").alias("geom_wkb"),
        F.lit(None).cast("array<long>").alias("member_ids"),
    ).persist()
    osm_like.count()

    def mk_union():
        tbls = build_layer_tables(osm_like, layerset="everything")
        layer_ids = None
        for name, df in tbls.items():
            sel = df.select("osm_id")
            layer_ids = sel if layer_ids is None else layer_ids.unionByName(sel)
        return layer_ids

    run("q_layer_mapping", mk_union)

    from pgosm_flex_spark.layers.router import route_layer_ids

    run("q_layer_route", lambda: route_layer_ids(osm_like))
    osm_like.unpersist()

    # ---- kNN adaptive
    from pgosm_flex_spark.operators.knn import knn_join_adaptive

    feats = (
        tagf.with_lonlat(fixtures.images_df(spark, 20000, with_pixels=False))
        .select(F.col("image_id").alias("feat_id"), "lon", "lat")
        .persist()
    )
    feats.count()
    run(
        "q_knn3_adaptive",
        lambda: knn_join_adaptive(
            pts, feats, k=3, point_id="image_id", feature_id="feat_id"
        ),
    )
    feats.unpersist()

    # ---- text dedup + ANN
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    run("q_minhash_dedup", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.8))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 100)
    run("q_ann_top5", lambda: ann.cosine_topk(emb, queries, k=5))

    # ---- phash dedup
    from pgosm_flex_spark.images.neardup import phash_near_dup_pairs

    base_ph = images.select("image_id", "phash")
    ph_variants = base_ph.filter(F.xxhash64("image_id") % 20 == 0).select(
        F.concat(F.lit("v"), "image_id").alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(1)).alias("phash"),
    )
    ph_all = base_ph.unionByName(ph_variants).persist()
    ph_all.count()
    run("q_phash_dedup", lambda: phash_near_dup_pairs(ph_all, max_hamming=2))
    ph_all.unpersist()

    # ---- image decode
    n_decode = min(20000, n_images)
    imgs_px = fixtures.images_df(spark, n_decode, with_pixels=True).persist()
    imgs_px.count()
    run(
        "q_image_decode",
        lambda: img_ops.decode_stats(imgs_px).filter(~F.col("phash_ok")),
    )
    imgs_px.unpersist()
    pts.unpersist()


if __name__ == "__main__":
    main()
