"""Streaming import mode — SURVEY.md §3.1 lifecycle as a Structured Stream.

The reference has no true streaming ingest (its closest analog is
``--replication``: poll diffs, apply, refresh —
/root/reference/docker/pgosm_flex.py:23-79 +
db/deploy/replication_functions.sql); the training-pipeline mandate asks for
the streaming-native path. Composition of existing pieces:

  readStream (parquet file source of image rows)
    → stream_first_seen          (stateful exact dedup by phash; state store
                                  survives restarts)
    → foreachBatch:
        with_tags                (caption → tags + lon/lat, JVM-side)
        layer membership         (one shared scan → union of enabled layer
                                  tables' ids, the import's core mapping)
        merge_into_partitioned   (MERGE-INTO upsert keyed by image_id,
                                  partitioned by coarse cell — only touched
                                  partitions rewrite)

``availableNow`` trigger: each call drains whatever files are present and
stops; rerunning with the same checkpoint continues from state — the
streaming analog of the journal-resumable batch import. Restart-safety:
foreachBatch may replay a batch after a crash, and the MERGE upsert keyed by
image_id makes the replay idempotent (same rows overwrite themselves).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgosm_flex_spark.index import cells
from pgosm_flex_spark.streaming.stateful import stream_first_seen

IMAGE_STREAM_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def map_batch_to_layers(
    batch_df: DataFrame,
    layerset: str = "minimal",
    unit_res: int = 4,
    layerset_path: str | None = None,
    language: str | None = None,
) -> DataFrame:
    """One micro-batch of image rows → upsert rows for the MERGE sink:
    (image_id, caption, phash, lon, lat, layers, cell_p). ``layers`` is the
    sorted list of layer tables the row's caption tags land in — the same
    tag→schema mapping the batch import runs, over the batch's shared scan.
    """
    from pgosm_flex_spark.functions import tags as tagf
    from pgosm_flex_spark.layers import build_layer_tables

    rows = tagf.with_tags(batch_df).filter(F.col("lon").isNotNull())
    osm_like = rows.select(
        F.xxhash64("image_id").alias("osm_id"),
        F.lit("N").alias("geom_type"),
        F.lit(False).alias("is_closed"),
        "tags",
        "lon",
        "lat",
        F.lit(None).cast("binary").alias("geom_wkb"),
        F.lit(None).cast("array<long>").alias("member_ids"),
    )
    tables = build_layer_tables(
        osm_like, layerset=layerset, layerset_path=layerset_path,
        language=language,
    )
    membership = None
    for name, df in tables.items():
        part = df.select("osm_id", F.lit(name).alias("__layer"))
        membership = part if membership is None else membership.unionByName(part)
    layer_lists = membership.groupBy("osm_id").agg(
        F.array_sort(F.collect_set("__layer")).alias("layers")
    )
    keyed = rows.withColumn("__osm_id", F.xxhash64("image_id"))
    return (
        keyed.join(layer_lists, keyed["__osm_id"] == layer_lists["osm_id"], "left")
        .select(
            "image_id",
            "caption",
            "phash",
            "lon",
            "lat",
            F.coalesce("layers", F.array().cast("array<string>")).alias("layers"),
            cells.cell_col(F.col("lon"), F.col("lat"), unit_res).alias("cell_p"),
        )
    )


def run_stream_import(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    layerset: str = "minimal",
    unit_res: int = 4,
    layerset_path: str | None = None,
    language: str | None = None,
):
    """Drain the files currently in ``input_dir`` through the streaming
    import (availableNow) and block until done. Rerun to pick up new files;
    the checkpoint keeps dedup state and file-source progress across runs."""
    from pgosm_flex_spark.sinks import merge_into_partitioned

    stream = spark.readStream.schema(IMAGE_STREAM_SCHEMA).parquet(input_dir)
    first = stream_first_seen(
        stream, key_col="phash", id_col="image_id", carry_cols=("caption",)
    )

    target = os.path.join(out_dir, "stream_points")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        updates = map_batch_to_layers(
            batch_df, layerset=layerset, unit_res=unit_res,
            layerset_path=layerset_path, language=language,
        )
        merge_into_partitioned(
            spark, target, updates, key_cols=["image_id"], partition_col="cell_p"
        )

    q = (
        first.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return target
