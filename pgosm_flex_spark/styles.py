"""QGIS layer-styles table — the reference's style-distribution surface.

The reference ships QGIS ``layer_styles`` rows (QML/SLD XML per layer
table) and loads them on every fresh import unless ``--skip-qgis-style``:
create table → load staging from a pg_dump artifact → point
``f_table_catalog`` at the target database → insert ONLY styles not
already present (anti-join on catalog/schema/table/stylename, so a user's
customized styles are never overwritten) → clean staging
(/root/reference/docker/qgis_styles.py:13-29,
db/qgis-style/_load_layer_styles.sql, create_layer_styles.sql).

Here the prod table is a parquet table in the export bundle and the whole
load is one anti-join + append. The reference's actual XML payloads are a
data artifact its repo ships (db/qgis-style/layer_styles.sql) — a user
brings that file and :func:`staging_from_pg_dump` ingests it via the
pg_dump COPY source; :func:`placeholder_styles_df` provides a minimal
deterministic stand-in (same rows/keys as the reference's four styled
tables, stub QML bodies) so the pipeline is exercised without copying the
reference's artwork.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYER_STYLES_SCHEMA = (
    "id int, f_table_catalog string, f_table_schema string, "
    "f_table_name string, f_geometry_column string, stylename string, "
    "styleqml string, stylesld string, useasdefault boolean, "
    "description string, owner string, ui string, update_time timestamp, "
    "type string"
)
_COLS = [f.split()[0] for f in LAYER_STYLES_SCHEMA.split(", ")]

# the four (table, stylename) keys the reference styles
# (db/qgis-style/layer_styles.sql COPY rows 1-4)
_PLACEHOLDER_KEYS = [
    ("road_line", "osm_road_line"),
    ("building_polygon", "osm_building_polygon"),
    ("landuse_polygon", "osm_landuse_polygon"),
    ("vplace_polygon", "place_polygon"),
]


def _stub_qml(table: str) -> str:
    return (
        "<!DOCTYPE qgis PUBLIC 'http://mrcc.com/qgis.dtd' 'SYSTEM'>"
        f"<qgis styleCategories=\"AllStyleCategories\"><!-- placeholder "
        f"style for {table}; load the reference's layer_styles.sql via "
        "staging_from_pg_dump for the shipped artwork --></qgis>"
    )


def placeholder_styles_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            i + 1, "pgosm", "osm", tbl, "geom", style, _stub_qml(tbl), None,
            True, f"placeholder {style}", "pgosm_flex_spark", None, None,
            "Normal",
        )
        for i, (tbl, style) in enumerate(_PLACEHOLDER_KEYS)
    ]
    return spark.createDataFrame(rows, schema=LAYER_STYLES_SCHEMA)


def staging_from_pg_dump(spark: SparkSession, dump_path: str) -> DataFrame:
    """The reference's own ``layer_styles.sql`` (or any pg_dump of a
    layer_styles table) → a typed staging frame."""
    from pgosm_flex_spark.sources.pg_dump import read_pg_dump_copy

    raw = read_pg_dump_copy(spark, dump_path, table="layer_styles_staging")
    casts = []
    for field in LAYER_STYLES_SCHEMA.split(", "):
        name, typ = field.split(" ", 1)
        casts.append(F.col(name).cast(typ).alias(name))
    return raw.select(*casts)


_MERGE_KEY = ["f_table_catalog", "f_table_schema", "f_table_name", "stylename"]


def merge_styles(existing: DataFrame, staging: DataFrame) -> DataFrame:
    """The staging→prod insert of _load_layer_styles.sql as a pure frame op:
    keep every existing row untouched; append only staging rows whose
    (catalog, schema, table, stylename) key is absent (LEFT JOIN ... WHERE
    id IS NULL → left_anti), ids continuing after the existing maximum
    (SERIAL)."""
    start = existing.agg(F.coalesce(F.max("id"), F.lit(0))).first()[0]
    from pyspark.sql import Window

    # metadata-scale table (styles, not corpus rows): the single-partition
    # id window is deliberate, matching the SERIAL assignment
    w = Window.orderBy("id", *_MERGE_KEY)
    fresh = (
        staging.join(existing.select(*_MERGE_KEY), on=_MERGE_KEY, how="left_anti")
        .withColumn("id", (F.lit(start) + F.row_number().over(w)).cast("int"))
        .select(*_COLS)
    )
    return existing.select(*_COLS).unionByName(fresh)


def load_qgis_styles(
    spark: SparkSession,
    bundle_dir: str,
    staging: DataFrame | None = None,
    db_name: str = "pgosm",
) -> DataFrame:
    """Merge ``staging`` styles into the bundle's ``layer_styles`` parquet
    table and return the merged frame.

    Reference semantics, step for step (docker/qgis_styles.py:load_qgis_styles):
    retarget ``f_table_catalog`` when ``db_name`` differs from the default
    (update_styles_db_name), then :func:`merge_styles` — a user's
    customized styles are never overwritten.
    """
    if staging is None:
        staging = placeholder_styles_df(spark)
    if db_name != "pgosm":
        staging = staging.withColumn("f_table_catalog", F.lit(db_name))

    out = os.path.join(bundle_dir, "layer_styles")
    # ONLY a missing table means "fresh load" — any other read failure
    # (permissions, corrupt footers, transient FS errors) must raise: the
    # merge exists to protect customized styles, and treating a failed read
    # as an empty table would let the overwrite below destroy them
    if os.path.isdir(out):
        existing = spark.read.parquet(out)
    else:
        existing = spark.createDataFrame([], schema=LAYER_STYLES_SCHEMA)

    # the merged plan reads the same parquet dir the overwrite below
    # replaces — persist + count materializes every block before the files
    # are touched, and the pin is released on exit instead of orphaning a
    # checkpoint RDD per call (the sinks.merge_into_partitioned pattern;
    # eviction-recompute risk is nil for a metadata-scale styles table)
    merged = merge_styles(existing, staging).persist()
    try:
        merged.count()
        merged.write.mode("overwrite").parquet(out)
        return spark.read.parquet(out)
    finally:
        merged.unpersist(blocking=False)
