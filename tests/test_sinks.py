from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F

from pgosm_flex_spark import fixtures
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.sinks import export_bundle, run_sql_scripts, write_layer_table
from pgosm_flex_spark.sources.lookup import pgosm_road


def test_write_layer_table_cell_partitioned(spark, tmp_path):
    osm = fixtures.osm_objects_df(spark)
    poi = build_layer_tables(osm, layerset="minimal")["poi_combined_point"]
    n = write_layer_table(poi, str(tmp_path), "poi_combined_point")
    back = spark.read.parquet(str(tmp_path / "poi_combined_point"))
    assert back.count() == n > 0
    assert "cell_p" in back.columns  # partition pruning key


def test_layer_table_scan_prunes_partitions(spark, tmp_path):
    """The cell_p directory layout is the GiST-index analog (SURVEY §2.7:
    reference declares per-table geom indexes, helpers.lua:442-573): a
    cell-keyed predicate on the written table must land in the scan's
    PartitionFilters slot — directory pruning, only matching partitions
    read — not in DataFilters as a post-scan residual."""
    osm = fixtures.osm_objects_df(spark)
    poi = build_layer_tables(osm, layerset="minimal")["poi_combined_point"]
    write_layer_table(poi, str(tmp_path), "poi_combined_point", cell_res=12)
    back = spark.read.parquet(str(tmp_path / "poi_combined_point"))
    present = sorted(
        r["cell_p"] for r in back.select("cell_p").distinct().collect()
    )
    assert len(present) > 1, "fixture collapsed to one partition; raise cell_res"
    target_cell = present[-1]
    q = back.filter(F.col("cell_p") == target_cell)
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cell_p" in pf, plan[:1500]
    # independent expected count: full scan collected, counted Python-side
    expected = sum(
        1 for r in back.select("cell_p").collect() if r["cell_p"] == target_cell
    )
    assert q.count() == expected > 0


def test_export_bundle_manifest(spark, tmp_path):
    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset="minimal")
    manifest = export_bundle(
        spark, tables, str(tmp_path / "bundle"), region="dc", layerset="minimal",
        pgosm_date="2026-01-01",
    )
    assert manifest["bundle"] == "dc-minimal-2026-01-01"
    on_disk = json.load(open(tmp_path / "bundle" / "manifest.json"))
    assert on_disk["tables"] == manifest["tables"]
    assert set(manifest["tables"]) == set(tables)


def test_export_bundle_write_manifest_false_leaves_no_marker(spark, tmp_path):
    """manifest.json doubles as the completion marker ImportMode.okay_to_run
    checks: a caller composing the bundle with other concurrent sections
    (jobs/import_job.py) must be able to defer it, or a crash in a later
    section leaves a completed-looking bundle behind."""
    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset="minimal")
    out = tmp_path / "bundle_nm"
    manifest = export_bundle(
        spark, tables, str(out), region="dc", layerset="minimal",
        pgosm_date="2026-01-01", write_manifest=False,
    )
    assert manifest["tables"]  # dict still returned in full
    assert not (out / "manifest.json").exists()
    # the tables themselves were written
    assert any(out.iterdir())


def test_run_sql_scripts_templating(spark):
    run_sql_scripts(
        spark,
        [
            "CREATE DATABASE IF NOT EXISTS {schema_name}",
            "CREATE TABLE {schema_name}.t_sql_deploy (a INT) USING parquet;"
            "INSERT INTO {schema_name}.t_sql_deploy VALUES (1), (2)",
        ],
        schema_name="osm_test",
    )
    assert spark.sql("SELECT count(*) FROM osm_test.t_sql_deploy").collect()[0][0] == 2
    spark.sql("DROP TABLE osm_test.t_sql_deploy")
    spark.sql("DROP DATABASE osm_test")


def test_pgosm_road_golden_count(spark):
    # tests/sql/pgosm_road_row_count.sql golden: 25 rows
    df = pgosm_road(spark)
    assert df.count() == 25
    mph = {r["osm_type"]: r["maxspeed_mph"] for r in df.collect()}
    assert mph["motorway"] == 65.0  # 104.60736 km/h / 1.609344


def test_split_sql_statements_quotes_and_comments():
    from pgosm_flex_spark.sinks import split_sql_statements

    stmts = split_sql_statements(
        "SELECT 'a;b' AS x; -- trailing; comment\n"
        "SELECT \"q;\" FROM t /* block; comment */; SELECT 'it''s;ok'"
    )
    assert len(stmts) == 3
    assert stmts[0] == "SELECT 'a;b' AS x"
    assert "block; comment" in stmts[1]
    assert stmts[2] == "SELECT 'it''s;ok'"


def test_run_sql_scripts_semicolon_in_literal(spark):
    from pgosm_flex_spark.sinks import run_sql_scripts

    run_sql_scripts(
        spark,
        ["CREATE OR REPLACE TEMP VIEW v_semi AS SELECT 'a;b' AS s; SELECT * FROM v_semi"],
        schema_name="unused",
    )
    assert spark.sql("SELECT s FROM v_semi").collect()[0][0] == "a;b"


def test_merge_into_partitioned_upsert(spark, tmp_path):
    import glob
    import os
    import pandas as pd
    from pyspark.sql import functions as F
    from pgosm_flex_spark.sinks import merge_into_partitioned

    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": list(range(10)),
                "val": [f"v{i}" for i in range(10)],
                "cell_p": [i % 3 for i in range(10)],
            }
        )
    )
    merge_into_partitioned(spark, target, base, key_cols=["id"])
    assert spark.read.parquet(target).count() == 10

    untouched_files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{target}/cell_p=2/*.parquet")
    }
    # upsert: update id=0 (cell 0), insert id=100 (cell 1); cell 2 untouched
    updates = spark.createDataFrame(
        pd.DataFrame({"id": [0, 100], "val": ["NEW", "v100"], "cell_p": [0, 1]})
    )
    m = merge_into_partitioned(spark, target, updates, key_cols=["id"])
    assert m == {"touched_partitions": 2, "upserted_rows": 2}

    out = spark.read.parquet(target)
    assert out.count() == 11
    assert out.filter(F.col("id") == 0).collect()[0]["val"] == "NEW"
    assert out.filter(F.col("id") == 100).count() == 1
    # untouched partition's files were not rewritten
    for f, mt in untouched_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mt


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the same cell key must join with ZERO
    exchanges — the co-located layout for repeated spatial joins."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pgosm_flex_spark.index import cells
    from pgosm_flex_spark.sinks import write_bucketed

    from pgosm_flex_spark import fixtures

    pdf = pd.DataFrame(
        {
            "image_id": [f"i{i}" for i in range(2000)],
            "lon": [fixtures.point_lonlat(i)[0] for i in range(2000)],
            "lat": [fixtures.point_lonlat(i)[1] for i in range(2000)],
        }
    )
    pts = spark.createDataFrame(pdf).withColumn(
        "cell", cells.cell_col(F.col("lon"), F.col("lat"), 10)
    )
    feats = spark.createDataFrame(pdf.iloc[:500].assign(fid=range(500))).withColumn(
        "cell", cells.cell_col(F.col("lon"), F.col("lat"), 10)
    )
    spark.sql("DROP TABLE IF EXISTS b_pts")
    spark.sql("DROP TABLE IF EXISTS b_feats")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    write_bucketed(pts, "b_pts", "cell", n_buckets=8, sort_col="cell")
    write_bucketed(feats.select("fid", "cell"), "b_feats", "cell", n_buckets=8, sort_col="cell")
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("b_pts")
        b = spark.table("b_feats")
        joined = a.join(b, "cell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_pts")
        spark.sql("DROP TABLE IF EXISTS b_feats")


def test_export_bundle_routed_parity(spark, tmp_path):
    """Single-scan routed export must produce the same bundle as the
    per-table export: identical per-table counts in the manifest, identical
    rows for a routed table read back via read_layer_table, and the
    override table (post-processed outside the router) written to its own
    subdir exactly as export_bundle would."""
    from pgosm_flex_spark.layers.router import read_layer_table
    from pgosm_flex_spark.sinks import export_bundle_routed

    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset="minimal")
    per_table = export_bundle(
        spark, tables, str(tmp_path / "classic"), region="dc",
        layerset="minimal", pgosm_date="2026-01-01",
    )
    routed = export_bundle_routed(
        spark, osm, str(tmp_path / "routed"), region="dc",
        layerset="minimal", pgosm_date="2026-01-01",
        overrides={"place_polygon": tables["place_polygon"]},
    )
    assert routed["routed"] is True
    assert routed["tables"] == per_table["tables"]

    back = read_layer_table(
        spark, str(tmp_path / "routed" / "routed"), "road_major",
        layerset="minimal",
    )
    want = tables["road_major"]
    assert [f.name for f in back.schema.fields] == [
        f.name for f in want.schema.fields
    ]
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0

    # override slice must NOT appear in the routed stream...
    routed_tables = {
        r["layer_table"]
        for r in spark.read.parquet(str(tmp_path / "routed" / "routed"))
        .select("layer_table").distinct().collect()
    }
    assert "place_polygon" not in routed_tables
    # ...and its subdir write matches the classic layout
    pp = spark.read.parquet(str(tmp_path / "routed" / "place_polygon"))
    assert pp.count() == per_table["tables"]["place_polygon"]

    # output clustering: the salted repartition bounds files per partition
    # dir at files_per_partition (default 4) — without it a dynamic write
    # emits one file per task × dir (small-file explosion at scale)
    import glob

    for d in glob.glob(str(tmp_path / "routed" / "routed" / "layer_table=*/cell_p=*")):
        n_files = len(glob.glob(os.path.join(d, "*.parquet")))
        assert 1 <= n_files <= 4, f"{d}: {n_files} files"


def test_export_bundle_routed_empty_source(spark, tmp_path):
    """An empty source writes zero partition dirs (nothing for parquet to
    infer a schema from) — the manifest must still land with every table
    at 0 rows instead of the count read-back throwing."""
    from pgosm_flex_spark.sinks import export_bundle_routed

    osm = fixtures.osm_objects_df(spark).filter("osm_id < -999999999")
    m = export_bundle_routed(
        spark, osm, str(tmp_path / "empty"), region="e",
        layerset="minimal", pgosm_date="2026-01-01",
    )
    assert m["routed"] is True
    assert m["tables"] and all(v == 0 for v in m["tables"].values())


def test_run_sql_scripts_literal_braces_pass_through(spark):
    """Regression: str.format templating raised KeyError/IndexError on any
    literal brace in the SQL (regex quantifier, JSON default) and silently
    rewrote '{{' to '{'. Templating is now a targeted placeholder replace."""
    run_sql_scripts(
        spark,
        [
            "CREATE OR REPLACE TEMP VIEW {schema_name}_braces AS "
            "SELECT regexp_replace('ab12cd', '[0-9]{2}', '#') AS r, "
            "'{\"a\": 1}' AS j, '{{literal}}' AS dbl",
        ],
        schema_name="vbr",
    )
    row = spark.sql("SELECT r, j, dbl FROM vbr_braces").collect()[0]
    assert row["r"] == "ab#cd"
    assert row["j"] == '{"a": 1}'
    assert row["dbl"] == "{{literal}}"


def test_split_sql_statements_drops_comment_only_segments(spark):
    from pgosm_flex_spark.sinks import split_sql_statements

    stmts = split_sql_statements(
        "SELECT 1;\n-- end of deploy\n"
    )
    assert stmts == ["SELECT 1"]
    stmts = split_sql_statements(
        "/* header */ SELECT 2; /* footer only */;\n--tail"
    )
    assert len(stmts) == 1 and "SELECT 2" in stmts[0]
    # a comment-only SCRIPT is a no-op, not a ParseException
    run_sql_scripts(spark, ["-- nothing to do\n"], schema_name="unused")
    # but comments inside a real statement ride through
    stmts = split_sql_statements("SELECT 3 -- inline\n;")
    assert stmts == ["SELECT 3 -- inline"]


def test_routed_3857_overrides_projected_in_sink(spark, tmp_path):
    """A direct caller passing UNPROJECTED override frames at srid=3857 must
    still get meter coordinates on disk (the manifest claims EPSG:3857);
    pre-projected frames (x/y present) pass through un-re-projected; a
    wkb-only frame of unknowable SRID raises."""
    import numpy as np
    import pytest

    from pgosm_flex_spark.geometry import srid as S
    from pgosm_flex_spark.sinks import export_bundle_routed

    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset="minimal")
    raw = tables["place_point"]

    # unprojected override: the sink projects it
    export_bundle_routed(
        spark, osm, str(tmp_path / "a"), region="r", layerset="minimal",
        pgosm_date="d", srid=3857, files_per_partition=None,
        overrides={"place_point": raw},
    )
    got = spark.read.parquet(str(tmp_path / "a" / "place_point"))
    row = got.filter(F.col("lon").isNotNull()).first()
    assert row["x"] == pytest.approx(S.R_3857 * np.radians(row["lon"]), rel=1e-12)

    # pre-projected override: byte-identical to the auto-projected write
    pre = S.with_projected(raw, 3857)
    export_bundle_routed(
        spark, osm, str(tmp_path / "b"), region="r", layerset="minimal",
        pgosm_date="d", srid=3857, files_per_partition=None,
        overrides={"place_point": pre},
    )
    got_b = spark.read.parquet(str(tmp_path / "b" / "place_point"))
    assert got_b.exceptAll(got).count() == 0
    assert got.exceptAll(got_b).count() == 0

    # ambiguous wkb-only frame: refuse rather than mislabel
    ambiguous = raw.select("osm_id", "geom_wkb")
    with pytest.raises(ValueError, match="cannot tell"):
        export_bundle_routed(
            spark, osm, str(tmp_path / "c"), region="r", layerset="minimal",
            pgosm_date="d", srid=3857, files_per_partition=None,
            overrides={"place_polygon": ambiguous},
        )
