"""Custom layerset INIs + PGOSM_LANGUAGE best-name preference.

Mirrors the reference's configuration surfaces:
- layerset INI parsing (/root/reference/flex-config/layerset.lua:17-28,
  run.lua:5-103, docker/pgosm_flex.py:474-515) including the
  docker/tests/layersets/place_{true,false,missing}.ini fixtures;
- the global language preference (helpers.lua:28-34,189-196) threaded into
  every layer table's name column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgosm_flex_spark.functions import scalars as sc
from pgosm_flex_spark.layers import build_layer_tables
from pgosm_flex_spark.layers.registry import (
    LAYERSETS,
    layer_table_predicates,
    layerset_layers,
    resolve_layerset_path,
)
from pgosm_flex_spark.layers.router import route_layer_rows


# ---------------------------------------------------------------------------
# layerset INI parsing
# ---------------------------------------------------------------------------

@pytest.fixture()
def ini_dir(tmp_path):
    """The reference's docker/tests/layersets fixtures, verbatim."""
    (tmp_path / "place_true.ini").write_text("[layerset]\nplace=true\n")
    (tmp_path / "place_false.ini").write_text("[layerset]\nplace=false\n")
    (tmp_path / "place_missing.ini").write_text("[layerset]\n")
    return str(tmp_path)


def test_ini_place_true(ini_dir):
    assert layerset_layers("place_true", ini_dir) == ["place"]


def test_ini_place_false(ini_dir):
    assert layerset_layers("place_false", ini_dir) == []


def test_ini_place_missing_key_disables(ini_dir):
    assert layerset_layers("place_missing", ini_dir) == []


def test_ini_case_insensitive_true_and_unknown_key_ignored(tmp_path):
    # run.lua checks a fixed list of known layers; an unknown INI key is
    # simply never consulted. 'True'/'TRUE' enable (configparser values are
    # strings; the reference's Python check is .lower() == 'true').
    (tmp_path / "custom.ini").write_text(
        "[layerset]\nroad=True\nwater=TRUE\nnot_a_layer=true\nplace=yes\n"
    )
    # 'yes' is not 'true': the reference's documented INI format uses
    # true/false and its Python gate rejects anything else
    assert layerset_layers("custom", str(tmp_path)) == ["road", "water"]


def test_ini_reproducing_builtin_minimal_matches(tmp_path):
    lines = "\n".join(f"{layer}=true" for layer in LAYERSETS["minimal"])
    (tmp_path / "minimal.ini").write_text(f"[layerset]\n{lines}\n")
    assert layerset_layers("minimal", str(tmp_path)) == sorted(LAYERSETS["minimal"])


def test_env_path_resolved_at_job_boundary_only(ini_dir, monkeypatch):
    monkeypatch.setenv("PGOSM_LAYERSET_PATH", ini_dir)
    # library call stays env-insensitive: the ambient var must not make an
    # unknown built-in name suddenly resolve (oracle determinism)
    with pytest.raises(ValueError, match="unknown layerset"):
        layerset_layers("place_true")
    # the boundary resolver picks the env var up...
    assert resolve_layerset_path(None) == ini_dir
    assert layerset_layers("place_true", resolve_layerset_path(None)) == ["place"]
    # ...and an explicit --layerset-path argument wins over it
    monkeypatch.setenv("PGOSM_LAYERSET_PATH", "/nonexistent")
    assert resolve_layerset_path(ini_dir) == ini_dir
    assert layerset_layers("place_true", resolve_layerset_path(ini_dir)) == ["place"]
    monkeypatch.delenv("PGOSM_LAYERSET_PATH")
    assert resolve_layerset_path(None) is None


def test_ini_missing_file_raises(ini_dir):
    with pytest.raises(FileNotFoundError):
        layerset_layers("nope", ini_dir)


def test_ini_missing_section_raises(tmp_path):
    (tmp_path / "bad.ini").write_text("[wrong]\nplace=true\n")
    with pytest.raises(ValueError, match="layerset"):
        layerset_layers("bad", str(tmp_path))


def test_unknown_builtin_still_raises():
    with pytest.raises(ValueError, match="unknown layerset"):
        layerset_layers("nope")


def test_build_layer_tables_with_ini(spark, ini_dir):
    from pgosm_flex_spark import fixtures

    osm = fixtures.osm_objects_df(spark)
    tables = build_layer_tables(osm, layerset="place_true", layerset_path=ini_dir)
    assert set(tables) == {"place_point", "place_line", "place_polygon"}
    # and the predicate surface resolves the same table set (router lockstep)
    assert set(layer_table_predicates("place_true", ini_dir)) == set(tables)


# ---------------------------------------------------------------------------
# language preference threading
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def named_osm(spark):
    """Two place nodes: one with a Spanish name tag, one without."""
    rows = [
        (1, "N", {"place": "city", "name": "London", "name:es": "Londres"}),
        (2, "N", {"place": "town", "name": "Dover"}),
    ]
    return (
        spark.createDataFrame(
            [(i, g, list(t.items())) for i, g, t in rows],
            schema="osm_id long, geom_type string, tags array<struct<key:string,value:string>>",
        )
        .select(
            "osm_id", "geom_type",
            F.lit(None).cast("boolean").alias("is_closed"),
            F.map_from_entries("tags").alias("tags"),
            F.lit(0.0).alias("lon"), F.lit(0.0).alias("lat"),
            F.lit(None).cast("binary").alias("geom_wkb"),
            F.lit(None).cast("array<long>").alias("member_ids"),
        )
    )


def _names(tables) -> dict[int, str]:
    return {
        r["osm_id"]: r["name"]
        for r in tables["place_point"].select("osm_id", "name").collect()
    }


def test_language_threads_into_layer_tables(spark, named_osm):
    got = _names(build_layer_tables(named_osm, layerset="minimal", language="es"))
    assert got == {1: "Londres", 2: "Dover"}  # name:es first, fallback chain


def test_language_default_off(spark, named_osm):
    got = _names(build_layer_tables(named_osm, layerset="minimal"))
    assert got == {1: "London", 2: "Dover"}


def test_library_is_env_insensitive(spark, named_osm, monkeypatch):
    # library determinism: an ambient PGOSM_LANGUAGE must NOT change
    # build_layer_tables results (oracle parity) — env resolution is the
    # JOB's boundary concern (scalars.resolve_language)
    monkeypatch.setenv("PGOSM_LANGUAGE", "es")
    got = _names(build_layer_tables(named_osm, layerset="minimal"))
    assert got == {1: "London", 2: "Dover"}


def test_resolve_language_job_boundary(monkeypatch):
    monkeypatch.delenv("PGOSM_LANGUAGE", raising=False)
    assert sc.resolve_language(None) is None
    assert sc.resolve_language("de") == "de"
    assert sc.resolve_language("") is None  # explicit off
    monkeypatch.setenv("PGOSM_LANGUAGE", "es")
    assert sc.resolve_language(None) == "es"
    assert sc.resolve_language("de") == "de"  # CLI wins
    assert sc.resolve_language("") is None


def test_language_plan_captured_at_construction(spark, named_osm):
    # expressions capture the language when the plan is BUILT — leaving the
    # name_language scope must not change an already-built plan
    with sc.name_language("es"):
        tables = build_layer_tables(named_osm, layerset="minimal")
    assert _names(tables) == {1: "Londres", 2: "Dover"}


def test_name_language_scope_is_thread_local(spark):
    import threading

    seen: dict[str, str | None] = {}
    barrier = threading.Barrier(2)

    def worker(lang: str | None, key: str) -> None:
        with sc.name_language(lang):
            barrier.wait(timeout=10)  # both threads inside their scopes
            seen[key] = sc.default_name_language()
            barrier.wait(timeout=10)

    a = threading.Thread(target=worker, args=("es", "a"))
    b = threading.Thread(target=worker, args=("de", "b"))
    a.start(); b.start(); a.join(); b.join()
    # no cross-contamination between concurrently-open scopes
    assert seen == {"a": "es", "b": "de"}
    assert sc.default_name_language() is None


def test_language_threads_into_routed_rows(spark, named_osm):
    routed = route_layer_rows(named_osm, layerset="minimal", language="es")
    got = {
        r["osm_id"]: r["name"]
        for r in routed.filter(F.col("layer_table") == "place_point")
        .select("osm_id", "name")
        .collect()
    }
    assert got == {1: "Londres", 2: "Dover"}


def test_name_language_scope_restores():
    assert sc.default_name_language() is None
    with sc.name_language("es"):
        assert sc.default_name_language() == "es"
        with sc.name_language(""):
            assert sc.default_name_language() is None
    assert sc.default_name_language() is None
