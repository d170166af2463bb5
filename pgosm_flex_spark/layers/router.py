"""Single-scan layer dispatch — evaluate EVERY table's membership in one pass.

The reference's osm2pgsql import streams each object through all enabled
layers' Lua callbacks in one pass (flex-config/style/*.lua process_node/way/
relation); ``build_layer_tables`` re-expresses the *tables* faithfully but a
consumer that unions them (golden counts, QC coverage, monitoring) executes
one scan of the source PER TABLE — measured 44 cache scans ≈ 13 s of a 23 s
count job at 600k rows, and at 100 TB it is 44 passes over the input.

``route_layer_ids`` is the one-pass analog: a single projection evaluates all
~44 membership predicates per row (``layers.registry.layer_table_predicates``,
the same filter expressions the builders chain) and explodes the matched
table names — whole-stage-codegen CASE logic, zero joins, zero extra scans.
Equivalence with the per-table builders is pinned by
tests/test_router.py (per-table id-set equality on the all-variants fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgosm_flex_spark.layers.registry import layer_table_predicates


def route_layer_ids(
    osm: DataFrame,
    layerset: str = "everything",
    id_col: str = "osm_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id_col, [extra_cols...,] table) — one output row per (object, table
    it belongs to), from ONE scan of ``osm``.

    ``extra_cols`` carries additional source columns through the explode
    (e.g. ``geom_type`` for per-type rollups). Rows matching no table are
    dropped (explode of an empty array).
    """
    preds = layer_table_predicates(layerset)
    routes = F.array(*[F.when(preds[n], F.lit(n)) for n in sorted(preds)])
    carry = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    return osm.select(*carry, F.explode(F.array_compact(routes)).alias("table"))


def layer_membership(
    osm: DataFrame, layerset: str = "everything", exclude: tuple[str, ...] = ()
):
    """Boolean Column: row belongs to at least one table of the layerset
    (three-valued NULL counts as non-member, like DataFrame.filter). The
    zero-shuffle building block for coverage anti-joins: features NOT in any
    layer = ``osm.filter(~layer_membership(osm))`` — no union, no distinct,
    no join. ``exclude`` drops tables from the check (the QC coverage rule
    ignores the tags/unitable escape hatches)."""
    preds = layer_table_predicates(layerset)
    out = F.lit(False)
    for name, pred in preds.items():
        if name in exclude:
            continue
        out = out | F.coalesce(pred, F.lit(False))
    return out
