"""Checkpoint + lineage table — SURVEY.md I4 and the north rule's
"resumable from checkpoint with per-partition lineage + metrics".

The reference journals every import in ``osm.pgosm_flex``
(/root/reference/db/deploy/osm_pgosm_flex.sql:5-19, written
docker/db.py:255-302,666-695) and gets restartability from its batched
LIMIT/COMMIT loop (flex-config/sql/place_polygon_nested.sql:81-150). Here the
same contract is unit-of-work granular: a job is split into named work units
(typically coarse spatial cells); each unit's output is committed to its own
partition directory and then journaled with metrics. A killed job resumes by
anti-joining units against the journal — completed units are never
recomputed.

Storage is plain parquet append (one tiny file per unit — the journal is
driver-written and small); with Iceberg jars present the same API maps to an
Iceberg table with snapshot isolation.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

JOURNAL_SCHEMA = (
    "job_id string, unit string, status string, engine_version string, "
    "metrics string, started_at double, finished_at double, run_id string"
)


@dataclass
class Checkpointer:
    path: str  # journal directory
    job_id: str

    def _journal_dir(self) -> str:
        return os.path.join(self.path, "_journal")

    def read_journal(self, spark: SparkSession) -> DataFrame:
        d = self._journal_dir()
        if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for root, _, fs in os.walk(d) for f in fs
        ):
            return spark.createDataFrame([], schema=JOURNAL_SCHEMA)
        return spark.read.schema(JOURNAL_SCHEMA).parquet(d)

    def completed_units(self, spark: SparkSession) -> set[str]:
        j = self.read_journal(spark)
        rows = (
            j.filter((j["job_id"] == self.job_id) & (j["status"] == "completed"))
            .select("unit")
            .collect()
        )
        return {r["unit"] for r in rows}

    def _append(self, spark: SparkSession, rows: list[tuple]) -> None:
        spark.createDataFrame(rows, schema=JOURNAL_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self._journal_dir())

    def mark_completed(
        self, spark: SparkSession, unit: str, metrics: dict, started_at: float
    ) -> None:
        from pgosm_flex_spark import __version__

        self._append(
            spark,
            [(
                self.job_id, unit, "completed", __version__,
                json.dumps(metrics, sort_keys=True), started_at, time.time(),
                uuid.uuid4().hex,
            )],
        )

    def run_units(
        self,
        spark: SparkSession,
        units: Iterable[str],
        process: Callable[[str], dict],
    ) -> dict[str, dict]:
        """Process every unit not yet journaled as completed.

        ``process(unit)`` must write the unit's output to a location derived
        from the unit name (idempotent overwrite) and return a metrics dict.
        Output commit happens before journaling, so a crash between the two
        re-runs the unit idempotently — at-least-once with idempotent
        writes ⇒ exactly-once results, the same guarantee the reference gets
        from per-batch COMMIT.
        """
        done = self.completed_units(spark)
        results: dict[str, dict] = {}
        for unit in units:
            if unit in done:
                results[unit] = {"skipped": True}
                continue
            t0 = time.time()
            metrics = process(unit)
            self.mark_completed(spark, unit, metrics, t0)
            results[unit] = metrics
        return results


def checkpointed_pip_join(
    spark: SparkSession,
    points: DataFrame,
    polygons: DataFrame,
    out_dir: str,
    job_id: str,
    point_cols: list[str],
    unit_res: int = 4,
    **pip_kwargs,
):
    """The flagship join as a resumable job: points are split by coarse cell
    (unit_res), each unit PIP-joins independently and commits
    ``out_dir/unit=<cell>/``, then journals. Resume skips completed cells.
    """
    from pyspark.sql import functions as F

    from pgosm_flex_spark.index import cells
    from pgosm_flex_spark.operators.pip_join import build_polygon_cover, pip_join

    cp = Checkpointer(path=out_dir, job_id=job_id)
    pts = points.withColumn(
        "__unit", cells.cell_col(F.col("lon"), F.col("lat"), unit_res)
    ).persist()
    units = [str(r["__unit"]) for r in pts.select("__unit").distinct().collect()]
    cover = build_polygon_cover(polygons).persist()
    cover.count()

    def process(unit: str) -> dict:
        sub = pts.filter(F.col("__unit") == int(unit))
        pairs = pip_join(sub, polygons, point_cols=point_cols, cover=cover, **pip_kwargs)
        target = os.path.join(out_dir, f"unit={unit}")
        pairs.write.mode("overwrite").parquet(target)
        n = spark.read.parquet(target).count()
        return {"pairs": n}

    results = cp.run_units(spark, sorted(units), process)
    pts.unpersist()
    return results
