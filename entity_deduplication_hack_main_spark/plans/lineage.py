"""Stage commit protocol + per-partition lineage rows (resumability).

North_rule requirement: "every stage writes per-partition lineage rows
(input count, signature bytes, pair count, wall time) so any run resumes
from the last committed checkpoint."

Contract (Iceberg-style atomic commits, parquet fallback — the sandbox has
no Iceberg runtime jar; the interface is the commit/resume semantics, and an
Iceberg writer can be slotted in behind ``StageCommitter`` unchanged):

- each stage writes its output DataFrame to ``<workdir>/<stage>/`` via
  Spark's committed parquet write (the ``_SUCCESS`` marker IS the atomic
  commit record);
- after commit, per-output-file row counts (the written partition layout)
  plus wall time land in ``<workdir>/_lineage/`` as append-only parquet;
- on re-run, a stage whose ``_SUCCESS`` exists is *skipped* and its output
  read back — resume from last committed checkpoint for free.

The reference's analog is the append-only ``runtimes.txt`` log
(``Run_TransE.py:71-72``) — ours is queryable and per-partition.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, file string, rows bigint, "
    "wall_ms bigint, committed_at timestamp, resumed boolean"
)


class StageCommitter:
    """Commit/resume wrapper around stage builds.

    With ``workdir=None`` every stage runs lazily in-memory (no commits) —
    used by unit tests and the SQL-oracle queries.
    """

    def __init__(
        self, spark: SparkSession, workdir: str | None = None, run_id: str = "run"
    ) -> None:
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id
        self.events: list[dict] = []

    def _path(self, stage: str) -> str:
        assert self.workdir is not None
        return os.path.join(self.workdir, stage)

    def _committed(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def stage(self, name: str, build) -> DataFrame:
        """Run (or resume) a stage. ``build`` is a zero-arg fn → DataFrame.

        Without a workdir the stage output is cached instead of committed —
        downstream stages (and the iterative union-find) must not recompute
        the whole upstream lineage per action.
        """
        if self.workdir is None:
            return build().cache()
        t0 = time.monotonic()
        resumed = self._committed(name)
        if not resumed:
            build().write.mode("overwrite").parquet(self._path(name))
        out = self.spark.read.parquet(self._path(name))
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._write_lineage(name, out, wall_ms, resumed)
        return out

    def _write_lineage(
        self, stage: str, out: DataFrame, wall_ms: int, resumed: bool
    ) -> None:
        # per-written-file rows + one `_total` row (so empty stages still
        # appear in lineage — resume bookkeeping must see every stage)
        total = out.agg(F.count("*").alias("rows")).select(
            F.lit("_total").alias("file"), "rows"
        )
        per_file = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("rows"))
            .unionByName(total)
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "file",
                "rows",
                F.lit(wall_ms).alias("wall_ms"),
                F.current_timestamp().alias("committed_at"),
                F.lit(resumed).alias("resumed"),
            )
        )
        per_file.write.mode("append").parquet(
            os.path.join(self.workdir, "_lineage")
        )
        self.events.append(
            {"stage": stage, "wall_ms": wall_ms, "resumed": resumed}
        )

    def lineage(self) -> DataFrame | None:
        if self.workdir is None:
            return None
        path = os.path.join(self.workdir, "_lineage")
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)
