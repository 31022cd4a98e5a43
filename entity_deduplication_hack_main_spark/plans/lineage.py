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
    "run_id string, stage string, file string, input_rows bigint, "
    "rows bigint, bytes bigint, wall_ms bigint, resumed boolean, "
    "committed_at timestamp"
)
# Existence/listing checks go through the Hadoop FileSystem (plans/fsutil)
# so resume works on s3a://-style workdirs, not just local paths
# (metadata-only either way).


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
        self._prev_rows: int | None = None  # previous stage's observed rows
        #                                     = this stage's input count

    def _path(self, stage: str) -> str:
        assert self.workdir is not None
        return os.path.join(self.workdir, stage)

    def _committed(self, stage: str) -> bool:
        from entity_deduplication_hack_main_spark.plans import fsutil

        return fsutil.exists(
            self.spark, os.path.join(self._path(stage), "_SUCCESS")
        )

    def stage(self, name: str, build) -> DataFrame:
        """Run (or resume) a stage. ``build`` is a zero-arg fn → DataFrame.

        Without a workdir the stage output is cached instead of committed —
        downstream stages (and the iterative union-find) must not recompute
        the whole upstream lineage per action.

        Committed path: the row count comes from the ``Observation`` API —
        collected DURING the write job, zero extra pass over the data (the
        previous per-file groupBy re-read every stage output — an extra
        full scan per stage, prohibitive at 100 TB); per-file bytes come
        from filesystem metadata only.
        """
        if self.workdir is None:
            return build().cache()
        from pyspark.sql import Observation

        t0 = time.monotonic()
        resumed = self._committed(name)
        rows = None
        if not resumed:
            obs = Observation(f"lineage_{name}")
            df = build().observe(obs, F.count(F.lit(1)).alias("rows"))
            df.write.mode("overwrite").parquet(self._path(name))
            rows = obs.get["rows"]
        out = self.spark.read.parquet(self._path(name))
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._write_lineage(name, rows, wall_ms, resumed)
        self._prev_rows = int(rows) if rows is not None else None
        return out

    def _list_files(self, stage: str) -> list[tuple[str, int]]:
        from entity_deduplication_hack_main_spark.plans import fsutil

        return fsutil.list_files(self.spark, self._path(stage), ".parquet")

    def _write_lineage(
        self, stage: str, rows: int | None, wall_ms: int, resumed: bool
    ) -> None:
        files = self._list_files(stage)
        recs = [
            (self.run_id, stage, f, None, None, int(sz), wall_ms, resumed)
            for f, sz in files
        ]
        # `_total` row carries observed input/output row counts (None on
        # resume) so empty stages still appear in lineage
        recs.append(
            (
                self.run_id,
                stage,
                "_total",
                self._prev_rows,
                int(rows) if rows is not None else None,
                sum(sz for _, sz in files),
                wall_ms,
                resumed,
            )
        )
        df = self.spark.createDataFrame(
            recs,
            "run_id string, stage string, file string, input_rows bigint, "
            "rows bigint, bytes bigint, wall_ms bigint, resumed boolean",
        ).withColumn("committed_at", F.current_timestamp())
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.workdir, "_lineage")
        )
        self.events.append(
            {"stage": stage, "rows": rows, "wall_ms": wall_ms, "resumed": resumed}
        )

    def lineage(self) -> DataFrame | None:
        from entity_deduplication_hack_main_spark.plans import fsutil

        if self.workdir is None:
            return None
        path = os.path.join(self.workdir, "_lineage")
        if not fsutil.exists(self.spark, path):
            return None
        return self.spark.read.parquet(path)
