"""SparkSession factory tuned for the dedup workload.

Single place where scale-relevant conf lives: AQE (runtime coalescing +
skew-join splitting), Arrow batching for the pandas-UDF kernels, and
shuffle-partition sizing. Tests and bench call ``get_spark`` with different
parallelism levels — the N-vs-4N scaling evidence required by BASELINE.json.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "spark-dedup",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    parallelism: local[N] cores; default $SPARK_GRAFT_CPUS or 32.
    shuffle_partitions: default = parallelism. Straggler headroom comes
        from AQE instead: ``initialPartitionNum = 3x cores`` lets AQE
        start exchanges over-partitioned and coalesce down when volume
        is small — big inputs get the 3x straggler cut, tiny inputs
        aren't taxed with 96-partition exchanges (round-2 verdict #2).
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(3 * cpus),
        )
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
