"""Table-format abstraction: parquet paths or Iceberg catalog tables.

The north_star names Iceberg tables of web pages; the reference has no
table runtime at all (its sink is ``json.dump``, dedup_pipeline.py:81-83).
This module is the slot-in point: every writer/reader takes a *target*
(path or ``catalog.db.table`` identifier) and a *format*, resolved from
``$SPARK_DEDUP_TABLE_FORMAT`` (default ``parquet``).

- ``parquet`` — committed path writes (the ``_SUCCESS`` marker is the
  commit record); partition transform rendered as a derived column
  (``warc_day = to_date(warc_ts)``).
- ``iceberg`` — the DataFrameWriterV2 API (``df.writeTo(t).using(
  "iceberg")``) with a real ``days(warc_ts)`` partition transform and
  snapshot-atomic commits. Needs the Iceberg Spark runtime jar plus a
  catalog on the session (:func:`iceberg_spark_conf`); this sandbox ships
  neither, so the path is exercised by tests only up to its clearly-typed
  failure (:class:`IcebergUnavailableError`) — the plumbing (conf keys,
  writer calls, partition transform) follows the public Iceberg docs.

Why V2 (``writeTo``) and not ``df.write.format("iceberg")``: V2 carries
the partition TRANSFORM (``days(col)``) into the table metadata, so
readers filtering ``warc_ts`` get Iceberg partition pruning without a
derived column — the V1 path would bake a materialized day column into
the schema instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENV_FORMAT = "SPARK_DEDUP_TABLE_FORMAT"


class IcebergUnavailableError(RuntimeError):
    """Iceberg format requested but the session can't serve it (no runtime
    jar / no catalog configured)."""


def table_format(fmt: str | None = None) -> str:
    resolved = fmt or os.environ.get(ENV_FORMAT, "parquet")
    if resolved not in ("parquet", "iceberg"):
        raise ValueError(f"unknown table format {resolved!r}")
    return resolved


def iceberg_spark_conf(
    catalog: str = "dedup", warehouse: str = "/tmp/dedup-warehouse"
) -> dict[str, str]:
    """Session conf enabling an Iceberg *hadoop* catalog (public Iceberg
    quickstart config). Pass to ``get_spark(extra_conf=...)``; the runtime
    jar itself must be on the classpath (``spark.jars.packages
    org.apache.iceberg:iceberg-spark-runtime-...`` on a real cluster)."""
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def _iceberg_guard(exc: Exception, target: str) -> IcebergUnavailableError:
    return IcebergUnavailableError(
        f"Iceberg write to {target!r} failed — the session needs the "
        "iceberg-spark-runtime jar on the classpath and a catalog "
        "configured (see iceberg_spark_conf); set "
        f"{ENV_FORMAT}=parquet for the path-based fallback. Cause: {exc}"
    )


def write_corpus(
    docs: DataFrame,
    target: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    ts_col: str = "warc_ts",
) -> None:
    """Corpus sink partitioned by day(ts_col) — Iceberg ``days()``
    transform, or a derived parquet partition column."""
    fmt = table_format(fmt)
    if fmt == "iceberg":
        writer = docs.writeTo(target).using("iceberg").partitionedBy(
            F.days(F.col(ts_col))
        )
        try:
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
        except Exception as exc:  # Py4J surfaces jar/catalog absence here
            raise _iceberg_guard(exc, target) from exc
        return
    (
        docs.withColumn("warc_day", F.to_date(ts_col))
        .write.mode(mode)
        .partitionBy("warc_day")
        .parquet(target)
    )


def write_table(
    df: DataFrame, target: str, fmt: str | None = None, mode: str = "overwrite"
) -> None:
    """Unpartitioned table sink (cluster assignments, match reports)."""
    fmt = table_format(fmt)
    if fmt == "iceberg":
        writer = df.writeTo(target).using("iceberg")
        try:
            if mode == "append":
                writer.append()
            else:
                writer.createOrReplace()
        except Exception as exc:
            raise _iceberg_guard(exc, target) from exc
        return
    df.write.mode(mode).parquet(target)


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    """Raw table read. NOTE (format asymmetry): a corpus written by
    :func:`write_corpus` in parquet mode carries the derived ``warc_day``
    partition column in its schema, while the iceberg path keeps the
    original schema (the ``days()`` transform lives in table metadata).
    Use :func:`read_corpus` for a format-independent corpus schema."""
    fmt = table_format(fmt)
    if fmt == "iceberg":
        try:
            return spark.read.table(target)
        except Exception as exc:
            raise _iceberg_guard(exc, target) from exc
    return spark.read.parquet(target)


def read_corpus(
    spark: SparkSession,
    target: str,
    fmt: str | None = None,
    day_range: "tuple[str, str] | None" = None,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Corpus read with the SAME logical schema in both formats (r03
    advice: parquet bakes the derived ``warc_day`` into the data while
    iceberg keeps it in metadata — downstream readers saw format-dependent
    schemas for one logical table).

    day_range: optional ('YYYY-MM-DD', 'YYYY-MM-DD') inclusive crawl-day
    window. In parquet mode it filters the ``warc_day`` PARTITION column
    (directory pruning) before the column is dropped; in iceberg mode the
    equivalent ``ts_col`` date filter prunes via the table's ``days()``
    transform metadata. Either way the returned schema is the one
    :func:`write_corpus` was handed."""
    fmt = table_format(fmt)
    df = read_table(spark, target, fmt)
    if fmt == "iceberg":
        if day_range is not None:
            df = df.where(
                F.to_date(ts_col).between(
                    F.lit(day_range[0]).cast("date"),
                    F.lit(day_range[1]).cast("date"),
                )
            )
        return df
    if day_range is not None:
        df = df.where(
            F.col("warc_day").between(
                F.lit(day_range[0]).cast("date"),
                F.lit(day_range[1]).cast("date"),
            )
        )
    return df.drop("warc_day")
