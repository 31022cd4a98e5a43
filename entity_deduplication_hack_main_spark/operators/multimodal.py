"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines at 100 TB carry image/audio/video as binary
columns. The Spark-side contract here is real and tested — schemas,
Arrow-batched UDF signatures, partition-size control — while the actual
decoders are stubbed (no PIL/ffmpeg in this container): a clearly marked
``NotImplementedError`` path plus a deterministic fake used by tests.

Pattern: ``mapInPandas`` over (id, payload binary, meta struct) with
bounded batch sizes (binary rows are big — cap via
``spark.sql.execution.arrow.maxRecordsPerBatch`` and repartition by size).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id bigint, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "id bigint, feature_digest string, n_bytes bigint, ok boolean"


def decode_image(payload: bytes) -> object:
    """Real decoder integration point — requires PIL, absent here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not in this container); "
        "tests use extract_features(fake_decode=True)"
    )


def _fake_feature(payload: bytes) -> str:
    # deterministic stand-in for a decoded-content feature vector digest
    return hashlib.md5(payload or b"").hexdigest()


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    fake_decode: bool = True,
) -> DataFrame:
    """(id, feature_digest, n_bytes, ok): Arrow-batched feature extraction.

    fake_decode=True (tests/sandbox): deterministic md5 'feature'.
    fake_decode=False: calls :func:`decode_image` → NotImplementedError
    until a real decoder is installed; the Spark plumbing is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            if fake_decode:
                feats = payloads.map(_fake_feature)
                ok = payloads.notna()
            else:  # pragma: no cover - requires decoder libs
                feats = payloads.map(lambda b: decode_image(b))
                ok = payloads.notna()
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "feature_digest": feats,
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "ok": ok,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def media_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-JVM metadata aggregation over binary columns (no decode)."""
    return df.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.sum(F.length(payload_col)).alias("total_bytes"),
        F.avg(F.length(payload_col)).alias("avg_bytes"),
    )


def synthesize_media(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = spark.range(n).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))),
            "utf-8",
        ).alias("payload"),
        (F.col("id") % 640).cast("int").alias("width"),
        (F.col("id") % 480).cast("int").alias("height"),
        (F.col("id") * 33 % 10000).cast("int").alias("duration_ms"),
    )
    return rows
