"""Similarity search over embedding columns (array<float>).

Reference parity: E6/E7/J2 — the reference L2-normalizes embeddings, takes
a dense cosine matrix and top-k per probe (``dedup_pipeline.py:45-48``,
``similarity_utils.py:9-33``). At scale the dense matrix is never
materialized:

- ``brute_force_knn``: probes (small side) broadcast against the corpus;
  cosine in pure JVM expressions (zip_with/aggregate — codegen), rank
  window for top-k. Correct baseline, O(P×N).
- ``lsh_bucketed_knn``: random-hyperplane LSH (SimHash for vectors) —
  sign-pattern bucket key over ``n_planes`` seeded hyperplanes, candidates
  restricted to probes' buckets (multi-probe via bit flips), then exact
  cosine + top-k. The scale path: O(P×N/2^b) expected.
- ``embedding_near_dup_pairs``: all-pairs cosine >= threshold within a
  blocking key — the embedding-cosine near-duplicate channel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import similarity as simfn
from entity_deduplication_hack_main_spark.operators.topk import top_k_per_group


def brute_force_knn(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int = 6,
) -> DataFrame:
    """(probe_id, neighbor_id, cosine, rank): exact top-k cosine neighbors.

    probes must be small (broadcast side). Self-matches excluded.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(p)
        .crossJoin(c)
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(simfn.cosine(F.col("pv"), F.col("cv")), score_round).alias(
                "cosine"
            ),
        )
    )
    return top_k_per_group(
        scored,
        ["probe_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
    ).select("probe_id", "neighbor_id", "cosine", "rank")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng([seed, 4242])
    return rng.standard_normal((n_planes, dim)).tolist()


def with_hyperplane_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 69,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane sign bucket (int key in [0, 2^n_planes))."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        d = simfn.dot(F.col(vec_col), pl)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def lsh_bucketed_knn(
    probes: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 69,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket with the
    probe (multi-probe: also buckets within `multiprobe_bits` bit flips),
    then exact cosine + rank. Recall < 1 by design — the scale path."""
    cb = with_hyperplane_bucket(corpus, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "bucket",
    )
    pb = with_hyperplane_bucket(probes, dim, n_planes, seed, vec_col)
    # multi-probe bucket expansion
    flips = [0] + [1 << i for i in range(n_planes)] if multiprobe_bits else [0]
    probe_buckets = pb.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pv"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(fl)) for fl in flips])
        ).alias("bucket"),
    ).dropDuplicates(["probe_id", "bucket"])
    scored = (
        F.broadcast(probe_buckets)
        .join(cb, "bucket")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(simfn.cosine(F.col("pv"), F.col("cv")), 6).alias("cosine"),
        )
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    return top_k_per_group(
        scored,
        ["probe_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
    ).select("probe_id", "neighbor_id", "cosine", "rank")


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id1, id2, cosine) with cosine >= threshold; optional blocking key
    bounds the pair space (J1 semantics: block then compare)."""
    a = df.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    b = df.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    j = a.join(b, on="_blk") if block_col else a.crossJoin(b)
    return (
        j.where(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2",
            F.round(simfn.cosine(F.col("v1"), F.col("v2")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
