"""End-to-end near-duplicate detection + clustering pipeline.

The Spark rendering of the reference lifecycle (SURVEY.md §3.1,
``Run_Sembedding.py`` → ``dedup_pipeline.py``):

  scan → extract → represent (shingles/MinHash/SimHash/winnow)
       → candidates (LSH bands ∪ Hamming blocks ∪ winnow fingerprints)
       → verify (exact Jaccard / Hamming / containment)
       → cluster (union-find) → (doc, cluster_id)

Three independent recall channels feed one edge set:
- MinHash-LSH: near-dup pairs with Jaccard >= candidate threshold,
- SimHash Hamming <= r: near-exact pairs differing in a few tokens,
- winnowed substring fingerprints: containment pairs (truncation /
  superstring) whose symmetric Jaccard may sit below the LSH threshold.

Every stage goes through :class:`StageCommitter` → committed parquet +
per-partition lineage rows + resume (plans/lineage.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import represent
from entity_deduplication_hack_main_spark.operators import cluster as cc
from entity_deduplication_hack_main_spark.operators import hamming as ham
from entity_deduplication_hack_main_spark.operators import lsh, suffix, verify
from entity_deduplication_hack_main_spark.plans.lineage import StageCommitter


@dataclass
class PipelineResult:
    payload: DataFrame       # (id, shingle_set, fp, signature, simhash)
    candidates: DataFrame    # (id1, id2, channel)
    verified: DataFrame      # (id1, id2, jaccard, dup_type, status)
    edges: DataFrame         # (id1, id2) duplicate edges
    assignments: DataFrame   # (id/node, cluster_id)
    committer: StageCommitter
    # maximal verbatim >= span_k-token runs for span CUTTING (Lee et al.
    # 2021); only when config.substring_span_k is set, else None. Spans do
    # NOT feed the edge set — sharing one quote doesn't merge two docs.
    spans: DataFrame | None = None
    # the corpus with duplicated spans spliced out of the ORIGINAL bytes
    # (id, n_tokens, n_cut, aligned, text_cut) — only when
    # config.substring_cut is also set. Consumes the committed `spans`
    # stage above, so the gram pass runs ONCE per pipeline invocation
    # (r03 verdict #8).
    cut_docs: DataFrame | None = None


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    config: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_strategy: str = "xxhash64",
    workdir: str | None = None,
    run_id: str = "run",
    containment_threshold: float = 0.9,
) -> PipelineResult:
    config = config or DedupConfig()
    com = StageCommitter(spark, workdir, run_id)
    nbits = 64 if hash_strategy == "xxhash64" else 60

    def build_payload() -> DataFrame:
        return represent.with_representation(
            docs, config, id_col, text_col, hash_strategy
        )

    payload = com.stage("payload", build_payload)

    def build_candidates() -> DataFrame:
        # bigint band keys on the production path (md5 strings are the
        # oracle rendering) — ~2.5x less banding-shuffle volume
        band_fn = "xxhash64" if hash_strategy == "xxhash64" else "md5"
        lsh_pairs = lsh.candidate_pairs(
            lsh.band_hashes(payload, config, "signature", "id", band_fn),
            config,
        ).withColumn("channel", F.lit("minhash_lsh"))
        sim_pairs = ham.hamming_candidate_pairs(
            payload.select("id", "simhash"), config, nbits
        ).select("id1", "id2", F.lit("simhash").alias("channel"))
        win_pairs = suffix.winnow_pairs_from_payload(
            payload, max_df=config.winnow_max_df
        ).withColumn("channel", F.lit("winnow"))
        return (
            lsh_pairs.unionByName(sim_pairs)
            .unionByName(win_pairs)
            .groupBy("id1", "id2")
            .agg(F.collect_set("channel").alias("channels"))
        )

    candidates = com.stage("candidates", build_candidates)

    def build_verified() -> DataFrame:
        # ONE payload projection joined twice — jaccard, taxonomy, hamming
        # and containment all come from the same two shuffles. (A previous
        # version joined the payload six times = four extra ~600 MB array
        # shuffles at 100k heavy docs; this halved pipeline wall time.)
        # Semi-join reduction first: only candidate-pair members ship their
        # shingle sets. The broadcast hint is load-bearing — see
        # verify.verify_pairs (plan-chosen SMJ here doubles payload
        # shuffles instead of eliminating them).
        ids = (
            candidates.select(F.col("id1").alias("id"))
            .unionByName(candidates.select(F.col("id2").alias("id")))
            .distinct()
        )
        p = payload.select("id", "shingle_set", "fp", "simhash").join(
            F.broadcast(ids), "id", "left_semi"
        )
        a = p.select(
            F.col("id").alias("id1"),
            F.col("shingle_set").alias("s1"),
            F.col("fp").alias("fp1"),
            F.col("simhash").alias("sh1"),
        )
        b = p.select(
            F.col("id").alias("id2"),
            F.col("shingle_set").alias("s2"),
            F.col("fp").alias("fp2"),
            F.col("simhash").alias("sh2"),
        )
        j = candidates.select("id1", "id2").join(a, "id1").join(b, "id2")
        inter = F.size(F.array_intersect("s1", "s2"))
        union = F.size(F.array_union("s1", "s2"))
        smaller = F.least(F.size("s1"), F.size("s2"))
        jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        return j.select(
            "id1",
            "id2",
            F.round(jac, 9).alias("jaccard"),
            F.when(F.col("fp1") == F.col("fp2"), "exact")
            .when(jac >= config.jaccard_near_exact, "near_exact")
            .when(jac >= config.jaccard_similar, "similar")
            .otherwise("conflict")
            .alias("dup_type"),
            F.when(jac >= config.jaccard_candidate, "pass")
            .otherwise("fail")
            .alias("status"),
            F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2"))).alias("hamming"),
            F.round(
                F.when(smaller > 0, inter / smaller).otherwise(0.0), 9
            ).alias("containment"),
        )

    verified = com.stage("verified", build_verified)

    def build_edges() -> DataFrame:
        return (
            verified.where(
                (F.col("status") == "pass")
                | (F.col("hamming") <= config.hamming_radius)
                | (F.col("containment") >= containment_threshold)
            )
            .select("id1", "id2")
            .distinct()
        )

    edges = com.stage("edges", build_edges)

    def build_assignments() -> DataFrame:
        vertices = payload.select("id")
        return cc.connected_components(edges, vertices, config).select(
            F.col("node").alias("id"), "cluster_id"
        )

    assignments = com.stage("assignments", build_assignments)

    spans = None
    cut_docs = None
    if config.substring_span_k is not None:
        spans = com.stage(
            "substring_spans",
            lambda: suffix.substring_spans_exact(
                docs,
                config,
                span_k=config.substring_span_k,
                id_col=id_col,
                text_col=text_col,
                hash_strategy=hash_strategy,
            ),
        )
        if config.substring_cut:
            # consumes the committed spans stage — the gram pass above is
            # NOT recomputed (committer caches/commits its output)
            cut_docs = com.stage(
                "substring_cut",
                lambda: suffix.cut_spans_raw(docs, spans, id_col, text_col),
            )

    return PipelineResult(
        payload, candidates, verified, edges, assignments, com, spans,
        cut_docs,
    )
