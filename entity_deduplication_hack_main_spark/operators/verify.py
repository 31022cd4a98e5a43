"""Candidate verification + duplicate taxonomy classification.

Reference parity:
- J3 verification join (``similarity_utils.py:58-104`` Levenshtein_filter):
  candidates are re-checked with an *exact* expensive measure — for webtext
  that is exact Jaccard over the full shingle sets (not the MinHash
  estimate), computed JVM-side with array_intersect/array_union.
- C1 exact detection (``similarity_utils.py:87-92``): byte-equal normalized
  text (md5 fingerprint equality) → 'exact'.
- C2 taxonomy (``output_utils.py:60-73``): exact / near-exact / similar /
  conflict by threshold bands.
- C3 pass/fail status (``similarity_utils.py:94-103``).

Scale design: the verification join fetches per-doc payloads (shingle set +
fingerprint) for *matched ids only* — the same semi-join reduction the
reference hand-codes at ``dedup_pipeline.py:56-60``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import textstats


def doc_payload(
    docs: DataFrame,
    config: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    """(id, shingle_set, fp, …) — per-doc verification payload via the
    representation kernel (functions/represent.py) so shingle identity is
    consistent with candidate generation."""
    from entity_deduplication_hack_main_spark.functions import represent

    return represent.with_representation(
        docs, config, id_col, text_col, hash_strategy
    ).select("id", "shingle_set", "fp")


def verify_pairs(
    pairs: DataFrame,
    payload: DataFrame,
    config: DedupConfig,
    semi_reduce: bool = True,
) -> DataFrame:
    """(id1, id2, jaccard, dup_type, status) for candidate pairs.

    jaccard = |S1 ∩ S2| / |S1 ∪ S2| on exact shingle sets.
    dup_type: exact | near_exact | similar | conflict  (C2)
    status:   pass iff jaccard >= config.jaccard_candidate (C3)

    semi_reduce: BROADCAST-semi-filter the payload to candidate-pair
    members before the heavy joins, so only matched ids ship their shingle
    sets through the shuffle (the reference's matched-ids-only payload
    fetch, dedup_pipeline.py:56-60). The hint is explicit because the
    filter subtree appears in BOTH join branches — left to AQE it can
    become two extra full-payload sort-merge shuffles (measured 27s → 87s
    at 100k docs). The broadcast is bounded by the distinct candidate id
    count; pass False for pair-heavy workloads where that outgrows
    executor memory."""
    if semi_reduce:
        ids = (
            pairs.select(F.col("id1").alias("id"))
            .unionByName(pairs.select(F.col("id2").alias("id")))
            .distinct()
        )
        payload = payload.join(F.broadcast(ids), "id", "left_semi")
    a = payload.select(
        F.col("id").alias("id1"),
        F.col("shingle_set").alias("s1"),
        F.col("fp").alias("fp1"),
    )
    b = payload.select(
        F.col("id").alias("id2"),
        F.col("shingle_set").alias("s2"),
        F.col("fp").alias("fp2"),
    )
    j = pairs.join(a, "id1").join(b, "id2")
    inter = F.size(F.array_intersect("s1", "s2"))
    union = F.size(F.array_union("s1", "s2"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    out = j.select(
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
    )
    return out


def duplicate_edges(verified: DataFrame) -> DataFrame:
    """Pairs that count as duplicate edges for clustering: status == pass."""
    return verified.where(F.col("status") == "pass").select("id1", "id2")


def verify_pairs_full(
    pairs: DataFrame,
    payload: DataFrame,
    config: DedupConfig,
) -> DataFrame:
    """(id1, id2, jaccard, dup_type, status, hamming, containment): the
    full measure set for the three-channel edge rule — exact Jaccard +
    taxonomy + SimHash Hamming distance + containment, all from ONE
    payload projection joined twice (a previous pipeline version joined
    the payload six times = four extra ~600 MB array shuffles at 100k
    heavy docs; this halved pipeline wall time).

    payload: (id, shingle_set, fp, simhash). Semi-join reduction first:
    only candidate-pair members ship their shingle sets. The broadcast
    hint is load-bearing — see :func:`verify_pairs` (plan-chosen SMJ here
    doubles payload shuffles instead of eliminating them). Shared by the
    batch pipeline and the streaming in-batch channel so both apply
    IDENTICAL semantics (r03 verdict #3)."""
    ids = (
        pairs.select(F.col("id1").alias("id"))
        .unionByName(pairs.select(F.col("id2").alias("id")))
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
    j = pairs.select("id1", "id2").join(a, "id1").join(b, "id2")
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


def duplicate_edges_full(
    verified: DataFrame,
    config: DedupConfig,
    containment_threshold: float = 0.9,
) -> DataFrame:
    """The three-channel edge rule over :func:`verify_pairs_full` output:
    Jaccard pass OR Hamming <= radius OR containment >= threshold."""
    return (
        verified.where(
            (F.col("status") == "pass")
            | (F.col("hamming") <= config.hamming_radius)
            | (F.col("containment") >= containment_threshold)
        )
        .select("id1", "id2")
        .distinct()
    )


# --- DuckDB oracle -------------------------------------------------------


def sql_verify_pairs(
    config: DedupConfig,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SELECT matching candidate generation + verification end-to-end
    (md5 strategy)."""
    from entity_deduplication_hack_main_spark.functions.represent import (
        sql_repr_ctes,
        sql_signature_cte,
    )
    from entity_deduplication_hack_main_spark.operators.lsh import (
        sql_bands_from_sig,
    )

    fp = textstats.sql_fingerprint(text_col)
    return f"""
WITH {sql_repr_ctes(config, doc_table, id_col, text_col)},
{sql_signature_cte(config)},
{sql_bands_from_sig(config)},
_cand AS (
  SELECT DISTINCT least(a.id, b.id) AS id1, greatest(a.id, b.id) AS id2
  FROM _bands a JOIN _bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id
),
_payload AS (
  SELECT _ss.id AS id, _ss.ss AS ss, d.fp AS fp
  FROM _ss JOIN (SELECT {id_col} AS id, {fp} AS fp FROM {doc_table}) d
    ON _ss.id = d.id
),
_j AS (
  SELECT c.id1, c.id2,
         len(list_intersect(a.ss, b.ss)) AS i_n,
         len(list_distinct(list_concat(a.ss, b.ss))) AS u_n,
         a.fp AS fp1, b.fp AS fp2
  FROM _cand c
  JOIN _payload a ON c.id1 = a.id
  JOIN _payload b ON c.id2 = b.id
)
SELECT id1, id2,
       round(CASE WHEN u_n > 0 THEN i_n::DOUBLE / u_n ELSE 0.0 END, 9) AS jaccard,
       CASE WHEN fp1 = fp2 THEN 'exact'
            WHEN i_n::DOUBLE / u_n >= {config.jaccard_near_exact} THEN 'near_exact'
            WHEN i_n::DOUBLE / u_n >= {config.jaccard_similar} THEN 'similar'
            ELSE 'conflict' END AS dup_type,
       CASE WHEN i_n::DOUBLE / u_n >= {config.jaccard_candidate} THEN 'pass'
            ELSE 'fail' END AS status
FROM _j
"""
