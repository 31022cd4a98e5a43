"""LSH banding + candidate-pair generation with hot-bucket salting.

Reference parity: replaces the blocked cross join (J1,
``dedup_pipeline.py:31-48``) — the reference compares all pairs within an
entity-type block; we compare all pairs within an LSH bucket
``(band_id, band_hash)``. Pair keys are order-normalized with
least/greatest exactly as the reference sorts pair tuples (J7,
``EvaluateVariations.ipynb cell 2``).

Scale design:
- banding is pure JVM (md5 over signature slices → codegen; one
  ``posexplode`` = bands× row inflation, no Python);
- the candidate self-join shuffles on (band_id, band_hash); AQE skew-join
  handles moderate skew, and buckets larger than ``config.max_bucket_size``
  (boilerplate pages sharing a band) are *salted*: members are chunked by a
  deterministic hash and pairs are generated per chunk-pair key
  (blocked-cartesian), bounding any single task at ~salt_chunk² comparisons
  while preserving the exact pair set. Deterministic → resume-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig


def candidate_probability(jaccard: float, config: DedupConfig) -> float:
    """The LSH S-curve: P(pair shares >= 1 band | Jaccard) =
    1 - (1 - j^r)^b. This is the analytic link between the band config and
    the north_rule's recall >= 0.99 gate (SURVEY §7 hard parts): the
    default b=32 x r=4 gives P(candidate) = 0.9998 at the verify threshold
    j = 0.7 — checked by test_s_curve_meets_recall_gate."""
    return 1.0 - (1.0 - jaccard**config.rows_per_band) ** config.bands


def plan_bands(
    num_perms: int,
    threshold: float,
    min_p_at_threshold: float = 0.99,
    fn_weight: float = 10.0,
    fp_weight: float = 1.0,
    grid: int = 1000,
) -> list[dict]:
    """Choose (bands, rows_per_band) for a *num_perms*-perm MinHash at a
    target Jaccard *threshold*. Enumerates every ``b*r == num_perms``
    factorization; plans meeting the recall gate — P(candidate) ≥
    *min_p_at_threshold* AT the threshold, the north rule's dup-pair
    recall requirement stated analytically — rank first, and within the
    gate the weighted S-curve error breaks ties:

        fn_weight * ∫_t^1 (1 − P(s)) ds   (true pairs never bucketed)
      + fp_weight * ∫_0^t P(s) ds         (spurious candidates)

    with P(s) = 1 − (1 − s^r)^b integrated numerically (midpoint rule,
    *grid* points). The gate matters: the unconstrained area minimum at
    t=0.7/128 perms is (16 bands × 8 rows) with P(t) = 0.61 — a plan
    that silently drops 4 of 10 threshold-grade duplicate pairs; the
    gated pick is (32 × 4), P(t) = 0.9998, the shipped DedupConfig. FN
    is weighted above FP in the tie-break because a missed duplicate is
    unrecoverable while a false candidate costs one verify comparison
    (Leskovec/Rajaraman/Ullman, MMDS ch. 3). Pure driver arithmetic —
    never touches data; every plan is returned with its FN/FP areas so
    the trade-off is auditable; ``[0]`` is the pick."""
    plans = []
    for r in range(1, num_perms + 1):
        if num_perms % r:
            continue
        b = num_perms // r
        fn_area = fp_area = 0.0
        for i in range(grid):
            s = (i + 0.5) / grid
            p = 1.0 - (1.0 - s**r) ** b
            if s >= threshold:
                fn_area += (1.0 - p) / grid
            else:
                fp_area += p / grid
        p_t = 1.0 - (1.0 - threshold**r) ** b
        plans.append(
            {
                "bands": b,
                "rows_per_band": r,
                "fn_area": round(fn_area, 6),
                "fp_area": round(fp_area, 6),
                "error": round(fn_weight * fn_area + fp_weight * fp_area, 6),
                "p_at_threshold": round(p_t, 6),
                "meets_recall_gate": p_t >= min_p_at_threshold,
            }
        )
    plans.sort(
        key=lambda p: (not p["meets_recall_gate"], p["error"], p["rows_per_band"])
    )
    return plans


def band_hashes(
    df: DataFrame,
    config: DedupConfig,
    sig_col: str = "signature",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, band_id, band_hash): one row per band per doc. Pure JVM.

    hash_fn 'md5' emits 32-char hex strings (DuckDB-reproducible — the
    oracle queries use this); 'xxhash64' emits BIGINT keys — the
    production pipeline's choice: the banding shuffle carries bands× rows
    per doc, and an 8-byte key vs a 32-byte string cuts that stage's
    shuffle volume ~2.5x (band buckets are identical either way: both
    hashes are injective enough on r-row signature slices)."""
    r = config.rows_per_band
    sig = F.col(sig_col)
    if hash_fn == "xxhash64":
        def one_band(band):
            return F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(sig, band * F.lit(r) + F.lit(1), r),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            )
    else:
        def one_band(band):
            return F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sig, band * F.lit(r) + F.lit(1), r),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            )
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(config.bands - 1)), one_band
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bands).alias("band_id", "band_hash"),
    )


def _pairs_norm(df: DataFrame, left: str, right: str) -> DataFrame:
    """Order-insensitive distinct pair keys (J7 least/greatest)."""
    return df.select(
        F.least(F.col(left), F.col(right)).alias("id1"),
        F.greatest(F.col(left), F.col(right)).alias("id2"),
    ).where(F.col("id1") != F.col("id2"))


def candidate_pairs(
    bands: DataFrame, config: DedupConfig, materialize: bool = False
) -> DataFrame:
    """Distinct (id1, id2) pairs sharing >= 1 LSH bucket, salted for skew.

    bands: output of :func:`band_hashes`.

    Bucket sizes come from a partial-aggregating ``groupBy(key).count()``
    joined back onto the band rows (r05 verdict #1; guide §2.3 "aggregate
    before you shuffle"). The previous count-window over the bucket key
    shuffled EVERY member of a hot bucket to one reducer task before
    counting — the same single-task hot-key materialization the gram df
    cap removed from the span pass (suffix.py:323). The groupBy collapses
    a boilerplate bucket to one long per map partition; the join back
    merely streams the hot bucket's rows through a co-partitioned join
    (same exchange, reused) that AQE skew-join can split. Singleton
    buckets are dropped by joining against the ``bucket_n >= 2`` count
    table, exactly as the window filter did.

    materialize: ``localCheckpoint`` the sized member table before pair
    generation. The cold/hot/left/right branches below re-reference it
    FOUR times — Catalyst duplicates the whole upstream subtree per
    reference (the r05 verify_candidate_pairs plan carried 44 copies of
    the representation kernel), so the banding input would be recomputed
    per branch. Pinning computes it once per invocation; each invocation
    checkpoints afresh, so nothing persists across bench legs. Off by
    default: streaming micro-batches are smaller than the checkpoint
    overhead.
    """
    key = ["band_id", "band_hash"]
    if materialize:
        # pin the band table: the size count, the join-back and the four
        # cold/hot pair branches all re-reference it — unpinned, each
        # re-runs whatever produced the bands (the representation kernel /
        # hyperplane matmul). Pinning MEMBERS as well was measured SLOWER
        # (extra eager job + barrier outweighs recomputing the cheap
        # narrow join from pinned bands; 6.7 vs 5.8 s at sf1.0 on the
        # hyperplane channel).
        bands = bands.localCheckpoint()
    sizes = (
        bands.groupBy(*key)
        .agg(F.count("*").alias("bucket_n"))
        .where(F.col("bucket_n") >= 2)  # singleton buckets produce no pairs
    )
    members = bands.join(sizes, key)

    cold = members.where(F.col("bucket_n") <= config.max_bucket_size)
    hot = members.where(F.col("bucket_n") > config.max_bucket_size)

    a, b = cold.alias("a"), cold.alias("b")
    cold_pairs = _pairs_norm(
        a.join(b, key).where(F.col("a.id") < F.col("b.id")), "a.id", "b.id"
    )

    # Salted blocked-cartesian for hot buckets: member → chunk c; pair-bucket
    # (ci, cj), ci <= cj; member plays the ci role for cj in [c, n) and the
    # cj role for ci in [0, c]. Exact same pair set, bounded task size.
    nch = F.ceil(F.col("bucket_n") / F.lit(config.salt_chunk)).cast("int")
    hot_c = hot.withColumn("nch", nch).withColumn(
        "chunk", F.pmod(F.xxhash64("id"), F.col("nch")).cast("int")
    )
    left = hot_c.select(
        *key, "id", F.col("chunk").alias("ci"),
        F.explode(F.sequence(F.col("chunk"), F.col("nch") - 1)).alias("cj"),
    )
    right = hot_c.select(
        *key, F.col("id").alias("rid"), F.col("chunk").alias("cj"),
        F.explode(F.sequence(F.lit(0), F.col("chunk"))).alias("ci"),
    )
    hot_pairs = _pairs_norm(
        left.join(right, key + ["ci", "cj"]), "id", "rid"
    )

    return cold_pairs.unionByName(hot_pairs).distinct()


def documents_to_candidates(
    docs: DataFrame,
    config: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    """text → representation kernel → bands → distinct candidate pairs."""
    from entity_deduplication_hack_main_spark.functions import represent

    sig = represent.with_representation(
        docs, config, id_col, text_col, hash_strategy
    ).select("id", "signature")
    return candidate_pairs(band_hashes(sig, config, id_col="id"), config)


# --- DuckDB oracle (unsalted — salting is a physical rewrite, the logical
# pair set is identical) ---------------------------------------------------


def sql_bands_from_sig(config: DedupConfig) -> str:
    """CTE `_bands` (id, band_id, band_hash) from an existing `_sig` CTE."""
    r = config.rows_per_band
    return f"""
_bands AS (
  SELECT id, b.band_id::INT AS band_id,
         md5(array_to_string(sig[b.band_id * {r} + 1 : b.band_id * {r} + {r}], ',')) AS band_hash
  FROM _sig CROSS JOIN (FROM range(0, {config.bands}) t(band_id)) b
)"""


def sql_band_hashes(
    config: DedupConfig,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SELECT of (id, band_id, band_hash) matching :func:`band_hashes`
    over md5-strategy signatures from the representation kernel."""
    from entity_deduplication_hack_main_spark.functions.represent import (
        sql_repr_ctes,
        sql_signature_cte,
    )

    return f"""
WITH {sql_repr_ctes(config, doc_table, id_col, text_col)},
{sql_signature_cte(config)},
{sql_bands_from_sig(config)}
SELECT id, band_id, band_hash FROM _bands
"""


def sql_candidate_pairs(
    config: DedupConfig,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    bands = sql_band_hashes(config, doc_table, id_col, text_col)
    return f"""
WITH _b AS ({bands})
SELECT DISTINCT least(a.id, b.id) AS id1, greatest(a.id, b.id) AS id2
FROM _b a JOIN _b b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.id < b.id
"""
