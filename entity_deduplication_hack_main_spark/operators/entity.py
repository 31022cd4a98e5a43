"""Entity-record verification — the reference's literal-comparison
semantics as JVM expressions over flat record tables.

Reference parity (modular_methods/similarity_utils.py:58-104
``Levenshtein_filter`` + output_utils.py:60-73):
- J3: for each candidate pair, compare the fields present (non-empty) on
  BOTH sides; per-field string similarity (lowercased), acronym boost to
  0.95 (P7), average over common fields;
- P8: adaptive pass threshold by common-field count
  {1:0.4, 2:0.55, 3:0.7, 4:0.8, 5+:0.85};
- C1: 'exact' iff both sides have the same populated-field count == the
  common count and every per-field similarity == 1.0;
- C2: duplication_type ∈ {true_duplicate, near-exact duplicate,
  similar entity, conflicting entry};
- C3: status pass/fail; in filter mode, failing pairs with >= 3 common
  fields are dropped (confident non-matches), pairs with NO common fields
  are always dropped;
- C4: nested report struct assembly (output_utils.py:46-76).

The default per-field similarity is normalized Levenshtein (JVM,
whole-stage codegen). For bit-compatibility with the reference's
difflib.SequenceMatcher ratio, pass ``use_sequence_matcher=True`` (Arrow
UDF; parity tests only — per-pair Python is not a hot-path op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import similarity as simfn


def _populated(c: Column) -> Column:
    return c.isNotNull() & (F.trim(c) != "") & (F.lower(c) != "nan")


def _field_sim(a: Column, b: Column, use_sequence_matcher: bool) -> Column:
    if use_sequence_matcher:
        ratio = simfn.sequence_matcher_udf()(a, b)
    else:
        ratio = simfn.norm_levenshtein_sim(a, b)
    return simfn.acronym_boosted_sim(ratio, a, b)


def verify_entity_pairs(
    pairs: DataFrame,
    records_a: DataFrame,
    records_b: DataFrame,
    fields: list[str],
    id_col: str = "id",
    filter_mode: bool = True,
    use_sequence_matcher: bool = False,
) -> DataFrame:
    """(id1, id2, n_common, avg_sim, threshold, status, is_exact, dup_type
    [, sim_<field>...]).

    pairs: (id1, id2) candidates. records_*: flat tables with *fields*
    string columns (missing → null/""). Semantics per module docstring.
    """
    a = records_a.select(
        F.col(id_col).alias("id1"),
        *[F.col(f).alias(f"a_{f}") for f in fields],
    )
    b = records_b.select(
        F.col(id_col).alias("id2"),
        *[F.col(f).alias(f"b_{f}") for f in fields],
    )
    j = pairs.join(a, "id1").join(b, "id2")

    sims, commons, pop_a, pop_b = [], [], [], []
    for f in fields:
        ca, cb = F.col(f"a_{f}"), F.col(f"b_{f}")
        common = _populated(ca) & _populated(cb)
        sims.append(
            F.when(common, _field_sim(ca, cb, use_sequence_matcher)).alias(
                f"sim_{f}"
            )
        )
        commons.append(common.cast("int"))
        pop_a.append(_populated(ca).cast("int"))
        pop_b.append(_populated(cb).cast("int"))

    j = j.select("id1", "id2", *sims,
                 sum(commons).alias("n_common"),
                 sum(pop_a).alias("n_pop_a"),
                 sum(pop_b).alias("n_pop_b"))

    sim_cols = [F.col(f"sim_{f}") for f in fields]
    total = sum(F.coalesce(c, F.lit(0.0)) for c in sim_cols)
    avg_sim = F.when(F.col("n_common") > 0, total / F.col("n_common"))
    threshold = simfn.adaptive_threshold(F.col("n_common"))
    all_ones = F.forall(
        F.array(*[F.coalesce(c, F.lit(-1.0)) for c in sim_cols]),
        lambda x: (x == 1.0) | (x == -1.0),
    )
    is_exact = (
        (F.col("n_common") > 0)
        & (F.col("n_pop_a") == F.col("n_common"))
        & (F.col("n_pop_b") == F.col("n_common"))
        & all_ones
    )
    out = (
        j.withColumn("avg_sim", F.round(avg_sim, 9))
        .withColumn("threshold", threshold)
        .withColumn("is_exact", is_exact)
        .withColumn(
            "status",
            F.when(F.col("avg_sim") >= threshold, "pass").otherwise("fail"),
        )
        .withColumn(
            "dup_type",
            F.when(F.col("is_exact"), "true_duplicate")
            .when(F.col("avg_sim") >= 0.9, "near-exact duplicate")
            .when(F.col("avg_sim") >= 0.7, "similar entity")
            .otherwise("conflicting entry"),
        )
    )
    # reference drops pairs with no common predicates outright
    out = out.where(F.col("n_common") > 0)
    if filter_mode:
        # confident non-match: failed with >= 3 common fields → drop
        out = out.where(
            ~((F.col("status") == "fail") & (F.col("n_common") >= 3))
        )
    return out


def match_report(
    verified: DataFrame,
    records_a: DataFrame,
    records_b: DataFrame,
    fields: list[str],
    id_col: str = "id",
) -> DataFrame:
    """C4 report assembly (output_utils.py:46-76): nested struct per match
    with both entities' populated fields, scores stringified like the
    reference (output_utils.py:12)."""
    def entity_struct(rec: DataFrame, pair_id: str, tag: str) -> DataFrame:
        preds = F.array(
            *[
                F.struct(
                    F.lit(f).alias("predicate"), F.col(f).alias("value")
                )
                for f in fields
            ]
        )
        return rec.select(
            F.col(id_col).alias(pair_id),
            F.struct(
                F.col(id_col).alias("subject"),
                F.filter(
                    preds, lambda p: p["value"].isNotNull() & (p["value"] != "")
                ).alias("predicates"),
            ).alias(f"entity{tag}"),
        )

    return (
        verified.join(entity_struct(records_a, "id1", "1"), "id1")
        .join(entity_struct(records_b, "id2", "2"), "id2")
        .select(
            F.struct(
                F.col("entity1"),
                F.col("entity2"),
            ).alias("entities"),
            F.col("avg_sim").cast("string").alias("avg_literal_similarity"),
            F.col("status"),
            F.col("dup_type").alias("duplication_type"),
        )
    )
