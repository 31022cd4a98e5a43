"""Token-budget samplers (operators/sampling.py): determinism across
partitionings, budget nesting, expected-mass accuracy, balanced groups,
and the no-global-sort plan shape."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.operators import sampling


def _ids(df, col="doc_id"):
    return sorted(r[col] for r in df.collect())


def test_sample_deterministic_across_partitionings(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    a = sampling.proportional_token_sample(docs.repartition(1), 10000)
    b = sampling.proportional_token_sample(docs.repartition(17), 10000)
    assert _ids(a) == _ids(b)


def test_samples_are_nested_across_budgets(spark, sf001):
    """A smaller budget's sample is a SUBSET of a larger one's — the
    hash-threshold rule's defining property."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    small = set(_ids(sampling.proportional_token_sample(docs, 5000)))
    large = set(_ids(sampling.proportional_token_sample(docs, 20000)))
    assert small and small < large


def test_expected_token_mass_near_budget(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    budget = 15000
    got = (
        sampling.proportional_token_sample(docs, budget)
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    # Chernoff-ish tolerance at ~230 kept docs of ~65 tokens
    assert 0.75 * budget <= got <= 1.25 * budget, got


def test_budget_above_total_keeps_everything(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    kept = sampling.proportional_token_sample(docs, 10**9).count()
    assert kept == docs.count()


def test_balanced_sample_equalizes_group_mass(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    out = sampling.balanced_source_sample(docs).cache()
    masses = {
        r["source"]: r["m"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("m"))
        .collect()
    }
    full = {
        r["source"]: r["m"]
        for r in docs.groupBy("source")
        .agg(
            F.sum(
                F.size(
                    F.filter(
                        F.split(F.trim(F.regexp_replace(F.lower("text"), r"[^\p{L}\p{N}]+", " ")), r"\s+"),
                        lambda t: t != F.lit(""),
                    )
                ).cast("bigint")
            ).alias("m")
        )
        .collect()
    }
    target = min(full.values())
    # the smallest group is kept whole; all groups land near the target
    assert masses[min(full, key=full.get)] == target
    for s, m in masses.items():
        assert 0.6 * target <= m <= 1.4 * target, (s, m, target)
    out.unpersist()


def test_sampling_oracle_membership(spark, sf001):
    """Cross-engine: the kept id set is identical in DuckDB (the driver
    gate re-checks this at sf0.01 with value hashing)."""
    got = _ids(
        sampling.proportional_token_sample(
            spark.read.parquet(f"{sf001}/documents.parquet"), 10000
        )
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    want = sorted(
        r[0]
        for r in con.sql(
            sampling.sql_proportional_token_sample(10000)
        ).fetchall()
    )
    assert got == want


def test_sampling_plan_no_global_sort_and_broadcast(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = (
        sampling.balanced_source_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Sort [" not in plan  # no total ordering anywhere
    assert "BatchEvalPython" not in plan


def test_pareto_quality_sample_properties(spark):
    """GPT-3 Pareto keep rule: score 1 always kept; keep sets are
    MONOTONE in score (same u, higher score can only add docs); the
    empirical keep rate at a flat score tracks (2 - s)^-9; kept is a
    pure function of (id, score) — stable across partitionings."""
    n = 4000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    always = sampling.pareto_quality_sample(
        docs.withColumn("s", F.lit(1.0)), "s"
    )
    assert always.where("NOT kept").count() == 0
    lo = set(_ids(sampling.pareto_quality_sample(
        docs.withColumn("s", F.lit(0.3)), "s").where("kept")))
    hi = set(_ids(sampling.pareto_quality_sample(
        docs.withColumn("s", F.lit(0.8)), "s").where("kept")))
    assert lo <= hi
    # empirical rate vs theory at s=0.5: p = 1.5^-9 ~ 0.026
    p = 1.5 ** -9
    got = sampling.pareto_quality_sample(
        docs.withColumn("s", F.lit(0.5)), "s").where("kept").count()
    assert abs(got / n - p) < 4 * (p * (1 - p) / n) ** 0.5 + 1e-9
    re_part = sampling.pareto_quality_sample(
        docs.repartition(13).withColumn("s", F.lit(0.8)), "s"
    ).where("kept")
    assert set(_ids(re_part)) == hi
