"""In-corpus unigram-LM perplexity gate (functions/lm.py): planted
gibberish lands in the tail, buckets agree between the exact ntile twin
and the production quantile-cutoff path, the broadcast-vocab variant is
identical, and the DuckDB oracle is bit-identical."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import lm


def _corpus(spark):
    """9 prose-like docs over a shared vocab + 1 gibberish doc of unique
    tokens + 1 empty doc."""
    common = "the cat sat on the mat and the dog ran to the mat"
    rows = [(i, f"{common} extra{i % 3} {common}") for i in range(9)]
    rows.append((9, " ".join(f"zzq{i}x" for i in range(20))))
    rows.append((10, "   "))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gibberish_scores_lowest_and_lands_in_tail(spark):
    docs = _corpus(spark)
    scored = lm.unigram_logprob(docs)
    out = {r["doc_id"]: r for r in lm.perplexity_buckets_exact(scored).collect()}
    real = {i: out[i]["mean_logprob"] for i in range(10)}
    assert min(real, key=real.get) == 9  # unique-token doc least typical
    assert out[9]["ppl_bucket"] == 3
    # empty doc: sentinel score, tail bucket, zero tokens
    assert out[10]["n_tokens"] == 0
    assert out[10]["mean_logprob"] == lm.EMPTY_DOC_SCORE
    assert out[10]["ppl_bucket"] == 3
    # prose docs beat gibberish
    assert all(real[i] > real[9] for i in range(9))


def test_broadcast_vocab_path_is_identical(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, lm.unigram_logprob(docs).collect()))
    b = sorted(
        map(tuple, lm.unigram_logprob(docs, broadcast_vocab=True).collect())
    )
    assert a == b


def test_production_buckets_agree_with_exact_off_boundaries(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    scored = lm.unigram_logprob(docs).cache()
    exact = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.perplexity_buckets_exact(scored).collect()
    }
    approx = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.perplexity_buckets(scored).collect()
    }
    # quantile-cutoff bucketing may shift boundary docs one bucket; the
    # bulk must agree and no doc may move more than one bucket
    diffs = [abs(exact[k] - approx[k]) for k in exact]
    assert max(diffs) <= 1
    assert sum(d == 0 for d in diffs) / len(diffs) >= 0.9
    scored.unpersist()


def test_oracle_sql_matches_spark(spark, sf001):
    from entity_deduplication_hack_main_spark import entry_queries as eq

    q = eq.REGISTRY["unigram_lm_scores"]
    got = sorted(map(tuple, q.fn(spark, sf001).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(q.sql).fetchall()))
    assert got == want
