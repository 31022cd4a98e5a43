"""Composed curation decision table (entry_queries.curation_report):
signal composition semantics + the DuckDB oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark import entry_queries as eq


def test_keep_rule_composes_quality_and_dedup(spark, tmp_path):
    good = (
        "The quick brown fox jumps over the lazy dog and then walks to "
        "the market with a basket of fresh apples pears and plums while "
        "the sun shines over the quiet town square where people gather "
        "to talk about the news of the day and share a warm meal "
        "together before the evening comes "
    ) * 2
    rows = [
        (0, good),                     # unique + quality pass -> keep
        (1, good + " extra closing words about the town"),  # unique pass
        (2, "spam " * 60),             # fails alpha/stopword rules
        (3, good),                     # exact dup of 0 -> not rep
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in eq.REGISTRY["curation_report"].fn(
        spark, str(tmp_path)
    ).collect()}
    assert out[0]["keep"] and out[0]["is_exact_dup"] and out[0]["is_rep"]
    assert out[3]["is_exact_dup"] and not out[3]["is_rep"] and not out[3]["keep"]
    assert out[1]["keep"] and not out[1]["is_exact_dup"]
    assert not out[2]["gopher_pass"] and not out[2]["keep"]
    assert all(r["pred_lang"] == "en" for r in (out[0], out[1]))


def test_oracle_sql_matches_spark(spark, sf001):
    q = eq.REGISTRY["curation_report"]
    got = sorted(map(tuple, q.fn(spark, sf001).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(q.sql).fetchall()))
    assert got == want
