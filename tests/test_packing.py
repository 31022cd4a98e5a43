"""Sequence-packing planner (operators/packing.py): gapless tiling per
shard, straddle accounting, determinism across partitionings, md5/xxhash
shape parity, stats report, and the DuckDB oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.operators import packing

SEQ = 32


def test_shard_streams_tile_gaplessly(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = packing.pack_plan(docs, seq_len=SEQ, n_shards=4).collect()
    by_shard = {}
    for r in plan:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in rows:
            assert r["start_tok"] == pos  # exclusive cumsum: no gap/overlap
            assert r["seq_in_shard"] == pos // SEQ
            assert r["tok_offset"] == pos % SEQ
            if r["n_tokens"] == 0:
                assert r["n_seqs"] == 0
            else:
                last = pos + r["n_tokens"] - 1
                assert r["n_seqs"] == last // SEQ - pos // SEQ + 1
            pos += r["n_tokens"]


def test_plan_deterministic_across_partitionings(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    a = sorted(map(tuple, packing.pack_plan(docs.repartition(1)).collect()))
    b = sorted(map(tuple, packing.pack_plan(docs.repartition(17)).collect()))
    assert a == b


def test_straddling_doc_spans_multiple_sequences(spark):
    # one shard, one long doc: 3*SEQ+5 tokens starting at 0 spans 4 seqs
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(3 * SEQ + 5)))],
        "doc_id bigint, text string",
    )
    r = packing.pack_plan(docs, seq_len=SEQ, n_shards=1).collect()[0]
    assert (r["shard"], r["start_tok"], r["n_seqs"]) == (0, 0, 4)


def test_packing_stats_padding(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["x"] * 10)) for i in range(7)],
        "doc_id bigint, text string",
    )
    plan = packing.pack_plan(docs, seq_len=SEQ, n_shards=1)
    s = packing.packing_stats(plan, seq_len=SEQ).collect()[0]
    # 70 tokens -> ceil(70/32)=3 sequences, padding 96-70=26
    assert (s["n_docs"], s["total_tokens"]) == (7, 70)
    assert (s["n_sequences"], s["tail_padding"]) == (3, 26)


def test_oracle_sql_matches_spark(spark, sf001):
    from entity_deduplication_hack_main_spark import entry_queries as eq

    q = eq.REGISTRY["pack_plan_docs"]
    got = sorted(map(tuple, q.fn(spark, sf001).collect()))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf001}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(q.sql).fetchall()))
    assert got == want


def test_window_is_shard_partitioned_not_global(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    plan = packing.pack_plan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the running sum must be keyed by shard, never an empty partition spec
    assert "partitionBy" not in plan or "shard" in plan
    assert plan.count("Exchange SinglePartition") == 0
