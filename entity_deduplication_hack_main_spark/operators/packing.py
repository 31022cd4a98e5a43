"""Sequence-packing planner — GPT-style concat-and-chunk for training.

After dedup/filtering, a pretraining run concatenates documents and
chunks the token stream into fixed-length sequences (Brown et al. 2020
describe the concat-and-chunk convention). At 100 TB that plan must be
computed distributively: this operator assigns every document a position
in a deterministic packed stream WITHOUT materializing the stream —
each doc gets (shard, start_tok, seq_in_shard, tok_offset, n_seqs), so
any executor can later cut its own sequences locally from just its
shard's documents.

Scale shape: documents are hash-bucketed into ``n_shards`` independent
streams; the only shuffle is the window ``partitionBy(shard)`` whose
per-partition state is a running sum (one cumulative counter per shard,
never a global sort). Shard count bounds the window partition size —
pick n_shards ≈ corpus_tokens / (executor_mem-sized stream); packing
quality is unaffected because chunk boundaries are arbitrary anyway.
The hash ordering inside a shard doubles as document-level shuffling
(training wants decorrelated neighbors, not crawl order).

The reference has no packing analog (its corpus fits in one notebook);
this is one of the beyond-reference training-data operators. The md5
hash strategy keeps the plan bit-identical in DuckDB for the oracle;
production uses xxhash64 (pure JVM, same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import hashes, textstats


def pack_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    """Per-document packing coordinates in the concat-and-chunk stream.

    Output columns (one row per input doc):
      - ``n_tokens``  — whitespace-normalized token count
      - ``shard``     — which of the ``n_shards`` independent streams
      - ``start_tok`` — the doc's first token's position in its shard's
                        concatenated stream (0-based)
      - ``seq_in_shard`` — index of the fixed-length sequence holding
                        that first token (``start_tok // seq_len``)
      - ``tok_offset``   — position within that sequence
      - ``n_seqs``       — how many sequences the doc spans (0 for empty)

    Every shard's stream is gapless and collision-free by construction:
    ``start_tok`` is an exclusive running sum over a total order
    (hash, id), so consecutive docs tile the stream exactly.
    """
    if hash_strategy == "md5":
        okey = hashes.md5_long(F.col(id_col).cast("string"))
    else:
        okey = F.xxhash64(F.col(id_col).cast("string"))
    t = docs.select(
        F.col(id_col),
        textstats.token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        F.pmod(okey, F.lit(n_shards)).cast("int").alias("shard"),
        okey.alias("_okey"),
    )
    # ROWS frame explicitly: the default RANGE frame would double-count
    # order-key ties; (okey, id) is total so ROWS == the intended stream
    w = (
        Window.partitionBy("shard")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    c = t.select(id_col, "n_tokens", "shard", start)
    end_seq = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / seq_len)
    return c.select(
        id_col,
        "n_tokens",
        "shard",
        "start_tok",
        F.floor(F.col("start_tok") / seq_len).alias("seq_in_shard"),
        (F.col("start_tok") % seq_len).alias("tok_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(end_seq - F.floor(F.col("start_tok") / seq_len) + 1)
        .cast("bigint")
        .alias("n_seqs"),
    )


def packing_stats(plan: DataFrame, seq_len: int = 512) -> DataFrame:
    """Per-shard packing report: docs, tokens, full sequences, and the
    tail padding the last (partial) sequence would need — the number a
    capacity planner actually wants. Pure groupBy, one shuffle."""
    return (
        plan.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / seq_len).alias("n_sequences"),
            (
                F.ceil(F.col("total_tokens") / seq_len) * seq_len
                - F.col("total_tokens")
            ).alias("tail_padding"),
        )
    )


def sql_pack_plan(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
) -> str:
    """DuckDB rendering of :func:`pack_plan` (md5 strategy): same hash,
    same explicit ROWS frame, same integer arithmetic."""
    okey = hashes.sql_md5_long(f"{id_col}::VARCHAR")
    ntok = textstats.sql_token_count(text_col)
    return f"""
WITH _t AS (
  SELECT {id_col}, {ntok}::BIGINT AS n_tokens,
         ({okey} % {n_shards})::INT AS shard, {okey} AS _okey
  FROM {table}
),
_c AS (
  SELECT {id_col}, n_tokens, shard,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY _okey, {id_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start_tok
  FROM _t
)
SELECT {id_col}, n_tokens, shard, start_tok,
       (start_tok // {seq_len})::BIGINT AS seq_in_shard,
       (start_tok % {seq_len})::BIGINT AS tok_offset,
       (CASE WHEN n_tokens = 0 THEN 0
             ELSE ((start_tok + n_tokens - 1) // {seq_len})
                  - (start_tok // {seq_len}) + 1 END)::BIGINT AS n_seqs
FROM _c
"""
