"""Batched SimHash fingerprints — second recall channel.

Reference parity: the reference reaches near-duplicates through dense cosine
similarity (``similarity_utils.py:9-20``); SimHash is the hash-space analog —
a 64-bit fingerprint whose Hamming distance tracks cosine distance of the
token multiset. Candidates come from a block index (4 x 16-bit keys: any two
docs within Hamming distance 3 share at least one of 4 blocks, pigeonhole),
verified with ``bit_count(xor) <= r``.

Execution contract mirrors functions/represent.py: token hashing JVM-side,
fingerprint assembly in an Arrow-batched numpy kernel (loop over bit chunks,
never over rows). The oracle variant uses 60-bit md5-derived token hashes so
DuckDB reproduces the exact fingerprint integers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.functions import hashes, textnorm

_BIT_CHUNK = 16


def _simhash_batch(lists: pd.Series, nbits: int) -> pd.Series:
    if len(lists) == 0:
        return pd.Series([], dtype=np.int64)
    lengths = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    safe = [x if len(x) else [0] for x in lists]
    flat = np.concatenate([np.asarray(x, dtype=np.uint64) for x in safe])
    offsets = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(np.maximum(lengths, 1)[:-1], out=offsets[1:])
    fp = np.zeros(len(lists), dtype=np.uint64)
    for b0 in range(0, nbits, _BIT_CHUNK):
        b1 = min(b0 + _BIT_CHUNK, nbits)
        shifts = np.arange(b0, b1, dtype=np.uint64)
        bits = ((flat[None, :] >> shifts[:, None]) & np.uint64(1)).astype(np.int64)
        sums = np.add.reduceat(2 * bits - 1, offsets, axis=1)
        # rows with empty token lists contribute nothing
        sums[:, lengths == 0] = 0
        bitvals = (sums > 0).astype(np.uint64)
        for j in range(b0, b1):
            fp |= bitvals[j - b0] << np.uint64(j)
    return pd.Series(fp.astype(np.int64))


def simhash_udf(nbits: int = 64):
    """pandas UDF: array<bigint> token hashes → bigint fingerprint."""

    @F.pandas_udf(LongType())
    def _simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for lists in it:
            yield _simhash_batch(lists, nbits)

    return _simhash


def token_hashes(text_col: Column, hash_strategy: str = "xxhash64") -> Column:
    """Per-occurrence token hashes (JVM): array<bigint>.

    'xxhash64' → full 64-bit (production); 'md5' → 60-bit non-negative
    (oracle-reproducible).
    """
    toks = textnorm.tokens(textnorm.normalize(text_col))
    if hash_strategy == "xxhash64":
        return F.transform(toks, lambda t: F.xxhash64(t))
    return F.transform(toks, lambda t: hashes.md5_long(t))


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    hash_strategy: str = "xxhash64",
) -> DataFrame:
    nbits = 64 if hash_strategy == "xxhash64" else 60
    th = token_hashes(F.col(text_col), hash_strategy)
    return df.withColumn(out_col, simhash_udf(nbits)(th))


def simhash_blocks(fp_col: Column, config: DedupConfig, nbits: int = 64) -> Column:
    """array<struct<block_id int, block_key bigint>> for the Hamming index.

    Splits the fingerprint into ``config.simhash_blocks`` equal bit blocks;
    docs within Hamming distance <= blocks-1 share >= one block key.
    """
    width = nbits // config.simhash_blocks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftrightunsigned(fp_col, i * width)
                .bitwiseAND(F.lit(mask).cast("bigint"))
                .alias("block_key"),
            )
            for i in range(config.simhash_blocks)
        ]
    )


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --- DuckDB oracle (60-bit md5 variant) ----------------------------------


def sql_simhash(
    doc_table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB SELECT producing (id, simhash) identical to the md5-strategy
    Spark path (nbits=60)."""
    toks = textnorm.sql_tokens(textnorm.sql_normalize(text_col))
    h = hashes.sql_md5_long("t.tok")
    return f"""
WITH _toks AS (
  SELECT {id_col} AS id, unnest({toks}) AS tok FROM {doc_table}
),
_h AS (SELECT id, {h} AS h FROM _toks t),
_bits AS (
  SELECT id, j.j,
         sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM _h CROSS JOIN (FROM range(0, 60) t(j)) j
  GROUP BY id, j.j
)
SELECT id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
FROM _bits GROUP BY id
"""
