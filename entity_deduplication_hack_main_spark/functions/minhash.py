"""Batched MinHash signatures — the numeric heart of candidate generation.

Reference parity: plays the role of the (n, 384) sentence-embedding matrix
(``dedup_pipeline.py:34-46``) as the cheap content representation whose
pairwise comparison approximates true similarity; MinHash estimates Jaccard
instead of cosine. 128 permutations per BASELINE.json north_star.

Execution contract (north_rule: zero per-row Python):
- shingle hashing happens JVM-side (functions/shingles.py);
- this module's pandas UDF receives Arrow batches of ``array<bigint>``
  shingle sets and computes all signatures with numpy matrix ops:
  flatten every list in the batch, broadcast (a ⊗ h + b) mod P31 over a
  perm-chunk axis, then ``np.minimum.reduceat`` at the list offsets.
  The only Python loop is over perm *chunks* (num_perms/16 iterations per
  batch), never over rows.

The DuckDB oracle (``sql_minhash_signatures``) computes the identical
integers by unnesting shingle hashes against an inlined VALUES table of the
same seeded permutation coefficients — exact 64-bit arithmetic on both sides
(see config.P31 rationale).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from entity_deduplication_hack_main_spark.config import P31, DedupConfig

_PERM_CHUNK = 16


def _minhash_batch(
    lists: pd.Series, a: np.ndarray, b: np.ndarray
) -> pd.Series:
    """MinHash every row of a Series of int lists. Vectorized over the batch."""
    num_perms = a.shape[0]
    lengths = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    if len(lists) == 0:
        return pd.Series([], dtype=object)
    # Empty shingle sets cannot occur (shingle_set emits >=1 element even for
    # empty text) but guard anyway: substitute a single 0-hash.
    safe = [x if len(x) else [0] for x in lists]
    lengths = np.maximum(lengths, 1)
    flat = np.concatenate([np.asarray(x, dtype=np.uint64) for x in safe])
    offsets = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    out = np.empty((num_perms, len(lists)), dtype=np.uint64)
    p = np.uint64(P31)
    for c0 in range(0, num_perms, _PERM_CHUNK):
        c1 = min(c0 + _PERM_CHUNK, num_perms)
        # (chunk, total_hashes): products < 2^62, exact in uint64
        vals = (a[c0:c1, None] * flat[None, :] + b[c0:c1, None]) % p
        out[c0:c1] = np.minimum.reduceat(vals, offsets, axis=1)
    sigs = out.T.astype(np.int64)  # all values < 2^31 → sign-safe
    return pd.Series(list(sigs))


def minhash_udf(config: DedupConfig):
    """pandas UDF: array<bigint> shingle set → array<bigint> signature."""
    a, b = config.permutations()

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for lists in it:
            yield _minhash_batch(lists, a, b)

    return _minhash


def with_signature(
    df: DataFrame, shingle_col: str, config: DedupConfig, out_col: str = "signature"
) -> DataFrame:
    return df.withColumn(out_col, minhash_udf(config)(F.col(shingle_col)))


def signature_digest(sig_col: Column) -> Column:
    """Order-sensitive md5 digest of a signature — comparable across engines."""
    return F.md5(F.array_join(F.transform(sig_col, lambda x: x.cast("string")), ","))


# --- DuckDB oracle -------------------------------------------------------


def sql_perms_values(config: DedupConfig) -> str:
    """Inline VALUES table (pid, a, b) of the seeded permutation coefficients."""
    a, b = config.permutations()
    rows = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(config.num_perms))
    return f"(VALUES {rows}) AS perms(pid, a, b)"


def sql_minhash_signatures(
    config: DedupConfig,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB CTE body producing (id, sig_digest) identical to the Spark path
    using md5 shingle hashing. Returns a complete SELECT usable as a CTE.
    """
    from entity_deduplication_hack_main_spark.functions import shingles as sh

    sset = sh.sql_shingle_set(text_col, config.shingle_k)
    return f"""
WITH _docs AS (
  SELECT {id_col} AS id, {sset} AS hs FROM {doc_table}
),
_u AS (SELECT id, unnest(hs) AS h FROM _docs),
_m AS (
  SELECT _u.id, perms.pid, min((perms.a * _u.h + perms.b) % {P31}) AS v
  FROM _u CROSS JOIN {sql_perms_values(config)}
  GROUP BY _u.id, perms.pid
)
SELECT id, md5(array_to_string(list(v ORDER BY pid), ',')) AS sig_digest
FROM _m GROUP BY id
"""
