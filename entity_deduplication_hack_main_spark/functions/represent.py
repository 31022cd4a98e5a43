"""The document-representation kernel: ONE Arrow-batched numpy pass.

Motivation (measured, local[8], 1000 docs): building k-shingles with nested
SQL higher-order lambdas is O(n²) per row because Catalyst re-evaluates
captured subtrees per lambda element — winnowing alone cost 551 s. The fix:
keep only per-token hashing JVM-side (one flat ``transform``, 0.4 s) and
compute everything derived from it in one vectorized kernel per Arrow batch:

  token hashes ──► shingle hashes (rolling polynomial mod P31)
              ├──► distinct shingle set           (exact-Jaccard verify)
              ├──► MinHash-128 signature          (LSH channel)
              ├──► winnowed fingerprints          (substring channel)
              └──► SimHash fingerprint            (Hamming channel)

Shingle identity is a degree-(k-1) polynomial of the k consecutive token
hashes mod P31 — not a hash of the joined string — so the whole kernel is
integer arithmetic, exact in numpy uint64 AND in DuckDB HUGEINT/BIGINT:
the oracle SQL below reproduces every integer bit-identically (md5 token
hash strategy).

Zero per-row Python: the only Python-level loops are over permutation
chunks, bit chunks, and the k coefficient shifts; row boundaries are
handled with offsets + ``np.minimum.reduceat`` / boolean masks.

Reference parity: this kernel replaces the reference's batched
``model.encode(texts)`` embedding matrix (``dedup_pipeline.py:34-46``) as
the content representation (SURVEY.md §2.7 E1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import P31, DedupConfig
from entity_deduplication_hack_main_spark.functions import hashes, textnorm

_PERM_CHUNK = 16
_BIT_CHUNK = 16

REPR_SCHEMA = (
    "struct<shingle_set:array<bigint>,signature:array<bigint>,"
    "winnow_fps:array<bigint>,simhash:bigint>"
)

WINNOW_WINDOW = 4  # shingles per winnowing window (substring channel)


def shingle_coeffs(config: DedupConfig) -> np.ndarray:
    """k rolling-polynomial coefficients in [1, P31), seeded like the perms."""
    rng = np.random.default_rng([config.seed, 777])
    return rng.integers(1, P31, size=config.shingle_k, dtype=np.uint64)


def token_hashes(text_col: Column, hash_strategy: str = "xxhash64") -> Column:
    """Per-occurrence token hashes (JVM, one flat transform): array<bigint>."""
    toks = textnorm.tokens(textnorm.normalize(text_col))
    if hash_strategy == "xxhash64":
        return F.transform(toks, lambda t: F.xxhash64(t))
    return F.transform(toks, lambda t: hashes.md5_long(t))


# --------------------------------------------------------------------------
# numpy kernel
# --------------------------------------------------------------------------


def _flatten(lists: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint64, lengths, offsets) for a Series of int lists."""
    lengths = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    if lengths.sum() == 0:
        flat = np.zeros(0, dtype=np.uint64)
    else:
        flat = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in lists if len(x)]
        ).astype(np.uint64)
    offsets = np.zeros(len(lists), dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return flat, lengths, offsets


def _shingle_hashes(
    flat_th: np.ndarray,
    lengths: np.ndarray,
    offsets: np.ndarray,
    coeffs: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rolling-polynomial shingle hashes per row.

    Returns (flat_sh, sh_lengths, sh_offsets): row r contributes
    m_r = max(1, n_r - k + 1) shingles; rows with n_r < k get ONE shingle
    = sum_{j<n_r} c_j * thp_j mod P31 (empty rows → the 0 shingle).
    """
    k = coeffs.shape[0]
    p = np.uint64(P31)
    n_rows = lengths.shape[0]
    thp = flat_th % p
    total = thp.shape[0]

    m = np.maximum(lengths - k + 1, 1)
    sh_offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(m[:-1], out=sh_offsets[1:])
    flat_sh = np.zeros(int(m.sum()), dtype=np.uint64)

    # full windows: global window start i covers thp[i:i+k]; valid iff the
    # window stays inside its row
    n_win = total - k + 1
    if n_win > 0:
        acc = np.zeros(n_win, dtype=np.uint64)
        for j in range(k):
            acc = (acc + coeffs[j] * thp[j : j + n_win]) % p
        # mask: window starting at global i belongs to row r if
        # offsets[r] <= i <= offsets[r] + lengths[r] - k
        row_of = np.repeat(np.arange(n_rows), lengths)[:n_win]
        pos_in_row = np.arange(n_win) - offsets[row_of]
        valid = pos_in_row <= (lengths[row_of] - k)
        full_rows = lengths >= k
        # destination: sh_offsets[row] + pos_in_row for valid windows
        dst = sh_offsets[row_of[valid]] + pos_in_row[valid]
        flat_sh[dst] = acc[valid]
        del row_of, pos_in_row, valid, acc, dst, full_rows

    # short rows (0 < n_r < k): one shingle = sum c_j * thp_j mod p
    short = (lengths > 0) & (lengths < k)
    if short.any():
        j_in_row = np.arange(total) - np.repeat(offsets, lengths)
        terms = (coeffs[np.minimum(j_in_row, k - 1)] * thp) % p
        row_sums = np.add.reduceat(terms, np.minimum(offsets, max(total - 1, 0)))
        # reduceat needs monotone offsets; rows with length 0 reuse the next
        # segment's value — we only read rows flagged `short`, and offsets of
        # zero-length rows equal the next row's offset, so mask handles it.
        flat_sh[sh_offsets[short]] = row_sums[short] % p
    # empty rows keep the 0 shingle already in flat_sh
    return flat_sh, m, sh_offsets


def _minhash(
    flat_sh: np.ndarray, sh_offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(rows, num_perms) int64 signatures via perm-chunked reduceat."""
    num_perms = a.shape[0]
    n_rows = sh_offsets.shape[0]
    p = np.uint64(P31)
    out = np.empty((num_perms, n_rows), dtype=np.uint64)
    for c0 in range(0, num_perms, _PERM_CHUNK):
        c1 = min(c0 + _PERM_CHUNK, num_perms)
        vals = (a[c0:c1, None] * flat_sh[None, :] + b[c0:c1, None]) % p
        out[c0:c1] = np.minimum.reduceat(vals, sh_offsets, axis=1)
    return out.T.astype(np.int64)


def _winnow(
    flat_sh: np.ndarray,
    sh_lengths: np.ndarray,
    sh_offsets: np.ndarray,
    window: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct sliding-window minima per row → (row_ids, values)."""
    total = flat_sh.shape[0]
    n_rows = sh_lengths.shape[0]
    row_of = np.repeat(np.arange(n_rows), sh_lengths)
    n_win = total - window + 1
    parts_rows = []
    parts_vals = []
    if n_win > 0:
        sw = np.lib.stride_tricks.sliding_window_view(flat_sh, window)
        mins = sw.min(axis=1)
        pos_in_row = np.arange(n_win) - sh_offsets[row_of[:n_win]]
        valid = pos_in_row <= (sh_lengths[row_of[:n_win]] - window)
        parts_rows.append(row_of[:n_win][valid])
        parts_vals.append(mins[valid])
    shorties = sh_lengths < window
    if shorties.any():
        mins_all = np.minimum.reduceat(
            flat_sh, np.minimum(sh_offsets, max(total - 1, 0))
        )
        parts_rows.append(np.arange(n_rows)[shorties])
        parts_vals.append(mins_all[shorties])
    rows = np.concatenate(parts_rows) if parts_rows else np.zeros(0, np.int64)
    vals = np.concatenate(parts_vals) if parts_vals else np.zeros(0, np.uint64)
    return _distinct_per_row(rows, vals)


def _distinct_per_row(
    row_ids: np.ndarray, values: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (row, value) pairs, sorted by row then value. values < 2^32."""
    combined = (row_ids.astype(np.uint64) << np.uint64(32)) | values.astype(np.uint64)
    uniq = np.unique(combined)
    return (uniq >> np.uint64(32)).astype(np.int64), uniq & np.uint64(0xFFFFFFFF)


def _simhash(
    flat_th: np.ndarray, lengths: np.ndarray, offsets: np.ndarray, nbits: int
) -> np.ndarray:
    n_rows = lengths.shape[0]
    fp = np.zeros(n_rows, dtype=np.uint64)
    if flat_th.shape[0] == 0:
        return fp.astype(np.int64)
    safe_offsets = np.minimum(offsets, flat_th.shape[0] - 1)
    for b0 in range(0, nbits, _BIT_CHUNK):
        b1 = min(b0 + _BIT_CHUNK, nbits)
        shifts = np.arange(b0, b1, dtype=np.uint64)
        bits = ((flat_th[None, :] >> shifts[:, None]) & np.uint64(1)).astype(np.int64)
        sums = np.add.reduceat(2 * bits - 1, safe_offsets, axis=1)
        sums[:, lengths == 0] = 0
        bitvals = (sums > 0).astype(np.uint64)
        for j in range(b0, b1):
            fp |= bitvals[j - b0] << np.uint64(j)
    return fp.astype(np.int64)


def _split_lists(flat: np.ndarray, lengths_or_rows, n_rows: int, by_rows: bool):
    """Python-object list column assembly (Arrow requires per-row lists)."""
    if by_rows:
        # flat sorted by row id; lengths_or_rows = row id per element
        counts = np.bincount(lengths_or_rows, minlength=n_rows)
        split_at = np.cumsum(counts)[:-1]
    else:
        split_at = np.cumsum(lengths_or_rows)[:-1]
    return np.split(flat.astype(np.int64), split_at)


def representation_udf(config: DedupConfig, hash_strategy: str = "xxhash64"):
    """pandas UDF: array<bigint> token hashes → REPR_SCHEMA struct."""
    a, b = config.permutations()
    coeffs = shingle_coeffs(config)
    nbits = 64 if hash_strategy == "xxhash64" else 60
    window = WINNOW_WINDOW

    @F.pandas_udf(REPR_SCHEMA)
    def _repr(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for th_lists in it:
            n_rows = len(th_lists)
            if n_rows == 0:
                yield pd.DataFrame(
                    {
                        "shingle_set": [],
                        "signature": [],
                        "winnow_fps": [],
                        "simhash": pd.Series([], dtype=np.int64),
                    }
                )
                continue
            flat_th, lengths, offsets = _flatten(th_lists)
            flat_sh, sh_len, sh_off = _shingle_hashes(
                flat_th, lengths, offsets, coeffs
            )
            sig = _minhash(flat_sh, sh_off, a, b)
            ss_rows, ss_vals = _distinct_per_row(
                np.repeat(np.arange(n_rows), sh_len), flat_sh
            )
            wn_rows, wn_vals = _winnow(flat_sh, sh_len, sh_off, window)
            sim = _simhash(flat_th, lengths, offsets, nbits)
            yield pd.DataFrame(
                {
                    "shingle_set": _split_lists(ss_vals, ss_rows, n_rows, True),
                    "signature": list(sig),
                    "winnow_fps": _split_lists(wn_vals, wn_rows, n_rows, True),
                    "simhash": pd.Series(sim),
                }
            )

    return _repr


def with_representation(
    docs: DataFrame,
    config: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_strategy: str = "xxhash64",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, fp, shingle_set, signature, winnow_fps, simhash [, extras])."""
    from entity_deduplication_hack_main_spark.functions import textstats

    th = token_hashes(F.col(text_col), hash_strategy)
    base = docs.select(
        F.col(id_col).alias("id"),
        textstats.fingerprint(F.col(text_col)).alias("fp"),
        representation_udf(config, hash_strategy)(th).alias("_r"),
        *[F.col(c) for c in extra_cols],
    )
    return base.select(
        "id", "fp", "_r.shingle_set", "_r.signature", "_r.winnow_fps", "_r.simhash",
        *extra_cols,
    )


# --------------------------------------------------------------------------
# DuckDB oracle: identical integers via md5 token hashes (60-bit)
# --------------------------------------------------------------------------


def sql_repr_ctes(
    config: DedupConfig,
    doc_table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """CTE chain defining _th (token hashes), _sh (ordered shingle hashes),
    _ss (distinct shingle set), _wn (winnow fps). Append your SELECT."""
    coeffs = [int(c) for c in shingle_coeffs(config)]
    k = config.shingle_k
    w = WINNOW_WINDOW
    toks = textnorm.sql_tokens(textnorm.sql_normalize(text_col))
    thp_term = f"({hashes.sql_md5_long('t')} % {P31})"
    full_terms = " + ".join(
        f"({coeffs[j]}::HUGEINT * thp[i+{j}])" for j in range(k)
    )
    short_terms = (
        f"list_sum(list_transform(range(1, len(thp)+1), "
        f"j -> [{', '.join(str(c) for c in coeffs)}][j]::HUGEINT * thp[j]))"
    )
    return f"""
_tok AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {doc_table}
),
_th AS (
  SELECT id,
         list_transform(toks, t -> {hashes.sql_md5_long('t')}) AS th,
         list_transform(toks, t -> {thp_term}) AS thp
  FROM _tok
),
_sh AS (
  SELECT id,
         CASE
           WHEN len(thp) = 0 THEN [0::BIGINT]
           WHEN len(thp) >= {k} THEN
             list_transform(range(1, len(thp) - {k} + 2),
                            i -> (({full_terms}) % {P31})::BIGINT)
           ELSE [({short_terms} % {P31})::BIGINT]
         END AS sh
  FROM _th
),
_ss AS (
  SELECT id, list_sort(list_distinct(sh)) AS ss FROM _sh
),
_wn AS (
  SELECT id, list_distinct(
    CASE WHEN len(sh) >= {w} THEN
      list_transform(range(1, len(sh) - {w} + 2),
                     i -> list_min(sh[i:i+{w - 1}]))
    ELSE [list_min(sh)] END) AS wn
  FROM _sh
)"""


def sql_signature_cte(config: DedupConfig) -> str:
    """CTEs _mh (id, pid, v) and _sig (id, sig list) from _sh."""
    from entity_deduplication_hack_main_spark.functions.minhash import (
        sql_perms_values,
    )

    return f"""
_u AS (SELECT id, unnest(sh) AS h FROM _sh),
_mh AS (
  SELECT _u.id, perms.pid, min((perms.a * _u.h + perms.b) % {P31}) AS v
  FROM _u CROSS JOIN {sql_perms_values(config)}
  GROUP BY _u.id, perms.pid
),
_sig AS (
  SELECT id, list(v ORDER BY pid) AS sig FROM _mh GROUP BY id
)"""
