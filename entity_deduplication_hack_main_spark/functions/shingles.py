"""k-shingle generation — pure JVM expressions (no Python on the hot path).

Reference parity: the reference's content representation is a verbalized
entity string fed to a sentence encoder (``dedup_pipeline.py:34``,
``graphToText_utils.py:47-58``); for webtext the representation is the set of
word k-shingles whose MinHash signature estimates Jaccard similarity.

Semantics:
- tokens are whitespace splits of normalized text;
- a document with >= k tokens yields the n-k+1 overlapping k-word shingles;
- a document with < k tokens yields ONE shingle = the whole token string
  (so short docs still participate in dedup instead of vanishing);
- the *shingle set* is distinct hashed shingles in [0, P31).

Every helper has a DuckDB rendering producing identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.functions import hashes, textnorm

# --- Spark ---------------------------------------------------------------


def shingles(tokens_col: Column, k: int) -> Column:
    """array<string> of overlapping k-word shingles (see module semantics)."""
    n = F.size(tokens_col)
    full = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.array_join(F.slice(tokens_col, i + F.lit(1), k), " "),
    )
    short = F.array(F.array_join(tokens_col, " "))
    return F.when(n >= F.lit(k), full).otherwise(short)


def shingle_set(text_col: Column, k: int, hash_strategy: str = "xxhash64") -> Column:
    """Distinct hashed k-shingles of *text_col*: array<bigint> in [0, P31).

    hash_strategy: 'xxhash64' (production, JVM-only) or 'md5'
    (cross-engine, reproducible in the DuckDB oracle).
    """
    toks = textnorm.tokens(textnorm.normalize(text_col))
    sh = shingles(toks, k)
    hasher = hashes.xxhash_mod_p if hash_strategy == "xxhash64" else hashes.md5_mod_p
    return F.array_distinct(F.transform(sh, hasher))


# --- DuckDB oracle -------------------------------------------------------


def sql_shingles(tokens_expr: str, k: int) -> str:
    """DuckDB rendering of :func:`shingles` over a list expression."""
    t = tokens_expr
    return (
        f"CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(range(1, len({t}) - {k} + 2), "
        f"i -> array_to_string({t}[i:i+{k - 1}], ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def sql_shingle_set(text_expr: str, k: int) -> str:
    """DuckDB rendering of :func:`shingle_set` (md5 strategy)."""
    toks = textnorm.sql_tokens(textnorm.sql_normalize(text_expr))
    sh = sql_shingles(toks, k)
    return f"list_distinct(list_transform({sh}, s -> {hashes.sql_md5_mod_p('s')}))"
