"""Text normalization + tokenization — pure JVM expressions.

Reference parity: lowercasing before compare (``similarity_utils.py:73-74``),
whitespace-insensitive comparison via verbalized text
(``graphToText_utils.py:47-58``). Every expression here has a bit-identical
DuckDB rendering for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Spark ---------------------------------------------------------------


def normalize(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of an already-normalized string (array<string>)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# --- DuckDB oracle -------------------------------------------------------
# DuckDB's regex engine (RE2) treats \p{L}\p{N} the same way as Java's with
# UNICODE_CHARACTER_CLASS — both implementations are checked against each
# other in tests/test_textnorm.py.


def sql_normalize(expr: str) -> str:
    return (
        f"trim(regexp_replace(lower({expr}), '[^\\p{{L}}\\p{{N}}]+', ' ', 'g'))"
    )


def sql_tokens(expr: str) -> str:
    return f"list_filter(string_split_regex({expr}, '\\s+'), t -> t != '')"
