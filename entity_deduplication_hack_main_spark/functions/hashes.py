"""Deterministic cross-engine hashing.

Production hot path uses ``xxhash64`` (JVM, whole-stage codegen, no Python).
The oracle path derives a 60-bit integer from ``md5`` hex — the one hash both
Spark and DuckDB compute identically. Downstream arithmetic (shingle
polynomials, MinHash multiply-shift) happens mod 2^64 in the Arrow kernel
(functions/represent.py).

Reference parity: the reference never hashes (2.6k entities fit in RAM);
hashing is the scale substrate that replaces its in-memory dict blocking
(``graphToText_utils.py:77-81``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Spark side -----------------------------------------------------------


def md5_long(col: Column) -> Column:
    """First 15 hex chars of md5 → BIGINT in [0, 2^60). Cross-engine stable."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# --- DuckDB oracle side ---------------------------------------------------


def sql_md5_long(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long` over SQL expression *expr*."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
