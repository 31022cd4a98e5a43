"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``entity_deduplication_hack_main_spark.entry_queries``
— one registry entry per operator from SURVEY.md §2, each pairing the Spark
DataFrame program with a bit-identical DuckDB oracle (dedup queries use the
cross-engine md5 hash strategy; see functions/represent.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from entity_deduplication_hack_main_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-channel dedup pipeline (MinHash-LSH ∪ SimHash ∪
    winnowing → union-find) on sf0.001 documents →
    (doc_id, cluster_id, cluster_size)."""
    return _eq.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
