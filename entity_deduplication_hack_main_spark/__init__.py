"""spark-dedup — PySpark-native near-duplicate detection and clustering.

A from-scratch Spark engine with the capabilities of the
``Timszy/entity-deduplication-hack-main`` reference (blocking → cheap
similarity → expensive verification → duplicate classification → golden
evaluation; see SURVEY.md), re-expressed for web-scale text:

- byte-deterministic HTML→text extraction (vectorized, Arrow-batched)
- k-shingling + 128-permutation MinHash signatures (batched numpy)
- LSH banding → (band_id, band_hash) candidate buckets with skew salting
- SimHash 64-bit fingerprints + Hamming-ball verification channel
- suffix-array exact-substring pass
- union-find connected-components clustering (iterative DataFrame
  self-joins, checkpointed frontiers)
- per-stage lineage rows + resumable stage commits

All hot-path string work stays JVM-side (whole-stage codegen); all numeric
kernels are Arrow-batched pandas UDFs over numpy matrices — zero per-row
Python.
"""

from entity_deduplication_hack_main_spark.config import DedupConfig
from entity_deduplication_hack_main_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
