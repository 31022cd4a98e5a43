"""Scalar / vector function layer.

Each module pairs the Spark-side implementation (JVM expressions on the hot
path, Arrow-batched pandas UDFs for numeric kernels) with a DuckDB-dialect
SQL builder producing bit-identical results — that pairing is the
correctness oracle contract of ``__spark_entry__.py``.
"""
