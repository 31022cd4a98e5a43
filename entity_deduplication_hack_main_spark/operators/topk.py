"""Ranked-join / top-k-per-group operators.

Reference parity: J2/W1 — top-k matches per probe entity
(``similarity_utils.py:22-33``: per g2-entity ``nlargest(top_k)`` of the
similarity matrix, k=5). Spark mapping: rank window; modern Spark pushes
the rank filter into the shuffle via WindowGroupLimit, so the full sort
never materializes per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic top-k rows per group (order_cols must be total)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def top_k_matches(
    pairs: DataFrame,
    probe_col: str = "id2",
    score_col: str = "score",
    k: int = 5,
    threshold: float | None = None,
) -> DataFrame:
    """The reference's select step: per probe, k best matches >= threshold
    (similarity_utils.py:29-31). Ties broken by the other id for
    determinism (the reference inherits pandas' stable order)."""
    other = "id1" if probe_col == "id2" else "id2"
    out = top_k_per_group(
        pairs, [probe_col], [F.col(score_col).desc(), F.col(other).asc()], k
    )
    if threshold is not None:
        out = out.where(F.col(score_col) >= threshold)
    return out
