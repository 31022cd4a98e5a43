"""Union-find connected components as iterative DataFrame self-joins.

The reference leaves duplicate *resolution* as future work (README.md:7 —
matches stay pairwise); the north_rule requires transitive clustering. We
use min-label propagation with pointer jumping (a DataFrame rendering of
hash-to-min, cf. Kiveris et al. "Connected Components in MapReduce and
Beyond" and PAPERS.md "BTS: Load-Balanced Distributed Union-Find",
ICDE 2024): each iteration every node adopts the min label in its
neighborhood, then labels are compressed by one pointer-jump
(label ← label(label)) — convergence in O(log diameter) rounds.

Scale design: each iteration is two shuffles (groupBy min + join); the
frontier DataFrame is checkpointed every round to cut lineage (the
north_rule's "checkpointed frontiers"), convergence is detected by an
order-insensitive label-set checksum, and an iteration cap guards
pathological inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_deduplication_hack_main_spark.config import DedupConfig


def _checksum(labels: DataFrame) -> int:
    row = labels.select(
        F.sum(F.xxhash64("node", "label").cast("decimal(38,0)")).alias("c"),
        F.count("*").alias("n"),
    ).collect()[0]
    return hash((str(row["c"]), row["n"]))


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    config: DedupConfig | None = None,
    use_reliable_checkpoint: bool = False,
) -> DataFrame:
    """(node, cluster_id): cluster_id = min node id in the component.

    edges: (id1, id2) distinct undirected pairs. vertices: optional (id)
    universe — isolated vertices become singleton clusters.
    Works for any orderable id type (string urls or bigint doc ids).
    """
    config = config or DedupConfig()
    def ckpt(df: DataFrame) -> DataFrame:
        if use_reliable_checkpoint:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    sym = ckpt(
        edges.select(F.col("id1").alias("src"), F.col("id2").alias("dst"))
        .unionByName(
            edges.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
        )
        .distinct()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    if vertices is not None:
        nodes = nodes.unionByName(
            vertices.toDF("node").select("node")
        ).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))

    labels = ckpt(labels)
    prev = _checksum(labels)
    for _ in range(config.max_cc_iterations):
        # 1. min label among neighbors
        neigh = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("dst", "node")
        )
        merged = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # 2. pointer jump: label ← label(label)
        parent = merged.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = (
            merged.join(parent, merged["label"] == parent["p_node"], "left")
            .select(
                "node", F.coalesce("p_label", "label").alias("label")
            )
        )
        labels = ckpt(jumped)
        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in "
            f"{config.max_cc_iterations} iterations"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    return assignments.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))


# --- DuckDB oracle (recursive CTE transitive closure — fine at test scale,
# never used at scale) -----------------------------------------------------


def sql_connected_components(edges_cte: str, vertices_cte: str) -> str:
    """DuckDB SELECT (node, cluster_id) given CTE SQL for edges (id1, id2)
    and vertices (id)."""
    return f"""
WITH _e AS ({edges_cte}),
_v AS ({vertices_cte}),
_sym AS (
  SELECT id1 AS src, id2 AS dst FROM _e
  UNION SELECT id2, id1 FROM _e
  UNION SELECT id, id FROM _v
),
_reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT src, dst FROM _sym
    UNION
    SELECT r.node, s.dst FROM r JOIN _sym s ON r.lbl = s.src
  )
  SELECT * FROM r
)
SELECT node, min(lbl) AS cluster_id FROM _reach GROUP BY node
"""
