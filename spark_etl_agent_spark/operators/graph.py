"""Connected components over an undirected edge list — the clustering
step that turns near-duplicate *pairs* (MinHash/LSH, cosine, n-gram
Jaccard) into canonical duplicate *clusters* with one survivor each.

The reference has no graph operators (its only dedup is SELECT
DISTINCT, SURVEY.md §2.4 A3); at 100 TB corpus scale pairwise output is
unusable without this step — A~B and B~C must collapse into one
cluster {A,B,C} with a single keeper.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node adopts the smallest label in its
closed neighborhood; converged when no label changes. Rounds are pure
DataFrame programs — one shuffle per round on the node id — and the
label frame is localCheckpoint()ed every round to cut the lineage (an
iterative plan that re-derives round k from round 0 recompiles
exponentially; checkpointing keeps each round O(E)). Round count is
bounded by the graph diameter — O(log n) for the short chains dedup
produces in practice; ``max_iters`` guards pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it: (node, component). Deterministic
    for any edge order and partitioning.

    The driver loop only inspects a single aggregate per round (the
    number of changed labels) — no edge or node data is ever collected.
    """
    from pyspark import StorageLevel

    # the edge list is re-joined every round — persist it so an
    # expensive upstream (an LSH pair join, a Jaccard verify) runs once,
    # not once per round
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()

    try:
        for _ in range(max_iters):
            # smallest label among each node's neighbors
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("component").alias("nbr_min"))
            )
            # fold the convergence flag into the same pass: counting the
            # flag on the checkpointed frame is a narrow scan, where a
            # separate old-vs-new join would be one more shuffle per round
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("nbr_min", F.col("component"))
                    ).alias("component"),
                    F.coalesce(
                        F.col("nbr_min") < F.col("component"), F.lit(False)
                    ).alias("_changed"),
                )
                .localCheckpoint()
            )
            changed = new_labels.filter(F.col("_changed")).count()
            labels = new_labels.drop("_changed")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels


def dedup_clusters(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Cluster near-duplicate pairs into components and summarize each:
    (component = keeper id, n_members, members dropped = n_members - 1).
    Feed any pair-producing dedup stage in; survivors of the corpus are
    every doc not listed plus each cluster's keeper."""
    cc = connected_components(edges, src, dst, max_iters)
    return cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )
