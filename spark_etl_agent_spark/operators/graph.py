"""Connected components over an undirected edge list — the clustering
step that turns near-duplicate *pairs* (MinHash/LSH, cosine, n-gram
Jaccard) into canonical duplicate *clusters* with one survivor each.

The reference has no graph operators (its only dedup is SELECT
DISTINCT, SURVEY.md §2.4 A3); at 100 TB corpus scale pairwise output is
unusable without this step — A~B and B~C must collapse into one
cluster {A,B,C} with a single keeper.

Algorithm: min-label propagation with pointer jumping. Every node
starts labeled with itself; each round every node adopts the smallest
label in its closed neighborhood (one hop), then adopts *its label's
label* (the pointer jump — label chains halve every round, the same
doubling that makes large-star/small-star O(log n)). Converged when no
label changes; a graph whose diameter exceeds what ``max_iters`` rounds
can cover raises instead of silently returning partially-propagated
labels. Rounds are pure DataFrame programs — shuffles on the node id —
and the label frame is localCheckpoint()ed every round to cut the
lineage (an iterative plan that re-derives round k from round 0
recompiles exponentially; checkpointing keeps each round O(E)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
    round_stats: list = None,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it: (node, component). Deterministic
    for any edge order and partitioning.

    The driver loop only inspects a single aggregate per round (the
    number of changed labels) — no edge or node data is ever collected.

    Raises ``RuntimeError`` if ``max_iters`` rounds exhaust without
    convergence: a partially-propagated labeling is silently *wrong*
    (it splits one true component into several), so it must never be
    returned. With pointer jumping a chain of length 2^max_iters still
    converges, so the cap only fires on genuinely pathological inputs.

    ``round_stats``, if given a list, receives one changed-label count
    per executed round — the observable the scale smoke gates on
    (rounds must grow ~logarithmically with the data, not linearly).
    """
    from pyspark import StorageLevel

    # the edge list is re-joined every round — persist it so an
    # expensive upstream (an LSH pair join, a Jaccard verify) runs once,
    # not once per round. Symmetrization is one explode over the single
    # edge scan, NOT a union of two projections: a union's branches are
    # distinct subtrees with no shared terminal exchange, so
    # materializing the persist would run the upstream pair pipeline
    # twice (guide §2.4; measured neutral at sf0.1, where stage reuse
    # hides the duplication, but the explode form cannot regress when
    # the upstream's exchanges are not reusable).
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint()

    try:
        for _ in range(max_iters):
            # hop 1: smallest label among each node's neighbors
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("component").alias("nbr_min"))
            )
            prop = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("_mid"),
            )
            # hop 2 (pointer jump): adopt the label OF the label. Labels
            # are always reachable node ids, so the lookup stays inside
            # the component; chains collapse geometrically — O(log
            # diameter) rounds where one-hop propagation is O(diameter).
            lookup = prop.select(
                F.col("node").alias("_c_node"), F.col("_mid").alias("_c_comp")
            )
            jumped = F.least(
                F.col("_mid"), F.coalesce(F.col("_c_comp"), F.col("_mid"))
            )
            # fold the convergence flag into the same pass: counting the
            # flag on the checkpointed frame is a narrow scan, where a
            # separate old-vs-new join would be one more shuffle per round
            new_labels = (
                prop.join(lookup, prop._mid == F.col("_c_node"), "left")
                .select(
                    "node",
                    jumped.alias("component"),
                    (jumped < F.col("_old")).alias("_changed"),
                )
                .localCheckpoint()
            )
            changed = new_labels.filter(F.col("_changed")).count()
            if round_stats is not None:
                round_stats.append(changed)
            labels = new_labels.drop("_changed")
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "partial labels would split true components — raise max_iters"
        )
    finally:
        sym.unpersist()


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


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal that separates "dense near-dup clique" from
    "chain of borderline pairs" in a dedup graph (a clique's members
    are safe to collapse; a long chain usually is not one document).

    The classic scale-safe formulation: orient every edge low→high id,
    join oriented edges on the middle vertex to enumerate wedges
    (a<b<c with a−b and b−c), then ONE equi-join against the oriented
    edge set to close each wedge — every triangle is found exactly
    once, no direction is enumerated twice, and the wedge fan-out is
    bounded by the ORIENTED degree (halved on average, and hub nodes
    only fan out toward higher ids). All joins are equi-joins on node
    ids; no cartesian anywhere.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = ab.join(bc, "b")
    closer = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tris = wedges.join(closer, ["a", "c"])
    per_corner = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(per_corner, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )
