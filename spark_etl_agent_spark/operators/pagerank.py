"""Integer-exact PageRank over an edge list — the graph-centrality
signal a web-scale corpus pipeline uses to weight documents by source
importance (the original use of PageRank: crawl prioritization and
per-domain quality priors for training-data selection).

The reference has no iterative or graph operators (SURVEY.md §2 — its
jobs are single-pass ETL); this is the second "loop of DataFrame
programs" shape next to :mod:`..llm.kmeans` and
:func:`.graph.connected_components`.

Scale design (the 100 TB story):

- The edge list is the big table; it is persisted ONCE with a hash
  partitioning on ``src``, so every round's edges⋈contributions join
  reuses the cached exchange — per round only the node-sized rank
  table shuffles, never the edges.
- Per-source contributions are computed on the node-sized rank frame
  (one join with the degree table, both node-keyed), THEN joined to
  edges — the rank÷degree division happens N times, not E times.
- Each round ends in ``localCheckpoint()`` — round k's plan is O(E),
  not a re-derivation of rounds 0..k-1 (the lineage blow-up that makes
  naive iterative DataFrame loops recompile exponentially).
- The driver never sees a data row; the loop is a fixed ``iters``
  count with no convergence collect (rank deltas at a fixed iteration
  count are deterministic, so there is nothing to poll).

Cross-engine determinism (the DuckDB oracle unrolls the identical
rounds as chained CTEs): all arithmetic is int64 —

- ranks are integer micro-units (node starts at 1,000,000);
- a node's per-edge contribution is ``rank div outdeg`` (integer
  division, exact in both engines for non-negative operands);
- the damped update is ``teleport_micro + (damping_pm · Σcontrib)
  div 1000`` — again pure int64.

Sums of integers are order- and partitioning-independent, so Spark and
the oracle agree bit-for-bit at any parallelism. Mass lost to integer
truncation (and to dangling nodes, if the caller passes a graph that
has them) is NOT redistributed — both engines drop it identically,
which keeps the algebra one join simpler; ranks remain a strict
centrality order, just not a probability simplex.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    teleport_micro: int = 150_000,
    damping_pm: int = 850,
) -> DataFrame:
    """Run ``iters`` integer PageRank rounds over the directed edge
    list and return ``(node, degree, rank_micro)`` for every node that
    appears as a source (for an undirected graph pass the symmetric
    edge list — every node then has out-degree ≥ 1 and no mass dangles).

    Deterministic for any edge order, partition count, and engine:
    int64 algebra only (see module docstring).

    Cache lifetime: the symmetric edge list stays persisted (it backs
    every round of the returned lazy-checkpoint chain, so it cannot be
    released here); callers that loop pagerank in a long-lived session
    release it with their scoped cache sweep (the bench harness idiom)
    or ``spark.catalog.clearCache()`` at a job boundary.
    """
    spark = edges.sparkSession
    npart = spark.sparkContext.defaultParallelism

    # One shuffle of the big table, reused by every round: persist the
    # edge list hash-partitioned on src so the per-round join against
    # per-source contributions lines up with the cached exchange.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(npart, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # checkpoints are LAZY: they still truncate lineage (each round's
    # plan is O(E), materialized the first time it is needed), but the
    # driver does not run one blocking job per round — on a local/bench
    # run that removes ~18 scheduler round-trips; on a cluster the
    # rounds pipeline into the final action's stage DAG.
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )

    ranks = deg.select(
        "node", F.lit(int(1_000_000)).cast("long").alias("rank_micro")
    ).localCheckpoint(eager=False)

    for _ in range(iters):
        # node-sized: rank ÷ degree once per node, not once per edge
        contrib = (
            ranks.join(deg, "node")
            .select(
                "node",
                F.expr("rank_micro div degree").cast("long").alias("contrib"),
            )
        )
        inbound = (
            e.join(contrib, e.src == contrib.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("acc"))
        )
        ranks = (
            deg.join(inbound, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(teleport_micro))
                    + F.expr(
                        f"({int(damping_pm)} * coalesce(acc, 0L)) div 1000"
                    )
                ).cast("long").alias("rank_micro"),
            )
            .localCheckpoint(eager=False)
        )

    return ranks.join(deg, "node").select("node", "degree", "rank_micro")
