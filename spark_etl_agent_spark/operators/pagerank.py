"""Integer-exact PageRank over an edge list — the graph-centrality
signal a web-scale corpus pipeline uses to weight documents by source
importance (the original use of PageRank: crawl prioritization and
per-domain quality priors for training-data selection).

The reference has no iterative or graph operators (SURVEY.md §2 — its
jobs are single-pass ETL); this is the second "loop of DataFrame
programs" shape next to :mod:`..llm.kmeans` and
:func:`.graph.connected_components`.

Scale design (the 100 TB story):

- The edge list is the big table; it is materialized ONCE and per
  round only the node-sized rank state ever moves. Below a counted
  node-total gate the rank frame is broadcast into each round's join
  (edges scanned map-side, no per-round exchange or sort on the E
  side); above it the edges are persisted hash-partitioned and sorted
  by ``src`` so every round's sort-merge join reuses the cached
  exchange AND ordering — either way, no round shuffles the edges.
- Per-source contributions are computed on the node-sized rank frame
  (one join with the degree table, both node-keyed), THEN joined to
  edges — the rank÷degree division happens N times, not E times.
- Each round ends in a checkpoint — round k's plan is O(E), not a
  re-derivation of rounds 0..k-1 (the lineage blow-up that makes naive
  iterative DataFrame loops recompile exponentially). The primitive is
  mode-selected: ``localCheckpoint`` (executor block storage — the
  local-mode fast path) or reliable FS ``checkpoint`` (the cluster
  posture: survives executor loss; see :func:`_resolve_checkpointer`).
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

from typing import Callable, Optional

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _resolve_checkpointer(
    spark: SparkSession,
    checkpoint_mode: str,
    checkpoint_dir: Optional[str],
) -> Callable[..., DataFrame]:
    """Pick the lineage-truncation primitive for the loop.

    ``local`` — ``localCheckpoint``: blocks live in executor block
    storage. Fast (no FS round-trip) but NOT fault-tolerant: on a real
    cluster a single lost executor drops its blocks and the truncated
    lineage cannot recompute them — the job dies mid-iteration. Only
    safe where executors can't die independently of the app (local
    mode's single JVM).

    ``reliable`` — ``DataFrame.checkpoint``: blocks go to the
    SparkContext checkpoint directory (warehouse/HDFS/S3 FS), so a
    round survives any executor loss and recovery re-reads the files.
    This is the 1000-executor posture; it pays one FS write per
    checkpointed round, amortized over the O(E) work of each round.

    ``auto`` — ``reliable`` when the master is a real cluster,
    ``local`` on ``local[*]``.
    """
    master = spark.sparkContext.master
    if checkpoint_mode == "auto":
        checkpoint_mode = "local" if master.startswith("local") else "reliable"
    if checkpoint_mode == "local":
        return lambda df, eager=True: df.localCheckpoint(eager=eager)
    if checkpoint_mode != "reliable":
        raise ValueError(
            f"checkpoint_mode must be auto|local|reliable, got {checkpoint_mode!r}"
        )
    sc = spark.sparkContext
    if checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
    elif sc._jsc.sc().getCheckpointDir().isEmpty():
        raise ValueError(
            "pagerank(checkpoint_mode='reliable') needs a checkpoint "
            "directory: pass checkpoint_dir= or call "
            "spark.sparkContext.setCheckpointDir() with a warehouse-FS "
            "path first (executor-local checkpoints are not "
            "fault-tolerant at cluster scale)"
        )
    return lambda df, eager=True: df.checkpoint(eager=eager)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    teleport_micro: int = 150_000,
    damping_pm: int = 850,
    checkpoint_every: int = 2,
    checkpoint_mode: str = "auto",
    checkpoint_dir: Optional[str] = None,
    symmetric: bool = False,
    max_broadcast_nodes: int = 4_000_000,
    n_nodes_hint: Optional[int] = None,
) -> DataFrame:
    """Run ``iters`` integer PageRank rounds over the directed edge
    list and return ``(node, degree, rank_micro)`` for every node that
    appears as a source (for an undirected graph pass the symmetric
    edge list — every node then has out-degree ≥ 1 and no mass dangles).

    Deterministic for any edge order, partition count, engine, and
    join strategy: int64 algebra only (see module docstring), so the
    broadcast/shuffle choice below can never change a value.

    Two physical round shapes, gated on the node total — either a
    caller-supplied UPPER BOUND (``n_nodes_hint``, e.g. parquet footer
    row counts of the id-space dimensions: zero Spark jobs, the whole
    build stays lazy until the terminal action; an over-estimate only
    flips to the always-safe sort-merge path) or, without a hint, one
    COUNTED node-sized action at setup (the only scalar the driver
    ever reads):

    - ``n_nodes ≤ max_broadcast_nodes`` — the rank frame is broadcast
      into each round's join. The edge list is then scanned purely
      map-side (no sort, no exchange on the E side, partial aggregation
      before the node-keyed shuffle), so a round costs one cached-scan
      + one node-sized exchange. The default gate (4M nodes ≈ tens of
      MB hashed) keeps the broadcast well under executor memory; the
      rank frame is node-sized by construction, never data-sized.
    - larger graphs — the rank frame is the shuffled side of a
      sort-merge join against the edge list persisted hash-partitioned
      AND sorted by ``src`` (``sortWithinPartitions`` makes the cached
      scan advertise the SMJ's required ordering, so no round ever
      re-sorts the E side); only the node-sized contributions shuffle
      per round. This is the 100 TB posture: nothing node-count-sized
      is ever collected or broadcast.

    Cache lifetime: the edge list stays persisted (it backs every round
    of the returned lazy-checkpoint chain, so it cannot be released
    here); callers that loop pagerank in a long-lived session release
    it with their scoped cache sweep (the bench harness idiom) or
    ``spark.catalog.clearCache()`` at a job boundary.

    Fault tolerance: ``checkpoint_mode`` picks between the local-mode
    fast path (``localCheckpoint``, executor block storage) and the
    cluster posture (``reliable``: FS checkpoints under
    ``checkpoint_dir`` that survive executor loss). The default
    ``auto`` resolves by master — see :func:`_resolve_checkpointer`.

    ``symmetric=True`` declares that the edge list is symmetric (every
    node with out-edges also has in-edges — the undirected encoding).
    Then in-degree == out-degree per node, so the degree a round needs
    is rebuilt as the GROUP COUNT inside its own aggregation (every
    source node has a rank row, so the inner contrib join keeps every
    in-edge and ``count(*)`` per destination IS its degree) — the edge
    list never carries a degree column into the loop at all. Only the
    fused round 1 reads a degree (``src_degree`` for the constant
    round-1 contribution): below the gate it is a broadcast-hash probe
    on the cached scan; above it a node-sized join that rides the
    sort-merge layout's one src-keyed exchange. On a directed graph
    this would silently drop source-only nodes (no in-edges → no
    aggregation row → their next-round contribution vanishes), so it
    must stay opt-in.

    ``n_nodes_hint`` is an UPPER bound contract: over-estimates are
    always safe (they can only flip to the sort-merge path, which is
    correct at any size), but an UNDER-estimate on a huge graph would
    wrongly broadcast a bigger-than-memory rank frame — callers must
    derive the hint from something that cannot under-count (e.g.
    parquet footer row counts of the id-space dimension tables).
    """
    spark = edges.sparkSession
    # Partition the loop state by the SESSION's shuffle partitioning,
    # not defaultParallelism: the shuffle conf is sized to the data
    # (the session contract sizes it to ~64 MB reduce partitions at any
    # scale), while core count is a machine property — on a small input
    # a core-count fan-out just multiplies per-stage task-scheduling
    # floor across every one of the loop's ~2·iters stages.
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ckpt = _resolve_checkpointer(spark, checkpoint_mode, checkpoint_dir)

    # Collapse the (possibly deep) upstream plan to an RDD leaf FIRST
    # (every round's compile re-traverses the full analyzed plan
    # otherwise — measured as the dominant driver cost of the loop).
    # Checkpoint semantics under AQE (measured, not assumed): even
    # localCheckpoint(eager=False) materializes the subplan's query
    # stages, because AdaptiveSparkPlanExec.execute() must run its
    # exchanges to pick the final plan — so every checkpoint is a real
    # execution, and checkpoint cadence IS the loop's cost knob.
    if symmetric:
        # Setup profile (scripts/pagerank_profile.py, sf0.1): the loop's
        # rounds are nearly free (~0.07 s marginal each) — the wall is
        # SETUP, so the setup must shuffle the edge list as little as
        # possible. Materialize the PLAIN edge list once (job 1), build
        # the node-sized degree table off the cached scan (in-degree ==
        # out-degree by the symmetric contract), and read the broadcast
        # gate off ITS count (job 2). The loop's rounds need no degree
        # column on the edges at all (degree is rebuilt as the group
        # count — see the round loop); only the fused round 1 reads
        # ``src_degree``, attached below the gate as a broadcast-hash
        # probe on the cached scan and above it as a node-sized join
        # aligned with the sort-merge layout's single src-keyed
        # exchange — so the big-graph path pays exactly ONE full-edge
        # exchange at setup (the src repartition), not a dst annotate
        # exchange plus the src repartition.
        # Gate source: a caller-supplied UPPER BOUND on the node count
        # (e.g. parquet footer row counts of the dimension tables —
        # zero Spark jobs) keeps the ENTIRE build lazy: nothing
        # executes until the caller's terminal action, so an
        # orchestrator can overlap this plan's construction with other
        # running work. An over-estimate only flips to the sort-merge
        # path (safe, never wrong). Without a hint, the gate COUNTS
        # the degree table — one node-sized action, and the setup
        # becomes eager at build time.
        lazy_build = n_nodes_hint is not None
        e_plain = ckpt(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
            eager=not lazy_build,
        )
        deg = ckpt(
            e_plain.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).cast("long").alias("degree")
            ),
            eager=False,
        )
        n_nodes = (
            int(n_nodes_hint) if lazy_build else deg.count()
        )
        use_broadcast = n_nodes <= int(max_broadcast_nodes)
        ds = deg.select(
            F.col("node").alias("__sn"), F.col("degree").alias("src_degree")
        )
        if use_broadcast:
            e = e_plain
            e1 = e_plain.join(
                F.broadcast(ds), F.col("src") == F.col("__sn")
            ).drop("__sn")
        else:
            # ONE full-edge exchange: hash-partition + sort the plain
            # edges by src (the layout every round's contrib join
            # reuses). The round-1 degree annotate is then a NODE-sized
            # join aligned with this layout — it never exchanges the
            # edge side.
            e = (
                e_plain.repartition(npart, "src")
                .sortWithinPartitions("src")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            e1 = e.join(ds, F.col("src") == F.col("__sn")).drop("__sn")
        # Fused round 1 (symmetric + uniform init): round-1
        # contributions are the CONSTANT ``init div deg(u)``, so node
        # v's inbound sum is ``sum(init div src_degree)`` over its
        # in-edges grouped on ``dst``, and its degree is the group
        # count (in-degree == out-degree by the symmetric contract).
        # One aggregation replaces the rank init AND round 1's join.
        # (A directed graph can't do this: in-degree ≠ out-degree and
        # source-only nodes have no group.)
        if iters >= 1:
            ranks = ckpt(
                e1.groupBy(F.col("dst").alias("node")).agg(
                    F.count(F.lit(1)).alias("degree"),
                    (
                        F.lit(int(teleport_micro))
                        + F.expr(
                            f"({int(damping_pm)} * sum(1000000 div "
                            "src_degree)) div 1000"
                        )
                    ).cast("long").alias("rank_micro"),
                ),
                eager=False,
            )
        else:
            ranks = deg.select(
                "node",
                "degree",
                F.lit(int(1_000_000)).cast("long").alias("rank_micro"),
            )
        start_iter = 1
    else:
        e = ckpt(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
            eager=n_nodes_hint is None,
        )
        deg = ckpt(
            e.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).alias("degree")
            ),
            eager=False,
        )
        ranks = ckpt(
            deg.select(
                "node",
                "degree",
                F.lit(int(1_000_000)).cast("long").alias("rank_micro"),
            ),
            eager=False,
        )
        start_iter = 0

    # The broadcast gate on the directed path: the node count read off
    # the degree checkpoint the loop needs materialized anyway. (The
    # symmetric path gated above, before annotation, so the annotate
    # strategy itself could be gate-dependent.) Only the big-graph
    # sort-merge path pays the repartition + persist re-shape.
    if not symmetric:
        n_nodes = (
            int(n_nodes_hint) if n_nodes_hint is not None else deg.count()
        )
        use_broadcast = n_nodes <= int(max_broadcast_nodes)
        if not use_broadcast:
            e = (
                e.repartition(npart, "src")
                .sortWithinPartitions("src")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )

    # the rank frame CARRIES the (static) degree so each round needs no
    # ranks⋈deg join — per round: one node-sized projection (rank ÷
    # degree), the edges⋈contrib join, one groupBy(dst), and — directed
    # graphs only — one node-sized deg⋈inbound join to rebuild the
    # carried degree (the symmetric path rebuilds it inside the
    # aggregation instead).
    for it in range(start_iter, iters):
        # node-sized: rank ÷ degree once per node, not once per edge
        contrib = ranks.select(
            "node",
            F.expr("rank_micro div degree").cast("long").alias("contrib"),
        )
        if use_broadcast:
            contrib = F.broadcast(contrib)
        if symmetric:
            # degree rebuilt as the group count: every source node has
            # a rank row (round outputs cover all nodes on a symmetric
            # graph), so the inner join keeps every in-edge and
            # count(*) per dst == in-degree == degree. The edges carry
            # no degree column — the cached scan is the PLAIN edge
            # list on both gate paths.
            ranks = (
                e.join(contrib, e.src == contrib.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.count(F.lit(1)).alias("degree"),
                    (
                        F.lit(int(teleport_micro))
                        + F.expr(
                            f"({int(damping_pm)} * sum(contrib)) div 1000"
                        )
                    ).cast("long").alias("rank_micro"),
                )
            )
        else:
            inbound = (
                e.join(contrib, e.src == contrib.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("contrib").alias("acc"))
            )
            if use_broadcast:
                inbound = F.broadcast(inbound)
            ranks = deg.join(inbound, "node", "left").select(
                "node",
                "degree",
                (
                    F.lit(int(teleport_micro))
                    + F.expr(
                        f"({int(damping_pm)} * coalesce(acc, 0L)) div 1000"
                    )
                ).cast("long").alias("rank_micro"),
            )
        # checkpoint every k rounds: each lazy checkpoint still pays a
        # full physical compile (df → RDD) at build time, so a
        # per-round checkpoint makes the DRIVER cost quadratic-ish in
        # rounds; every-other-round halves the compiles while keeping
        # lineage depth (and thus each compile) bounded at k rounds.
        # Each rank frame is consumed exactly once (by the next round's
        # join — in broadcast mode, by its broadcast build), so a
        # k-deep unckeckpointed chain never re-executes a round.
        # The LAST round is deliberately not forced: the caller's
        # terminal action consumes a ≤k-round lineage directly, saving
        # one materialization job per run.
        if (it + 1) % max(1, checkpoint_every) == 0 and it != iters - 1:
            ranks = ckpt(ranks, eager=False)

    return ranks.select("node", "degree", "rank_micro")
