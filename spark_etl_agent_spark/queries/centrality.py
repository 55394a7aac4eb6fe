"""Graph-centrality inventory: integer-exact PageRank over the
customer↔supplier order graph (:mod:`..operators.pagerank`).

Why this operator exists in a corpus engine: PageRank's original job
was exactly the 100 TB training-data problem — rank sources in a huge
graph so crawling/selection can prioritize them. The testdata has no
web graph, so the query exercises the operator on the bipartite
customer↔supplier graph induced by orders×lineitem (same shape: huge
edge list, node-sized rank state, fixed damped-iteration algebra).

The DuckDB oracle unrolls the identical six integer rounds as chained
CTEs (the :mod:`.similarity` k-means / :mod:`..llm.bpe` idiom) — the
iterative Spark loop must land on the same int64 fixpoint prefix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.pagerank import pagerank
from .base import QuerySpec, load

N_ROUNDS = 6


def _node_bound(sf_dir):
    """Upper bound on the graph's node count from parquet FOOTER
    metadata (|customer| + |supplier| ≥ customers-with-orders +
    suppliers-with-lineitems) — zero Spark jobs, so the pagerank build
    stays fully lazy and the loop's work is charged to this query's own
    execution, not smeared over a neighbor's. Falls back to the
    operator's counted gate if the footers aren't readable."""
    try:
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata.num_rows
            for t in ("customer", "supplier")
        )
    except Exception:
        return None


def supplier_pagerank(spark, sf_dir):
    """Top-20 suppliers by integer PageRank over the undirected
    customer↔supplier graph. Node encoding: customer → 2·custkey,
    supplier → 2·suppkey+1 (disjoint integer id spaces, no strings on
    the shuffle key)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    pr = pagerank(
        edges,
        iters=N_ROUNDS,
        symmetric=True,
        n_nodes_hint=_node_bound(sf_dir),
        # one checkpoint (the fused round 1) for this 6-round loop:
        # lineage stays <= 5 rounds — well inside compile bounds — and
        # each mid-loop checkpoint costs a full AQE stage
        # materialization (measured: cadence 6 is ~0.6s faster than 2
        # at sf0.1, values identical; operators keep the default 2 for
        # deeper loops)
        checkpoint_every=N_ROUNDS,
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        pr.join(
            F.broadcast(supplier), pr.node == F.col("s_suppkey") * 2 + 1
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "degree",
            "rank_micro",
        )
        .orderBy(F.desc("rank_micro"), "suppkey")
        .limit(20)
    )


def _pagerank_round_sql(i: int) -> str:
    """One unrolled integer PageRank round: per-node contribution
    (integer division by degree), edge fan-out + inbound sum, damped
    int64 update."""
    return f"""
c{i} AS (
  SELECT r.node, r.rank_micro // d.degree AS contrib
  FROM r{i} r JOIN deg d ON d.node = r.node
),
r{i + 1} AS (
  SELECT d.node,
    CAST(150000 + (850 * COALESCE(s.acc, 0)) // 1000 AS BIGINT) AS rank_micro
  FROM deg d LEFT JOIN (
    SELECT e.dst AS node, SUM(c.contrib) AS acc
    FROM edges e JOIN c{i} c ON c.node = e.src
    GROUP BY e.dst
  ) s ON s.node = d.node
)"""


SUPPLIER_PAGERANK_SQL = (
    """
WITH pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM deg),
"""
    + ",".join(_pagerank_round_sql(i) for i in range(N_ROUNDS))
    + f"""
SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
  d.degree AS degree, r.rank_micro AS rank_micro
FROM r{N_ROUNDS} r
JOIN deg d ON d.node = r.node
JOIN supplier s ON r.node = s.s_suppkey * 2 + 1
ORDER BY rank_micro DESC, suppkey
LIMIT 20
"""
)


QUERIES = {
    "supplier_pagerank": QuerySpec(
        "supplier_pagerank",
        supplier_pagerank,
        SUPPLIER_PAGERANK_SQL,
        "Integer-exact PageRank over the customer↔supplier order graph "
        "(6 damped rounds, unrolled-CTE oracle)",
        ("graph", "iterative", "llm"),
    ),
}
