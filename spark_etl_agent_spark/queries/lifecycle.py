"""Warehouse-lifecycle operator queries: SCD2 history build,
referential-integrity audit, equi-width histogram profiling.

These are the maintenance verbs around the reference's full-reload ETL
(``services/jcap_pa_etl_service.py``) re-expressed for a warehouse that
cannot afford reloads: keep dimension history (SCD2), gate loads on
relationship integrity, and profile distributions without collecting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.quality import referential_audit
from ..operators.scd import scd2_collapse
from ..operators.sketches import histogram
from .base import QuerySpec, load


def scd2_priority_history(spark, sf_dir):
    """SCD Type-2 collapse of each customer's order-priority attribute
    observed per order date (max() pre-aggregation makes (key, ts)
    unique, so runs are well-defined): one row per run of identical
    priority with [valid_from, valid_to) validity and is_current."""
    snap = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderpriority").alias("priority"))
    )
    return scd2_collapse(
        snap, keys=["o_custkey"], attrs=["priority"], ts="o_orderdate"
    )


SCD2_PRIORITY_HISTORY_SQL = """
WITH snap AS (
  SELECT o_custkey, o_orderdate AS ts, max(o_orderpriority) AS priority
  FROM orders GROUP BY 1, 2
),
starts AS (
  SELECT o_custkey, ts, priority
  FROM (
    SELECT o_custkey, ts, priority,
      (lag(ts) OVER w IS NULL
       OR priority IS DISTINCT FROM lag(priority) OVER w) AS is_start
    FROM snap WINDOW w AS (PARTITION BY o_custkey ORDER BY ts)
  ) WHERE is_start
)
SELECT o_custkey, priority, ts AS valid_from,
  lead(ts) OVER wv AS valid_to,
  (lead(ts) OVER wv IS NULL) AS is_current
FROM starts WINDOW wv AS (PARTITION BY o_custkey ORDER BY ts)
"""


def fk_integrity_audit(spark, sf_dir):
    """Referential-integrity load gate over the star schema: three real
    FK relations (expected clean) plus one deliberately degraded parent
    (every 10th part key removed) proving the orphan counter counts."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    events = load(spark, sf_dir, "events")
    degraded_part = part.filter(F.col("p_partkey") % 10 != 0)
    return referential_audit(
        [
            ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("orders->customer", orders, "o_custkey", customer, "c_custkey"),
            ("events->customer", events, "user_id", customer, "c_custkey"),
            ("lineitem->part_degraded", li, "l_partkey", degraded_part, "p_partkey"),
        ]
    )


FK_INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem->orders' AS relation, count(*) AS n_child_rows,
  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_fk,
  (SELECT count(*) FROM lineitem c WHERE c.l_orderkey IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM orders p WHERE p.o_orderkey = c.l_orderkey))
    AS n_orphans
FROM lineitem
UNION ALL
SELECT 'orders->customer', count(*),
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  (SELECT count(*) FROM orders c WHERE c.o_custkey IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey))
FROM orders
UNION ALL
SELECT 'events->customer', count(*),
  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  (SELECT count(*) FROM events c WHERE c.user_id IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.user_id))
FROM events
UNION ALL
SELECT 'lineitem->part_degraded', count(*),
  CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  (SELECT count(*) FROM lineitem c WHERE c.l_partkey IS NOT NULL
     AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.l_partkey
                       AND p.p_partkey % 10 <> 0))
FROM lineitem
"""


def retailprice_histogram(spark, sf_dir):
    """Equi-width 20-bucket histogram of part retail price — executor-
    side profiling (scalar min/max broadcast + one groupBy)."""
    return histogram(load(spark, sf_dir, "part"), value="p_retailprice", nbuckets=20)


RETAILPRICE_HISTOGRAM_SQL = """
WITH s AS (
  SELECT min(p_retailprice) AS mn, max(p_retailprice) AS mx FROM part
),
b AS (
  SELECT CAST(least(floor((p_retailprice - mn) / ((mx - mn) / 20.0)), 19) AS INT)
           AS bucket,
         mn, mx
  FROM part, s
)
SELECT bucket, count(*) AS n_rows,
  min(mn) + bucket * ((min(mx) - min(mn)) / 20.0) AS lo,
  min(mn) + (bucket + 1) * ((min(mx) - min(mn)) / 20.0) AS hi
FROM b GROUP BY bucket
"""


def key_skew_report(spark, sf_dir):
    """Skew diagnostics: the top-20 heaviest join/agg keys with their
    row share in parts-per-million — the report that decides whether a
    key needs salting (``operators/skew.py``) or AQE skew-join handling.
    Shape: one groupBy on the key, a broadcast scalar total, then a
    global top-k via sort+limit (TakeOrderedAndProject — bounded driver
    state, never a full sort at scale); rank is a window over the
    already-limited 20 rows. Share is floor(ppm) — integer-valued, so
    cross-engine deterministic."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(F.sum("n_rows").alias("_tot"))
    top = (
        counts.join(F.broadcast(tot))
        .select(
            "l_suppkey",
            "n_rows",
            F.floor(F.col("n_rows") * F.lit(1000000.0) / F.col("_tot"))
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy(F.col("n_rows").desc(), "l_suppkey")
        .limit(20)
    )
    # bounded: runs over the post-limit(20) frame only
    w = Window.orderBy(F.col("n_rows").desc(), "l_suppkey")
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


KEY_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(n_rows) AS t FROM counts),
top AS (
  SELECT l_suppkey, n_rows,
    CAST(FLOOR(n_rows * 1000000.0 / t) AS BIGINT) AS share_ppm
  FROM counts, tot
  ORDER BY n_rows DESC, l_suppkey
  LIMIT 20
)
SELECT l_suppkey, n_rows, share_ppm,
  CAST(row_number() OVER (ORDER BY n_rows DESC, l_suppkey) AS INT) AS rnk
FROM top
"""


def revenue_concentration(spark, sf_dir):
    """Pareto view: customers bucketed into revenue deciles, each
    decile's share of total revenue in ppm. The shape behind 'top 10% of
    customers drive X% of revenue'.

    Scale design — exact ntile WITHOUT a single-partition sort (at
    100 TB the per-customer aggregate is itself tens of millions of
    entities, so a global ``ntile().over(Window.orderBy(...))`` window
    is the bottleneck): ``operators.ranks.parallel_ntile`` — range
    partition + metadata offsets + parallel per-partition row_number →
    exact SQL bucket formula, hash-identical to the oracle's
    ``ntile(10)`` and partition-count independent."""
    from ..operators.ranks import parallel_ntile

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(14,4)")).alias("_rev")
    )
    deciled = parallel_ntile(
        per_cust, 10, [F.desc("_rev"), F.asc("o_custkey")], bucket_col="decile"
    )
    by_decile = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("_rev").alias("_drev"),
    )
    total = by_decile.agg(F.sum("_drev").alias("_tot"))
    return (
        by_decile.join(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.col("_drev").cast("decimal(20,4)").cast("double").alias("revenue"),
            F.floor(
                F.col("_drev").cast("double") * 1e6 / F.col("_tot").cast("double")
            ).cast("bigint").alias("share_ppm"),
        )
    )


REVENUE_CONCENTRATION_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS rev
  FROM orders GROUP BY o_custkey
),
deciled AS (
  SELECT o_custkey, rev,
    ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
  FROM per_cust
),
by_decile AS (
  SELECT decile, count(*) AS n_customers, SUM(rev) AS drev FROM deciled
  GROUP BY decile
),
total AS (SELECT SUM(drev) AS tot FROM by_decile)
SELECT decile, n_customers,
  CAST(CAST(drev AS DECIMAL(20,4)) AS DOUBLE) AS revenue,
  CAST(FLOOR(CAST(drev AS DOUBLE) * 1e6 / CAST(tot AS DOUBLE)) AS BIGINT)
    AS share_ppm
FROM by_decile, total
"""


def scd2_temporal_join(spark, sf_dir):
    """Point-in-time join: every order matched to the dimension row
    whose [valid_from, valid_to) interval covers its date — the read
    side of SCD2 (and the proof the history build is consistent: each
    fact matches EXACTLY one interval, so the totals reconcile). Shape:
    equi-join on the key with the range predicate as residual — one
    co-partitioned shuffle, no range explosion."""
    hist = scd2_priority_history(spark, sf_dir)
    orders = load(spark, sf_dir, "orders")
    cond = (
        (orders["o_custkey"] == hist["o_custkey"])
        & (orders["o_orderdate"] >= hist["valid_from"])
        & (hist["valid_to"].isNull() | (orders["o_orderdate"] < hist["valid_to"]))
    )
    return (
        orders.join(hist, cond)
        .groupBy(hist["priority"])
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SCD2_TEMPORAL_JOIN_SQL = (
    "WITH hist AS (" + SCD2_PRIORITY_HISTORY_SQL + ")\n"
    + """
SELECT h.priority, count(*) AS n_orders
FROM orders o JOIN hist h
  ON o.o_custkey = h.o_custkey
 AND o.o_orderdate >= h.valid_from
 AND (h.valid_to IS NULL OR o.o_orderdate < h.valid_to)
GROUP BY h.priority
"""
)


QUERIES = {
    "scd2_temporal_join": QuerySpec(
        "scd2_temporal_join", scd2_temporal_join, SCD2_TEMPORAL_JOIN_SQL,
        "Point-in-time join of facts onto SCD2 validity intervals",
        ("scd", "join", "operators"),
    ),
    "revenue_concentration": QuerySpec(
        "revenue_concentration", revenue_concentration,
        REVENUE_CONCENTRATION_SQL,
        "Pareto deciles: revenue share per customer decile (ppm)",
        ("agg", "window", "validation"),
    ),
    "key_skew_report": QuerySpec(
        "key_skew_report", key_skew_report, KEY_SKEW_REPORT_SQL,
        "Heavy-hitter key report (share in ppm) — the salting decision input",
        ("validation", "skew", "agg"),
    ),
    "scd2_priority_history": QuerySpec(
        "scd2_priority_history", scd2_priority_history, SCD2_PRIORITY_HISTORY_SQL,
        "SCD Type-2 gaps-and-islands collapse to validity intervals",
        ("scd", "window", "operators"),
    ),
    "fk_integrity_audit": QuerySpec(
        "fk_integrity_audit", fk_integrity_audit, FK_INTEGRITY_AUDIT_SQL,
        "Referential-integrity audit via anti-joins (load gate)",
        ("validation", "join", "operators"),
    ),
    "retailprice_histogram": QuerySpec(
        "retailprice_histogram", retailprice_histogram, RETAILPRICE_HISTOGRAM_SQL,
        "Equi-width histogram profile, executor-side only",
        ("agg", "validation", "operators"),
    ),
}
