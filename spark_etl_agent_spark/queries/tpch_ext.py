"""Second wave of TPC-H analytic shapes (Q2/Q4/Q11/Q15/Q21 analogs;
Q18/Q22 shapes already live in queries/subqueries.py), adapted to the testdata schema (no ``partsupp``, no
commit/receipt dates, no phone column — each shape keeps its *relational
pattern* and re-anchors the predicate on columns that exist).

Scale posture notes per query are inline; the common rules: dimension
sides broadcast, fact tables shuffle once per aggregation key,
correlated subqueries are decorrelated into aggregate-then-rejoin (the
rewrite Catalyst itself applies), and scalar subqueries become broadcast
single-row joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import QuerySpec, dec, load

def _rev():
    # built lazily: Column construction needs an active SparkContext
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6)
    )
REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


def min_cost_supplier(spark, sf_dir):
    """Q2 shape (correlated MIN): for every part, the supplier(s) that
    shipped it at the minimum unit price. The correlated
    ``= (SELECT min(..) WHERE same part)`` decorrelates into a per-part
    min aggregate re-joined to the detail rows — one shuffle on
    l_partkey for the agg, and the re-join reuses that partitioning.
    Unit price is one IEEE division of raw columns, identical in any
    engine, so the equality filter is exact."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    min_price = li.groupBy("l_partkey").agg(F.min("unit_price").alias("min_unit_price"))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(min_price, "l_partkey")
        .filter(F.col("unit_price") == F.col("min_unit_price"))
        .select("l_partkey", "l_suppkey", "min_unit_price")
        .distinct()
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            "min_unit_price",
        )
    )


MIN_COST_SUPPLIER_SQL = """
WITH li AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
),
mins AS (
  SELECT l_partkey, min(unit_price) AS min_unit_price FROM li GROUP BY l_partkey
)
SELECT DISTINCT li.l_partkey AS p_partkey, li.l_suppkey AS s_suppkey,
  s_name, min_unit_price
FROM li
JOIN mins ON li.l_partkey = mins.l_partkey AND li.unit_price = mins.min_unit_price
JOIN supplier ON li.l_suppkey = s_suppkey
"""


def exists_returned_orders(spark, sf_dir):
    """Q4 shape (EXISTS): order counts per priority for orders with at
    least one returned line. The EXISTS is a left-semi join — no
    row duplication however many lines match, and Catalyst pushes the
    returnflag filter into the lineitem scan."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


EXISTS_RETURNED_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority
"""


def revenue_share_parts(spark, sf_dir):
    """Q11 shape (group-share threshold via scalar subquery): parts
    whose revenue exceeds 1.5× the average per-part revenue. The
    threshold is *relative* (rev·n > 1.5·total, exact decimal products
    on both sides — no division) so the result is non-empty at every
    scale factor, unlike Q11's fixed fraction which silently empties as
    the group count grows. The scalar (total, n) aggregate is a
    single-row broadcast against the per-part aggregate — no second
    pass over the fact table."""
    li = load(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(_rev()).cast("decimal(19,8)").alias("_rev")
    )
    total = part_rev.agg(
        F.sum("_rev").cast("decimal(21,8)").alias("_total"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("_n"),
    )
    return (
        part_rev.crossJoin(F.broadcast(total))
        .filter(
            F.col("_rev") * F.col("_n")
            > F.lit(1.5).cast("decimal(2,1)") * F.col("_total")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_rev").cast("decimal(18,4)").cast("double").alias("part_revenue"),
        )
    )


REVENUE_SHARE_PARTS_SQL = f"""
WITH part_rev AS (
  SELECT l_partkey, CAST(SUM({REV_SQL}) AS DECIMAL(19,8)) AS _rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey,
  CAST(CAST(_rev AS DECIMAL(18,4)) AS DOUBLE) AS part_revenue
FROM part_rev
WHERE _rev * (SELECT CAST(count(*) AS DECIMAL(10,0)) FROM part_rev)
    > CAST(1.5 AS DECIMAL(2,1))
      * (SELECT CAST(SUM(_rev) AS DECIMAL(21,8)) FROM part_rev)
"""


def top_supplier_quarter(spark, sf_dir):
    """Q15 shape (view + global max): supplier(s) with the maximum
    revenue in 1996Q1. The revenue "view" is one grouped aggregate; the
    max is a single-row broadcast joined back with an exact decimal
    equality (ties all kept, like the spec)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    supp_rev = li.groupBy("l_suppkey").agg(
        F.sum(_rev()).cast("decimal(19,8)").alias("_rev")
    )
    best = supp_rev.agg(F.max("_rev").alias("_best"))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp_rev.crossJoin(F.broadcast(best))
        .filter(F.col("_rev") == F.col("_best"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("decimal(18,4)").cast("double").alias("total_revenue"),
        )
    )


TOP_SUPPLIER_QUARTER_SQL = f"""
WITH supp_rev AS (
  SELECT l_suppkey, CAST(SUM({REV_SQL}) AS DECIMAL(19,8)) AS _rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
  CAST(CAST(_rev AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
FROM supp_rev
JOIN supplier ON l_suppkey = s_suppkey
WHERE _rev = (SELECT max(_rev) FROM supp_rev)
"""


def lone_returner_suppliers(spark, sf_dir):
    """Q21 shape (EXISTS + NOT EXISTS double correlation): suppliers who
    were the *only* supplier with returned lines in a multi-supplier
    order, counted per supplier. The two correlated EXISTS decorrelate
    into one per-order aggregate — distinct-supplier count and
    distinct-returning-supplier count — instead of two correlated
    probes per row (the scalable plan at any size).

    The two distinct counts are computed dedup-first: a pre-aggregate
    to (order, supplier, any-R) rows, then plain counts per order.
    Multiple ``countDistinct`` in one agg would plan an Expand (3× the
    fact rows through the shuffle); dedup-first shrinks the data at the
    first shuffle instead — the difference between 3×100 TB and
    ~distinct-pairs through the wire."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("_has_r")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum("_has_r").alias("_n_ret"),
        F.max(F.when(F.col("_has_r") == 1, F.col("l_suppkey"))).alias("_ret_supp"),
    )
    lone = per_order.filter((F.col("_n_supp") >= 2) & (F.col("_n_ret") == 1))
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lone.groupBy("_ret_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("_ret_supp") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


LONE_RETURNER_SUPPLIERS_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS _n_supp,
    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS _n_ret,
    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS _ret_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON _ret_supp = s_suppkey
WHERE _n_supp >= 2 AND _n_ret = 1
GROUP BY s_suppkey, s_name
"""


QUERIES = {
    "min_cost_supplier": QuerySpec(
        "min_cost_supplier", min_cost_supplier, MIN_COST_SUPPLIER_SQL,
        "Per-part minimum-unit-price supplier(s) (TPC-H Q2 shape)",
        ("join", "agg", "subquery"),
    ),
    "exists_returned_orders": QuerySpec(
        "exists_returned_orders", exists_returned_orders,
        EXISTS_RETURNED_ORDERS_SQL,
        "Priority counts of orders with returned lines (TPC-H Q4 shape)",
        ("join", "agg", "subquery"),
    ),
    "revenue_share_parts": QuerySpec(
        "revenue_share_parts", revenue_share_parts, REVENUE_SHARE_PARTS_SQL,
        "Parts above 0.1% of total revenue (TPC-H Q11 shape)",
        ("agg", "subquery"),
    ),
    "top_supplier_quarter": QuerySpec(
        "top_supplier_quarter", top_supplier_quarter, TOP_SUPPLIER_QUARTER_SQL,
        "Max-revenue supplier(s) for 1996Q1 (TPC-H Q15 shape)",
        ("join", "agg", "subquery"),
    ),
    "lone_returner_suppliers": QuerySpec(
        "lone_returner_suppliers", lone_returner_suppliers,
        LONE_RETURNER_SUPPLIERS_SQL,
        "Sole returned-line supplier per multi-supplier order (TPC-H Q21 shape)",
        ("join", "agg", "subquery"),
    ),
}
