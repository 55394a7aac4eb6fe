"""Multi-join analytic shapes (TPC-H Q7/Q8/Q17/Q19 without ``partsupp``):
bidirectional nation-pair volume, market share with conditional shares,
correlated per-group average filter, and disjunctive multi-bracket
predicates.

Scale posture: dimension chains (nation, region, part-after-filter) are
broadcast; the fact table shuffles at most once per aggregation key; the
Q19 disjunction is expressed as one predicate on the joined frame so
Catalyst can push the brand/size legs to the part scan and the quantity
bounds to the lineitem scan (min/max envelope of the brackets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import QuerySpec, dec, load


def nation_trade_volume(spark, sf_dir):
    """Q7 shape: shipping volume between two nations, both directions,
    by year — double dimension-join (supplier nation × customer nation)
    with a symmetric pair filter. Pair chosen non-empty at every SF
    (a pair with no trade at small SFs makes oracle parity vacuous)."""
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_n = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, sf_dir, "lineitem")
    pair = (
        ((F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19"))
        | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    )
    volume = (
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6)))
        .cast("decimal(18,4)")
        .cast("double")
    )
    return (
        lineitem.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(volume.alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


NATION_TRADE_VOLUME_SQL = """
SELECT supp_nation, cust_nation, l_year,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4))))
      AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
    CAST(year(l_shipdate) AS INT) AS l_year, l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
     OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
)
GROUP BY supp_nation, cust_nation, l_year
"""


def market_share(spark, sf_dir):
    """Q8 shape: NATION_3 suppliers' share of ECONOMY-part revenue sold
    to EUROPE customers, by order year — conditional numerator over a
    grouped denominator, one pass (no second join or self-agg)."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    cust_eu = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_n = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    lineitem = load(spark, sf_dir, "lineitem")
    vol = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6)
    )
    total = F.sum(vol).cast("decimal(18,4)").cast("double")
    nation_vol = (
        F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(19,8)")))
        .cast("decimal(18,4)")
        .cast("double")
    )
    return (
        lineitem.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_eu, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_year")
        .agg(
            nation_vol.alias("nation_revenue"),
            total.alias("total_revenue"),
            (nation_vol / total).alias("mkt_share"),
        )
    )


MARKET_SHARE_SQL = """
WITH eu_cust AS (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
base AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year, sn.n_name AS supp_nation,
    CAST(l_extendedprice AS DECIMAL(12,4))
      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4))) AS vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type = 'ECONOMY'
    AND o_custkey IN (SELECT c_custkey FROM eu_cust)
)
SELECT o_year,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                     ELSE CAST(0 AS DECIMAL(19,8)) END)
       AS DECIMAL(18,4)) AS DOUBLE) AS nation_revenue,
  CAST(CAST(SUM(vol) AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                     ELSE CAST(0 AS DECIMAL(19,8)) END)
       AS DECIMAL(18,4)) AS DOUBLE)
    / CAST(CAST(SUM(vol) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
FROM base
GROUP BY o_year
"""


def small_quantity_revenue(spark, sf_dir):
    """Q17 shape: yearly-average loss from small-quantity orders of one
    brand — correlated scalar subquery (per-part average quantity)
    decorrelated into an aggregate-then-rejoin, the rewrite Catalyst
    itself applies to the subquery form."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    lineitem = load(spark, sf_dir, "lineitem")
    li = lineitem.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.sum(dec("l_quantity")).cast("decimal(18,4)").cast("double")
            / F.count(F.lit(1))
        ).alias("_avg_qty")
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("decimal(18,4)").cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
),
avgs AS (
  SELECT l_partkey,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
      / count(*) AS _avg_qty
  FROM li GROUP BY l_partkey
)
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(18,4))
       AS DOUBLE) / 7.0 AS avg_yearly,
  count(*) AS n_small
FROM li JOIN avgs USING (l_partkey)
WHERE l_quantity < 0.2 * _avg_qty
"""


def disjunctive_bracket_revenue(spark, sf_dir):
    """Q19 shape: revenue from three brand/size/quantity brackets OR-ed
    together — the disjunctive-predicate pattern that tests whether the
    engine pushes each leg's sargable bounds into the scans."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    lineitem = load(spark, sf_dir, "lineitem")
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    revenue = (
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6)))
        .cast("decimal(18,4)")
        .cast("double")
    )
    return (
        joined.filter(bracket)
        .groupBy("p_brand")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


DISJUNCTIVE_BRACKET_REVENUE_SQL = """
SELECT p_brand,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4))))
      AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 25 AND 50)
GROUP BY p_brand
"""


def customer_order_distribution(spark, sf_dir):
    """Q13 shape: distribution of customers by order count, zero-order
    customers included — left outer join feeding a second aggregation
    (the histogram-of-histogram double shuffle, both on bounded keys)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


QUERIES = {
    "customer_order_distribution": QuerySpec(
        "customer_order_distribution", customer_order_distribution,
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
        "Customers-per-order-count histogram incl. zeros (TPC-H Q13 shape)",
        ("join", "agg"),
    ),
    "nation_trade_volume": QuerySpec(
        "nation_trade_volume", nation_trade_volume, NATION_TRADE_VOLUME_SQL,
        "Bidirectional nation-pair shipping volume by year (TPC-H Q7 shape)",
        ("join", "agg"),
    ),
    "market_share": QuerySpec(
        "market_share", market_share, MARKET_SHARE_SQL,
        "Supplier-nation market share by year (TPC-H Q8 shape)",
        ("join", "agg"),
    ),
    "small_quantity_revenue": QuerySpec(
        "small_quantity_revenue", small_quantity_revenue,
        SMALL_QUANTITY_REVENUE_SQL,
        "Correlated per-part average-quantity filter (TPC-H Q17 shape)",
        ("join", "agg", "subquery"),
    ),
    "disjunctive_bracket_revenue": QuerySpec(
        "disjunctive_bracket_revenue", disjunctive_bracket_revenue,
        DISJUNCTIVE_BRACKET_REVENUE_SQL,
        "OR-of-bracket predicates over part×lineitem (TPC-H Q19 shape)",
        ("join", "agg", "filter"),
    ),
}
