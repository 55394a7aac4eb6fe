"""Final wave of TPC-H analytic shapes — Q9/Q14/Q16/Q20 analogs — which
completes the full 22-query TPC-H pattern inventory (see
``relational.py`` Q1/Q3/Q5/Q6/Q13, ``tpch_multi.py`` Q7/Q8/Q17/Q19,
``subqueries.py`` Q10/Q12/Q18/Q22 and ``tpch_ext.py`` Q2/Q4/Q11/Q15/Q21).

The testdata schema has no ``partsupp``, no supply-cost column and no
comment text, so each query keeps its *relational pattern* and
re-anchors predicates on columns that exist:

- Q9's ``ps_supplycost`` → a fixed 25% of ``p_retailprice`` (2-decimal
  money × integer quantity × 2-decimal factor = exact scale-4 decimal,
  so the profit aggregate is bit-exact in any engine and any order);
- Q16's "customer complaints" supplier exclusion → suppliers with a
  below-average account balance (non-empty at every scale factor,
  unlike a fixed-threshold filter);
- Q20's ``ps_availqty > ½·shipped`` stock test → a *dominant supplier*
  test (this supplier shipped more than half of a part's 1996 volume),
  compared as ``2·supp_qty > part_qty`` so no division is involved.

Scale posture: every join tree here shuffles the fact table once on its
join key and broadcasts the genuine dimensions (part filtered by name
is a dimension; supplier/nation always). The two-level aggregates
(Q20's per-pair → per-part) reuse the first shuffle's partitioning for
the second aggregate (partkey is a prefix of (partkey, suppkey)), so
Catalyst plans a single Exchange for both.

Reference parity: the reference engine's analytical surface is the one
52-line extract SQL (services/jcap_pa_etl_service.py:176-227); this
inventory demonstrates the same engine-capability axis (multi-join +
correlated-aggregate relational programs) at full TPC-H breadth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import QuerySpec, dec, load

REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)


def _rev():
    # Columns are built lazily: construction needs an active SparkContext.
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6)
    )


def nation_year_profit(spark, sf_dir):
    """Q9 shape (product-type profit): per supplier-nation per order-year
    profit on 'red' parts, profit = revenue − 25%-of-retail cost.

    Revenue has exact scale 8 but scale-4 *values* (2-decimal money ×
    2-decimal discount), and cost is scale-4 by construction, so the
    ``DECIMAL(18,4)`` rescale of each sum is exact — no rounding tie to
    disagree on. Plan: lineitem shuffles once on the agg key; part
    (name-filtered), supplier, nation broadcast; orders is fact-sized so
    it joins shuffle-to-shuffle on orderkey — at 100 TB that is the one
    unavoidable exchange, and AQE handles its skew."""
    li = load(spark, sf_dir, "lineitem")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    cost = (
        dec("p_retailprice", 12, 2)
        * dec("l_quantity", 12, 0)
        * F.lit(0.25).cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            (
                F.sum(_rev()).cast("decimal(18,4)")
                - F.sum(cost).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("profit")
        )
    )


NATION_YEAR_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(
    CAST(SUM({REV_SQL}) AS DECIMAL(18,4))
    - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,0))
               * CAST(0.25 AS DECIMAL(3,2))) AS DECIMAL(18,4))
    AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, CAST(year(o_orderdate) AS INT)
"""


def promo_revenue_share(spark, sf_dir):
    """Q14 shape (promotion effect): the percentage of 1996 revenue that
    came from PROMO-type parts — one scalar row. Both sums are exact
    decimals surfaced as doubles; the ``·100 /`` tail is the identical
    left-to-right IEEE expression in both engines, so the quotient is
    bit-exact. Plan: part is a broadcast dim; one year of lineitem
    aggregates map-side into a single row — no full shuffle at all."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(promo).cast("decimal(18,4)").cast("double").alias("_promo"),
        F.sum(_rev()).cast("decimal(18,4)").cast("double").alias("_total"),
    )
    return agg.select(
        (F.col("_promo") * 100 / F.col("_total")).alias("promo_pct"),
        F.col("_promo").alias("promo_revenue"),
    )


PROMO_REVENUE_SHARE_SQL = f"""
SELECT
  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV_SQL}
                     ELSE CAST(0 AS DECIMAL(12,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
    * 100
    / CAST(CAST(SUM({REV_SQL}) AS DECIMAL(18,4)) AS DOUBLE) AS promo_pct,
  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV_SQL}
                     ELSE CAST(0 AS DECIMAL(12,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
    AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
"""


def parts_supplier_counts(spark, sf_dir):
    """Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) of non-PROMO small parts,
    excluding "complained-about" suppliers — here, suppliers with a
    below-average account balance (the NOT IN subquery of the original,
    kept non-empty at every scale factor).

    Dedup-first distinct count: the part↔supplier relationship is
    materialized as DISTINCT (brand, type, size, suppkey) rows *before*
    counting — a plain count after a dedup shuffle — instead of
    ``countDistinct``, whose Expand would push N× the joined fact rows
    through the shuffle. The exclusion is a broadcast left-anti join
    (suppkey is never NULL in this schema; with nullable keys NOT IN
    and anti-join diverge and the NULL rows must be rejected first)."""
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    avg_bal = supplier.agg(
        (
            F.sum(dec("s_acctbal", 12, 2)).cast("decimal(18,2)").cast("double")
            / F.count(F.lit(1))
        ).alias("_avg")
    )
    bad = (
        supplier.crossJoin(F.broadcast(avg_bal))
        .filter(dec("s_acctbal", 12, 2) < F.col("_avg"))
        .select("s_suppkey")
    )
    part = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") != "PROMO") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


PARTS_SUPPLIER_COUNTS_SQL = """
WITH bad AS (
  SELECT s_suppkey FROM supplier
  WHERE CAST(s_acctbal AS DECIMAL(12,2)) <
    (SELECT CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE)
            / count(*) FROM supplier)
),
pairs AS (
  SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type <> 'PROMO' AND p_size <= 25
    AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
)
SELECT p_brand, p_type, p_size, count(*) AS supplier_cnt
FROM pairs GROUP BY p_brand, p_type, p_size
"""


def dominant_part_suppliers(spark, sf_dir):
    """Q20 shape (two-level correlated aggregate): suppliers that shipped
    *more than half* of some red part's 1996 volume, with how many parts
    they dominate. The original's ``availqty > ½·SUM(qty)`` correlated
    subquery decorrelates into per-(part, supplier) and per-part
    aggregates; the dominance test is ``2·supp_qty > part_qty`` — integer
    decimal arithmetic, no division.

    Plan note: the second aggregate groups on a *prefix* of the first's
    key, so hash-partitioning on (l_partkey, l_suppkey)... does NOT
    co-locate part rows; Catalyst correctly plans a second (much
    smaller) exchange over the pair aggregate, which is the
    data-shrinking order — pairs ≪ fact rows at any scale."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity", 12, 0)).cast("decimal(18,0)").alias("supp_qty"))
    )
    totals = shipped.groupBy("l_partkey").agg(
        F.sum("supp_qty").cast("decimal(18,0)").alias("part_qty")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.join(totals, "l_partkey")
        .filter(F.lit(2) * F.col("supp_qty") > F.col("part_qty"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("dominant_parts"))
    )


DOMINANT_PART_SUPPLIERS_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,0))) AS DECIMAL(18,0)) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
totals AS (
  SELECT l_partkey, CAST(SUM(supp_qty) AS DECIMAL(18,0)) AS part_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name, count(*) AS dominant_parts
FROM shipped
JOIN totals ON shipped.l_partkey = totals.l_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE 2 * supp_qty > part_qty
GROUP BY s_suppkey, s_name
"""


QUERIES = {
    "nation_year_profit": QuerySpec(
        "nation_year_profit", nation_year_profit, NATION_YEAR_PROFIT_SQL,
        "Per-nation per-year profit on red parts (TPC-H Q9 shape)",
        ("join", "agg"),
    ),
    "promo_revenue_share": QuerySpec(
        "promo_revenue_share", promo_revenue_share, PROMO_REVENUE_SHARE_SQL,
        "PROMO-part share of 1996 revenue (TPC-H Q14 shape)",
        ("join", "agg"),
    ),
    "parts_supplier_counts": QuerySpec(
        "parts_supplier_counts", parts_supplier_counts,
        PARTS_SUPPLIER_COUNTS_SQL,
        "Distinct supplier counts per part attribute (TPC-H Q16 shape)",
        ("join", "agg", "subquery"),
    ),
    "dominant_part_suppliers": QuerySpec(
        "dominant_part_suppliers", dominant_part_suppliers,
        DOMINANT_PART_SUPPLIERS_SQL,
        "Suppliers shipping >half a part's 1996 volume (TPC-H Q20 shape)",
        ("join", "agg", "subquery"),
    ),
}
