"""Relational operator inventory over the TPC-H-ish testdata tables.

Every operator class the reference exercises (SURVEY.md §2: projections
P1-P11, joins J1-J3, aggregations A1-A3, sorts/limits O1-O4) plus the
general analytics surface the reference lacks (§2.4-2.8 "Absent" lists:
GROUP BY, rollup/cube, windows, set ops, semi/anti joins, HAVING,
count-distinct, pivot) — all expressed as native Spark DataFrame programs
with ANSI-SQL DuckDB oracles.

Scale posture: filters/projections are applied before joins and
aggregations so Catalyst pushes them into the parquet scan; small
dimension tables are broadcast; aggregations use map-side partial
aggregation (built-in for hash aggregates). Nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .base import QuerySpec, davg, dec, dsum, dsum_expr, load

def ONE():
    # lazy: F.lit needs an active SparkContext in classic PySpark
    return F.lit(1).cast("decimal(5,4)")


# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H Q1 shape — filter → groupBy → 8 aggs)
# Reference parity: the groupBy/agg surface SURVEY §2.4 marks absent; this
# is the canonical Spark-native aggregation the engine is built around.
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (ONE() - dec("l_discount", 6, 4))
    charge = disc_price * (ONE() + dec("l_tax", 6, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            # true scale is 6 (2dp price × 2dp disc × 2dp tax) — rescale
            # exactly, never round: ties would expose HALF_UP-vs-engine
            # rounding-mode differences
            dsum_expr(disc_price, 6).alias("sum_disc_price"),
            dsum_expr(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 6, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))
           * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(18,4)) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# P7 analog: UPPER() + IN-list filter
# (reference SQL services/jcap_pa_etl_service.py:203-204)
# ---------------------------------------------------------------------------

def filter_in_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.upper(F.col("c_mktsegment")).isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


FILTER_IN_UPPER_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE UPPER(c_mktsegment) IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
"""


# ---------------------------------------------------------------------------
# P8 analog: date-range filter + exact-decimal scalar aggregate (TPC-H Q6)
# (reference date-range predicate services/jcap_pa_etl_service.py:205-206)
# ---------------------------------------------------------------------------

def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_expr(dec("l_extendedprice") * dec("l_discount", 6, 4)).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


FORECAST_REVENUE_SQL = """
SELECT
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# P10/P11 analog: CASE WHEN — greatest-of-two and 3-branch-no-ELSE
# (reference services/jcap_pa_etl_service.py:185-189)
# ---------------------------------------------------------------------------

def case_when_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    pivot_ts = F.lit("1996-01-01").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderdate") > pivot_ts, F.col("o_orderdate"))
        .otherwise(pivot_ts)
        .alias("overall_date"),
        F.when(F.col("o_orderstatus") == "F", "FINISHED")
        .when(
            (F.col("o_orderstatus") == "O") & F.col("o_orderpriority").startswith("1"),
            "URGENT_OPEN",
        )
        .when(F.col("o_orderstatus") == "O", "OPEN")
        .alias("status_class"),
    )


CASE_WHEN_CLASSIFIER_SQL = """
SELECT o_orderkey,
  CASE WHEN o_orderdate > TIMESTAMP '1996-01-01 00:00:00' THEN o_orderdate
       ELSE TIMESTAMP '1996-01-01 00:00:00' END AS overall_date,
  CASE WHEN o_orderstatus = 'F' THEN 'FINISHED'
       WHEN o_orderstatus = 'O' AND o_orderpriority LIKE '1%' THEN 'URGENT_OPEN'
       WHEN o_orderstatus = 'O' THEN 'OPEN'
  END AS status_class
FROM orders
"""


# ---------------------------------------------------------------------------
# A3 analog: SELECT DISTINCT projection
# (reference services/jcap_pa_etl_service.py:208-213)
# ---------------------------------------------------------------------------

def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_custkey", "o_orderstatus", "o_orderpriority").distinct()


DISTINCT_PROJECTION_SQL = """
SELECT DISTINCT o_custkey, o_orderstatus, o_orderpriority FROM orders
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join → groupBy → top-k by measure
# Deterministic ranking: revenue is exact-decimal-derived; l_orderkey breaks
# ties. customer side is broadcast (small dim).
# ---------------------------------------------------------------------------

def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum_expr(dec("l_extendedprice") * (ONE() - dec("l_discount", 6, 4))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


TOP_REVENUE_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way star join with broadcast dims
# ---------------------------------------------------------------------------

def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum_expr(dec("l_extendedprice") * (ONE() - dec("l_discount", 6, 4))).alias("revenue")
        )
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Left outer join with NULL path (TPC-H Q13 shape; reference J1-J3 are all
# left outer joins, services/jcap_pa_etl_service.py:207-224)
# ---------------------------------------------------------------------------

def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS order_count
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


# ---------------------------------------------------------------------------
# Windows: top-k per group (row_number) — absent in reference (SURVEY §2.5)
# ---------------------------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


WINDOW_TOPK_PER_GROUP_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem
) t WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Windows: running aggregate + lag/lead (decimal-exact running sum)
# ---------------------------------------------------------------------------

def window_running_and_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice", 12, 2)).over(w).cast("decimal(18,2)").cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


WINDOW_RUNNING_AND_LAG_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DECIMAL(18,2)) AS DOUBLE) AS running_spend,
  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
  LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
  LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
"""


# ---------------------------------------------------------------------------
# Windows: rank / dense_rank / ntile / percent_rank
# ---------------------------------------------------------------------------

def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
    )


WINDOW_RANK_FAMILY_SQL = """
SELECT c_nationkey, c_custkey, c_acctbal,
  RANK()         OVER w AS bal_rank,
  DENSE_RANK()   OVER w AS bal_dense_rank,
  NTILE(4)       OVER w AS bal_quartile,
  PERCENT_RANK() OVER w AS bal_pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
"""


# ---------------------------------------------------------------------------
# ROLLUP / CUBE (absent in reference, SURVEY §2.4)
# ---------------------------------------------------------------------------

def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
    )


ROLLUP_RETURNS_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_part_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.cube("p_brand", "p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", 12, 2).alias("sum_price"),
        )
    )


CUBE_PART_INVENTORY_SQL = """
SELECT p_brand, p_size, COUNT(*) AS n_parts,
  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price
FROM part
GROUP BY CUBE (p_brand, p_size)
"""


# ---------------------------------------------------------------------------
# Set operations: UNION ALL / INTERSECT / EXCEPT (absent in reference §2.7)
# ---------------------------------------------------------------------------

def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    open_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    done_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    both = open_cust.intersect(done_cust).withColumn("tag", F.lit("both"))
    open_only = open_cust.subtract(done_cust).withColumn("tag", F.lit("open_only"))
    done_only = done_cust.subtract(open_cust).withColumn("tag", F.lit("finished_only"))
    return both.unionByName(open_only).unionByName(done_only).select("tag", "custkey")


SET_OPERATIONS_SQL = """
WITH open_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
     done_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM open_cust INTERSECT SELECT custkey FROM done_cust)
UNION ALL
SELECT 'open_only' AS tag, custkey FROM (SELECT custkey FROM open_cust EXCEPT SELECT custkey FROM done_cust)
UNION ALL
SELECT 'finished_only' AS tag, custkey FROM (SELECT custkey FROM done_cust EXCEPT SELECT custkey FROM open_cust)
"""


def multiset_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — bag semantics: duplicates count.
    Per-priority order-key bags for two years; INTERSECT ALL keeps
    min(m, n) copies, EXCEPT ALL keeps m−n. Distinct from the set
    variants (``set_operations``) both semantically and physically —
    Spark plans these as aggregated count-compare, not dedup."""
    o = load(spark, sf_dir, "orders")
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_orderpriority").alias("prio")
    )
    y98 = o.filter(F.year("o_orderdate") == 1998).select(
        F.col("o_orderpriority").alias("prio")
    )
    common = y97.intersectAll(y98).groupBy("prio").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("tag", F.lit("common_all"))
    surplus = y97.exceptAll(y98).groupBy("prio").agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("tag", F.lit("y97_surplus"))
    return common.unionByName(surplus).select("tag", "prio", "n")


MULTISET_OPERATIONS_SQL = """
WITH y97 AS (
  SELECT o_orderpriority AS prio FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1997
),
y98 AS (
  SELECT o_orderpriority AS prio FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1998
)
SELECT 'common_all' AS tag, prio, count(*) AS n FROM (
  SELECT prio FROM y97 INTERSECT ALL SELECT prio FROM y98
) GROUP BY prio
UNION ALL
SELECT 'y97_surplus' AS tag, prio, count(*) AS n FROM (
  SELECT prio FROM y97 EXCEPT ALL SELECT prio FROM y98
) GROUP BY prio
"""


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("kind", F.lit("with_orders"))
    )
    without_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("kind", F.lit("without_orders"))
    )
    return with_orders.unionByName(without_orders).select(
        "kind", "c_mktsegment", "n_customers"
    )


SEMI_ANTI_JOIN_SQL = """
SELECT 'with_orders' AS kind, c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
UNION ALL
SELECT 'without_orders' AS kind, c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# HAVING (post-aggregation filter)
# ---------------------------------------------------------------------------

def having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 12, 2).alias("total_spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


HAVING_BIG_SPENDERS_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
"""


# ---------------------------------------------------------------------------
# Decorrelated scalar subquery: above-nation-average customers
# (avg computed decimal-exact on both sides so the > compare is identical)
# ---------------------------------------------------------------------------

def above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    nav = c.groupBy("c_nationkey").agg(davg("c_acctbal", 12, 2).alias("nation_avg"))
    return (
        c.join(F.broadcast(nav), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nation_avg")
    )


ABOVE_NATION_AVERAGE_SQL = """
WITH nav AS (
  SELECT c_nationkey,
    CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) / COUNT(c_acctbal) AS nation_avg
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
FROM customer JOIN nav USING (c_nationkey)
WHERE c_acctbal > nation_avg
"""


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) exact (A1/A2 analog with grouping)
# ---------------------------------------------------------------------------

def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


COUNT_DISTINCT_CUSTOMERS_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HLL) with a cross-engine-checkable contract.

    HLL sketch internals are engine-specific, so the raw estimate can't
    hash-match an oracle. Instead each engine emits (a) the exact
    distinct counts and (b) a boolean asserting its OWN HLL estimate
    lands within ±10% of exact. Spark runs at rsd=0.02, so a 10% miss
    is a 5-sigma event — and HLL is deterministic for fixed data, so
    the booleans are stable, meaningful (they gate the approx
    machinery's accuracy claim) and hash-comparable."""
    li = load(spark, sf_dir, "lineitem")

    # Per-column pre-dedup instead of two countDistinct in one agg: the
    # multi-distinct form compiles to an Expand that multiplies the
    # fact-table scan rows by the distinct-column count before the
    # shuffle; dedup-then-count is map-side partially aggregated and
    # shuffles only distinct keys. HLL sketches are duplicate-
    # insensitive (bucket-max updates), so running them over the
    # deduped frame yields the identical estimate.
    def col_stats(col: str, exact_name: str, flag_name: str):
        d = li.select(col).distinct()
        a = d.agg(
            F.count(F.lit(1)).alias(exact_name),
            F.approx_count_distinct(col, 0.02).alias("_a"),
        )
        return a.select(
            exact_name,
            (F.abs(F.col("_a") - F.col(exact_name)) * 10
             <= F.col(exact_name)).alias(flag_name),
        )

    p = col_stats("l_partkey", "exact_parts", "parts_hll_within_10pct")
    s = col_stats("l_suppkey", "exact_suppliers", "suppliers_hll_within_10pct")
    return p.crossJoin(s).select(
        "exact_parts",
        "exact_suppliers",
        "parts_hll_within_10pct",
        "suppliers_hll_within_10pct",
    )


APPROX_DISTINCT_PARTS_SQL = """
WITH a AS (
  SELECT COUNT(DISTINCT l_partkey) AS ep, COUNT(DISTINCT l_suppkey) AS es,
         approx_count_distinct(l_partkey) AS ap,
         approx_count_distinct(l_suppkey) AS asup
  FROM lineitem
)
SELECT ep AS exact_parts, es AS exact_suppliers,
  ABS(ap - ep) * 10 <= ep AS parts_hll_within_10pct,
  ABS(asup - es) * 10 <= es AS suppliers_hll_within_10pct
FROM a
"""


# ---------------------------------------------------------------------------
# PIVOT (absent in reference §2.4)
# ---------------------------------------------------------------------------

def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("decimal(18,4)").cast("double"))
    )


PIVOT_LINESTATUS_SQL = """
SELECT l_returnflag,
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS "O",
  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DECIMAL(18,4)) AS DOUBLE) AS "F"
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# O1/O2 analog: global ORDER BY + LIMIT (top-k, deterministic tie-break)
# ---------------------------------------------------------------------------

def top_accounts_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal")
    )


TOP_ACCOUNTS_GLOBAL_SORT_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# P1/P2/O2 analog: the control_m_poc_etl projection — constant load_date
# column + 4-column select + limit (reference services/etl_service.py:46-57)
# ---------------------------------------------------------------------------

def poc_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .limit(10)
        .select(
            F.lit("2026-08-13").alias("load_date"),
            F.col("o_orderpriority").alias("product"),
            F.col("o_orderkey").cast("string").alias("ac_number"),
            F.col("o_orderdate").cast("date").alias("referral_date"),
        )
    )


POC_PROJECTION_SQL = """
SELECT '2026-08-13' AS load_date,
       o_orderpriority AS product,
       CAST(o_orderkey AS VARCHAR) AS ac_number,
       CAST(o_orderdate AS DATE) AS referral_date
FROM orders ORDER BY o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# P4 analog: to_timestamp with explicit format (MM-dd-yyyy round trip)
# (reference services/jcap_pa_etl_service.py:259-264)
# ---------------------------------------------------------------------------

def timestamp_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MM-dd-yyyy").alias("us_date_str"),
        F.to_timestamp(
            F.date_format("o_orderdate", "MM-dd-yyyy"), "MM-dd-yyyy"
        ).alias("parsed_ts"),
    )


TIMESTAMP_PARSE_ROUNDTRIP_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%m-%d-%Y') AS us_date_str,
       strptime(strftime(o_orderdate, '%m-%d-%Y'), '%m-%d-%Y') AS parsed_ts
FROM orders
"""


# ---------------------------------------------------------------------------
# Scalar function gallery: string / null-handling / math
# (everything SURVEY §2.8 marks absent)
# ---------------------------------------------------------------------------

def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#13")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.round(dec("p_retailprice", 12, 2), 1).cast("double").alias("price_r1"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.greatest(F.col("p_size"), F.lit(10)).alias("size_floor10"),
        F.least(F.col("p_size"), F.lit(40)).alias("size_cap40"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


SCALAR_FUNCTION_GALLERY_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  LOWER(p_brand) AS brand_lower,
  SUBSTR(p_type, 1, 5) AS type_prefix,
  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
  TRIM(CONCAT('  ', p_name, '  ')) AS name_trim,
  REGEXP_REPLACE(p_type, ' ', '_', 'g') AS type_snake,
  COALESCE(NULLIF(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
  ABS(p_size - 25) AS size_dev,
  p_partkey % 7 AS key_mod,
  CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS price_r1,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  GREATEST(p_size, 10) AS size_floor10,
  LEAST(p_size, 40) AS size_cap40,
  CONCAT_WS('|', p_brand, p_type) AS brand_type
FROM part
"""


# ---------------------------------------------------------------------------
# Date/time function gallery
# ---------------------------------------------------------------------------

def date_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).alias("order_year"),
        F.quarter(d).alias("order_quarter"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_1999"),
    )


DATE_FUNCTION_GALLERY_SQL = """
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(o_orderdate AS DATE) + 30 AS due_date,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999
FROM orders
"""


QUERIES = {
    "pricing_summary": QuerySpec(
        "pricing_summary", pricing_summary, PRICING_SUMMARY_SQL,
        "Flagship filter→groupBy→8-agg (TPC-H Q1 shape)", ("agg", "flagship"),
    ),
    "filter_in_upper": QuerySpec(
        "filter_in_upper", filter_in_upper, FILTER_IN_UPPER_SQL,
        "UPPER()+IN-list filter (reference P7)", ("filter",),
    ),
    "forecast_revenue": QuerySpec(
        "forecast_revenue", forecast_revenue, FORECAST_REVENUE_SQL,
        "Date-range + numeric-range filter, scalar agg (reference P8 / TPC-H Q6)",
        ("filter", "agg"),
    ),
    "case_when_classifier": QuerySpec(
        "case_when_classifier", case_when_classifier, CASE_WHEN_CLASSIFIER_SQL,
        "CASE WHEN greatest-of-two + 3-branch-no-ELSE (reference P10/P11)",
        ("projection",),
    ),
    "distinct_projection": QuerySpec(
        "distinct_projection", distinct_projection, DISTINCT_PROJECTION_SQL,
        "SELECT DISTINCT projection (reference A3)", ("agg",),
    ),
    "top_revenue_orders": QuerySpec(
        "top_revenue_orders", top_revenue_orders, TOP_REVENUE_ORDERS_SQL,
        "3-way join → groupBy → deterministic top-k (TPC-H Q3 shape)",
        ("join", "agg", "topk"),
    ),
    "local_supplier_volume": QuerySpec(
        "local_supplier_volume", local_supplier_volume, LOCAL_SUPPLIER_VOLUME_SQL,
        "6-way star join with broadcast dims (TPC-H Q5 shape)", ("join", "agg"),
    ),
    "customer_order_counts": QuerySpec(
        "customer_order_counts", customer_order_counts, CUSTOMER_ORDER_COUNTS_SQL,
        "Left outer join with NULL path + count (TPC-H Q13 shape, reference J1-J3)",
        ("join", "agg"),
    ),
    "window_topk_per_group": QuerySpec(
        "window_topk_per_group", window_topk_per_group, WINDOW_TOPK_PER_GROUP_SQL,
        "row_number top-3 per supplier", ("window",),
    ),
    "window_running_and_lag": QuerySpec(
        "window_running_and_lag", window_running_and_lag, WINDOW_RUNNING_AND_LAG_SQL,
        "Running decimal sum + lag/lead per customer", ("window",),
    ),
    "window_rank_family": QuerySpec(
        "window_rank_family", window_rank_family, WINDOW_RANK_FAMILY_SQL,
        "rank/dense_rank/ntile/percent_rank", ("window",),
    ),
    "rollup_returns": QuerySpec(
        "rollup_returns", rollup_returns, ROLLUP_RETURNS_SQL,
        "ROLLUP subtotals", ("agg",),
    ),
    "cube_part_inventory": QuerySpec(
        "cube_part_inventory", cube_part_inventory, CUBE_PART_INVENTORY_SQL,
        "CUBE over brand×size", ("agg",),
    ),
    "set_operations": QuerySpec(
        "set_operations", set_operations, SET_OPERATIONS_SQL,
        "INTERSECT / EXCEPT / UNION ALL", ("setop",),
    ),
    "multiset_operations": QuerySpec(
        "multiset_operations", multiset_operations, MULTISET_OPERATIONS_SQL,
        "INTERSECT ALL / EXCEPT ALL bag semantics", ("setop",),
    ),
    "semi_anti_join": QuerySpec(
        "semi_anti_join", semi_anti_join, SEMI_ANTI_JOIN_SQL,
        "left_semi (EXISTS) + left_anti (NOT EXISTS)", ("join",),
    ),
    "having_big_spenders": QuerySpec(
        "having_big_spenders", having_big_spenders, HAVING_BIG_SPENDERS_SQL,
        "GROUP BY + HAVING", ("agg",),
    ),
    "above_nation_average": QuerySpec(
        "above_nation_average", above_nation_average, ABOVE_NATION_AVERAGE_SQL,
        "Decorrelated scalar subquery (above-average filter)", ("join", "agg"),
    ),
    "count_distinct_customers": QuerySpec(
        "count_distinct_customers", count_distinct_customers,
        COUNT_DISTINCT_CUSTOMERS_SQL, "exact COUNT(DISTINCT)", ("agg",),
    ),
    "approx_distinct_parts": QuerySpec(
        "approx_distinct_parts", approx_distinct_parts,
        APPROX_DISTINCT_PARTS_SQL,
        "approx_count_distinct (HLL) gated ±10% vs exact, both engines",
        ("agg", "approx"),
    ),
    "pivot_linestatus": QuerySpec(
        "pivot_linestatus", pivot_linestatus, PIVOT_LINESTATUS_SQL,
        "PIVOT on linestatus", ("agg", "pivot"),
    ),
    "top_accounts_global_sort": QuerySpec(
        "top_accounts_global_sort", top_accounts_global_sort,
        TOP_ACCOUNTS_GLOBAL_SORT_SQL,
        "Global ORDER BY + LIMIT (reference O1/O2)", ("sort", "topk"),
    ),
    "poc_projection": QuerySpec(
        "poc_projection", poc_projection, POC_PROJECTION_SQL,
        "control_m_poc_etl analog: lit column + projection + limit (P1/P2/O2)",
        ("projection", "reference-job"),
    ),
    "timestamp_parse_roundtrip": QuerySpec(
        "timestamp_parse_roundtrip", timestamp_parse_roundtrip,
        TIMESTAMP_PARSE_ROUNDTRIP_SQL,
        "to_timestamp(col,'MM-dd-yyyy') parse (reference P4)", ("projection",),
    ),
    "scalar_function_gallery": QuerySpec(
        "scalar_function_gallery", scalar_function_gallery,
        SCALAR_FUNCTION_GALLERY_SQL,
        "string/null/math scalar functions", ("functions",),
    ),
    "date_function_gallery": QuerySpec(
        "date_function_gallery", date_function_gallery, DATE_FUNCTION_GALLERY_SQL,
        "date/time scalar functions", ("functions",),
    ),
}
