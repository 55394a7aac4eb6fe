"""Subquery-shape inventory (TPC-H Q18/Q22 shapes): IN over a grouped
subquery, NOT EXISTS anti-join with a scalar-subquery filter — the
decorrelation patterns Catalyst rewrites into joins (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import QuerySpec, dec, load


def large_volume_orders(spark, sf_dir):
    """Q18 shape: orders whose total quantity exceeds a threshold (IN
    over a grouped subquery → left-semi join on the aggregated set)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 250)
        .select("l_orderkey")
    )
    qty = lineitem.groupBy("l_orderkey").agg(
        F.sum(dec("l_quantity")).cast("decimal(18,4)").cast("double").alias("sum_qty")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(qty, orders.o_orderkey == qty.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


LARGE_VOLUME_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
  CAST(CAST(sq.s AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS s
      FROM lineitem GROUP BY l_orderkey) sq
  ON sq.l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 250
)
"""


def idle_rich_customers(spark, sf_dir):
    """Q22 shape: per-segment stats over customers with above-average
    balance and no URGENT orders (scalar subquery + NOT EXISTS →
    anti-join; the urgency predicate keeps the result non-empty on this
    data — an all-orders NOT EXISTS matches nobody)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # scalar subquery as a broadcast single-row frame — stays lazy and
    # driver-free (no collect in the operator)
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal")).cast("decimal(18,4)").cast("double")
            / F.count("c_acctbal")
        ).alias("_avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .drop("_avg_bal")
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(dec("c_acctbal")).cast("decimal(18,4)").cast("double").alias(
                "total_bal"
            ),
        )
    )


IDLE_RICH_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS n_custs,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
    AS total_bal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DECIMAL(18,4))
                AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def corpus_quality_filter(spark, sf_dir):
    """The composed cleaning pipeline a training corpus actually runs:
    language gate + length gate + vowel-ratio gate + exact-dedup
    survivor policy, one declarative plan (scan-bound; the dedup
    groupBy is the only shuffle)."""
    from ..llm.text import EN_STOPWORDS, words_of

    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    words = words_of(text)
    n_words = F.size(words).cast("long")
    n_vowels = (
        F.length(text) - F.length(F.regexp_replace(F.lower(text), "[aeiou]", ""))
    ).cast("long")
    vowel_ratio = n_vowels.cast("double") / F.length(text).cast("long")
    en_hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS))).cast("long")
    gated = docs.select(
        "doc_id", "source", F.md5(text).alias("content_hash"),
        n_words.alias("n_words"), vowel_ratio.alias("vowel_ratio"),
        en_hits.alias("en_hits"),
    ).filter(
        (n_words >= 30) & (vowel_ratio >= 0.2) & (vowel_ratio <= 0.6) & (en_hits >= 1)
    )
    keepers = gated.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return (
        gated.join(keepers, ["content_hash", "doc_id"], "left_semi")
        .select("doc_id", "source", "n_words", "vowel_ratio")
    )


CORPUS_QUALITY_FILTER_SQL = r"""
WITH gated AS (
  SELECT doc_id, source, md5(text) AS content_hash,
    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_words,
    CAST(length(text) - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
         AS DOUBLE) / CAST(length(text) AS BIGINT) AS vowel_ratio,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
         w -> w IN ('the','a','of','and','to','in'))) AS BIGINT) AS en_hits
  FROM documents
),
filtered AS (
  SELECT * FROM gated
  WHERE n_words >= 30 AND vowel_ratio >= 0.2 AND vowel_ratio <= 0.6
    AND en_hits >= 1
),
keepers AS (
  SELECT content_hash, min(doc_id) AS doc_id FROM filtered GROUP BY content_hash
)
SELECT f.doc_id, f.source, f.n_words, f.vowel_ratio
FROM filtered f JOIN keepers k
  ON k.content_hash = f.content_hash AND k.doc_id = f.doc_id
"""


def returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    quarter — 3-way join, date-range + flag filters, decimal revenue,
    deterministic top-20."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")
    revenue = F.sum(
        dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount", 6))
    ).cast("decimal(18,4)").cast("double")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_REVENUE_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(6,4))))
      AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def shipmode_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape: conditional counts by line status after a join
    (one pass, predicated measures)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_priority_count"),
            F.count(F.when(~high, 1)).alias("low_priority_count"),
        )
    )


SHIPMODE_PRIORITY_COUNTS_SQL = """
SELECT l_linestatus,
  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
    AS high_priority_count,
  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
    AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


QUERIES = {
    "returned_item_revenue": QuerySpec(
        "returned_item_revenue", returned_item_revenue,
        RETURNED_ITEM_REVENUE_SQL,
        "Returned-item revenue top-20 (TPC-H Q10 shape)",
        ("join", "agg", "topk"),
    ),
    "shipmode_priority_counts": QuerySpec(
        "shipmode_priority_counts", shipmode_priority_counts,
        SHIPMODE_PRIORITY_COUNTS_SQL,
        "Conditional priority counts after join (TPC-H Q12 shape)",
        ("join", "agg"),
    ),
    "large_volume_orders": QuerySpec(
        "large_volume_orders", large_volume_orders, LARGE_VOLUME_ORDERS_SQL,
        "IN over grouped subquery (TPC-H Q18 shape)", ("join", "subquery"),
    ),
    "idle_rich_customers": QuerySpec(
        "idle_rich_customers", idle_rich_customers, IDLE_RICH_CUSTOMERS_SQL,
        "Scalar subquery + NOT EXISTS anti-join (TPC-H Q22 shape)",
        ("join", "subquery", "agg"),
    ),
    "corpus_quality_filter": QuerySpec(
        "corpus_quality_filter", corpus_quality_filter,
        CORPUS_QUALITY_FILTER_SQL,
        "Composed corpus-cleaning pipeline (gates + dedup survivor)",
        ("text", "dedup", "llm"),
    ),
}
