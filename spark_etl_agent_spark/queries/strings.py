"""String-similarity and conditional-aggregation inventory — rounding
out the scalar surface (SURVEY.md §2.8 lists the reference's functions;
these are the M3 extensions a data-cleaning pipeline actually needs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import QuerySpec, load


def string_similarity_pairs(spark, sf_dir):
    """Edit-distance near-match pairs within (brand, size) blocks —
    the blocked-comparison shape of entity resolution: the quadratic
    compare runs only inside bounded blocks (one shuffle on the block
    key), never globally. Levenshtein is exact integer — perfect
    cross-engine oracle."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a = part.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_brand"), F.col("p_size"),
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"),
    )
    return (
        a.join(b, ["p_brand", "p_size"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "p_brand", "p_size", "key_a", "key_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 10)
    )


STRING_SIMILARITY_PAIRS_SQL = """
SELECT a.p_brand, a.p_size,
  a.p_partkey AS key_a, b.p_partkey AS key_b,
  levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 10
"""


def filtered_aggregates(spark, sf_dir):
    """Conditional aggregation (FILTER-clause shape): one scan, many
    predicated measures — the idiom that replaces N filtered scans with
    one pass at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(12,4)")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.sum(F.when(F.col("l_discount") > 0.05, qd))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("qty_high_discount"),
        F.sum(F.when(F.col("l_tax") == 0, qd))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("qty_tax_free"),
    )


FILTERED_AGGREGATES_SQL = """
SELECT l_linestatus,
  count(*) AS n_all,
  count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) FILTER (WHERE l_discount > 0.05)
       AS DECIMAL(18,4)) AS DOUBLE) AS qty_high_discount,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) FILTER (WHERE l_tax = 0)
       AS DECIMAL(18,4)) AS DOUBLE) AS qty_tax_free
FROM lineitem GROUP BY l_linestatus
"""


def array_functions_gallery(spark, sf_dir):
    """Complex-type (array) surface: build deterministic per-group
    arrays (sorted collect), then slice/filter/transform/flatten them —
    the column shapes embedding and token pipelines live on."""
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_orderstatus")).alias("statuses"))
        .filter(F.size("statuses") >= 3)
    )
    return per_cust.select(
        "o_custkey",
        F.size("statuses").alias("n_orders"),
        F.element_at("statuses", 1).alias("first_status"),
        # surfaced as a joined string: array-typed OUTPUT cells render
        # engine-dependently (ndarray vs list) in generic comparators,
        # while the slice itself is still exercised
        F.array_join(F.slice("statuses", 1, 3), ",").alias("first3_csv"),
        F.size(F.array_distinct("statuses")).alias("n_distinct_statuses"),
        F.size(F.filter("statuses", lambda s: s == F.lit("F"))).alias("n_f"),
        F.array_contains("statuses", "P").alias("has_p"),
    )


ARRAY_FUNCTIONS_GALLERY_SQL = """
WITH per_cust AS (
  SELECT o_custkey, list_sort(list(o_orderstatus)) AS statuses
  FROM orders GROUP BY o_custkey
  HAVING len(list(o_orderstatus)) >= 3
)
SELECT o_custkey,
  len(statuses) AS n_orders,
  statuses[1] AS first_status,
  array_to_string(statuses[1:3], ',') AS first3_csv,
  len(list_distinct(statuses)) AS n_distinct_statuses,
  len(list_filter(statuses, s -> s = 'F')) AS n_f,
  list_contains(statuses, 'P') AS has_p
FROM per_cust
"""


def unpivot_quarterly(spark, sf_dir):
    """UNPIVOT/melt: wide per-quarter counts back to long form — the
    inverse of pivot, closing the reshape surface."""
    orders = load(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.when(F.quarter("o_orderdate") == 1, 1)).alias("q1"),
        F.count(F.when(F.quarter("o_orderdate") == 2, 1)).alias("q2"),
        F.count(F.when(F.quarter("o_orderdate") == 3, 1)).alias("q3"),
        F.count(F.when(F.quarter("o_orderdate") == 4, 1)).alias("q4"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["q1", "q2", "q3", "q4"],
        variableColumnName="quarter",
        valueColumnName="n_orders",
    )


UNPIVOT_QUARTERLY_SQL = """
WITH wide AS (
  SELECT o_orderstatus,
    count(*) FILTER (WHERE quarter(o_orderdate) = 1) AS q1,
    count(*) FILTER (WHERE quarter(o_orderdate) = 2) AS q2,
    count(*) FILTER (WHERE quarter(o_orderdate) = 3) AS q3,
    count(*) FILTER (WHERE quarter(o_orderdate) = 4) AS q4
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, quarter, n_orders
FROM wide UNPIVOT (n_orders FOR quarter IN (q1, q2, q3, q4))
"""


QUERIES = {
    "unpivot_quarterly": QuerySpec(
        "unpivot_quarterly", unpivot_quarterly, UNPIVOT_QUARTERLY_SQL,
        "UNPIVOT/melt wide→long reshape", ("agg", "pivot"),
    ),
    "string_similarity_pairs": QuerySpec(
        "string_similarity_pairs", string_similarity_pairs,
        STRING_SIMILARITY_PAIRS_SQL,
        "Blocked edit-distance pairs (entity-resolution shape)",
        ("strings", "join"),
    ),
    "filtered_aggregates": QuerySpec(
        "filtered_aggregates", filtered_aggregates, FILTERED_AGGREGATES_SQL,
        "FILTER-clause conditional aggregation, one pass", ("agg",),
    ),
    "array_functions_gallery": QuerySpec(
        "array_functions_gallery", array_functions_gallery,
        ARRAY_FUNCTIONS_GALLERY_SQL,
        "Array build/slice/filter/distinct surface", ("functions", "arrays"),
    ),
}
