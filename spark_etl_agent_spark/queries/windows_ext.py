"""Extended window-function surface: RANGE (value/interval) frames and
value window functions — completing §2.5's "ranking/analytic/frame
specs" beyond the rows-frame queries in ``relational``."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import QuerySpec, dec, load


def trailing_interval_revenue(spark, sf_dir):
    """Per-customer trailing-30-day order revenue: a RANGE frame over an
    event-time ordering — the 'rolling metric' shape that at 100 TB
    runs as one shuffle on the partition key with an ordered frame scan
    (no self-join, no explode-per-day)."""
    orders = load(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_date(day))
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        day.alias("order_day"),
        F.sum(dec("o_totalprice", 14, 4))
        .over(w)
        .cast("decimal(20,4)")
        .cast("double")
        .alias("rev_trailing_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


TRAILING_INTERVAL_REVENUE_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS order_day,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) OVER w AS DECIMAL(20,4))
       AS DOUBLE) AS rev_trailing_30d,
  COUNT(*) OVER w AS n_orders_30d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
)
"""


def window_value_functions(spark, sf_dir):
    """first/last/nth value with explicit frames, deterministic ordering
    (unique tie-break key — the parity rule for any window query)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    # (l_orderkey, l_linenumber) is NOT unique in this data — the order
    # must be made total (incl. l_quantity last) or first/nth values are
    # tie-ambiguous across engines
    order = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    full = order.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.first("l_quantity").over(full).alias("first_qty"),
        F.last("l_quantity").over(full).alias("last_qty"),
        F.nth_value("l_quantity", 2).over(full).alias("second_qty"),
        (F.col("l_quantity") - F.first("l_quantity").over(full)).alias(
            "qty_vs_first"
        ),
    )


WINDOW_VALUE_FUNCTIONS_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
  first_value(l_quantity) OVER w AS first_qty,
  last_value(l_quantity) OVER w AS last_qty,
  nth_value(l_quantity, 2) OVER w AS second_qty,
  l_quantity - first_value(l_quantity) OVER w AS qty_vs_first
FROM lineitem
WHERE l_orderkey % 10 = 0
WINDOW w AS (
  PARTITION BY l_orderkey
  ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


QUERIES = {
    "trailing_interval_revenue": QuerySpec(
        "trailing_interval_revenue", trailing_interval_revenue,
        TRAILING_INTERVAL_REVENUE_SQL,
        "RANGE-frame trailing 30-day rolling revenue", ("window",),
    ),
    "window_value_functions": QuerySpec(
        "window_value_functions", window_value_functions,
        WINDOW_VALUE_FUNCTIONS_SQL,
        "first/last/nth_value with explicit frames", ("window",),
    ),
}
