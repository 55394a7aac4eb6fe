"""Advanced-operator inventory: as-of join, range join, salted
aggregation, exact profiles, grouping sets — the extension operators in
``spark_etl_agent_spark.operators``, each oracled (DuckDB's native
ASOF JOIN checks our union-window composition value-for-value)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.ranges import band_join
from ..operators.sketches import agg_topk_per_group, column_profile, table_profile
from ..operators.skew import salted_aggregate, salted_join_hotkeys
from .base import QuerySpec, fan_out, load


def asof_join_clicks(spark, sf_dir):
    """For each purchase event: the user's most recent click value at or
    before it (classic time-series enrichment)."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(purchases, clicks, on="user_id", ts="ts",
                     value_cols=["click_value"])


ASOF_JOIN_CLICKS_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.click_value AS click_value_asof
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def band_join_parts(spark, sf_dir):
    """Broadcast range join: parts into 100-unit retail-price bands."""
    part = load(spark, sf_dir, "part")
    bands = spark.range(0, 26).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 100.0).alias("lo"),
        ((F.col("id") + 1) * 100.0).alias("hi"),
    )
    return (
        band_join(part, bands, value="p_retailprice")
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(12,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_price"),
        )
    )


BAND_JOIN_PARTS_SQL = """
WITH bands AS (
  SELECT CAST(i AS BIGINT) AS band_id, i * 100.0 AS lo, (i + 1) * 100.0 AS hi
  FROM range(0, 26) t(i)
)
SELECT b.band_id, count(*) AS n_parts,
  CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
    AS sum_price
FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band_id
"""


def salted_agg_lineitem(spark, sf_dir):
    """Skew-safe two-phase aggregation — must equal the plain groupBy
    (which is exactly what the oracle computes)."""
    li = load(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li.withColumn("qty_dec", F.col("l_quantity").cast("decimal(12,4)")),
        keys=["l_returnflag"],
        aggs=[
            ("n_items", "count", "l_quantity"),
            ("sum_qty_dec", "sum", "qty_dec"),
            ("min_qty", "min", "l_quantity"),
            ("max_qty", "max", "l_quantity"),
        ],
        salt_buckets=8,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.col("sum_qty_dec").cast("decimal(18,4)").cast("double").alias("sum_qty"),
        "min_qty",
        "max_qty",
    )


SALTED_AGG_LINEITEM_SQL = """
SELECT l_returnflag, count(*) AS n_items,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
    AS sum_qty,
  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


def salted_join_hotkey(spark, sf_dir):
    """Skewed-key fact→dim join through the explicit hot-key salt path
    (``operators/skew.py::salted_join_hotkeys``): consolidation routing
    sends ~30% of lineitems to master order 0 (a genuine power-law
    heavy hitter), the join salts ONLY that key across 8 buckets while
    every other order joins plain, and the result — identical to the
    unsalted join, which is exactly what the oracle computes — is
    aggregated by the routed order's priority."""
    from .base import dec, dsum_expr
    from .relational import ONE

    li = load(spark, sf_dir, "lineitem").withColumn(
        "route_key",
        F.expr("CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("route_key"), "o_orderpriority"
    )
    joined = salted_join_hotkeys(
        li, orders, on="route_key", hot_keys=[0], salt_buckets=8, how="inner"
    )
    return joined.groupBy(
        "o_orderpriority",
        (F.col("route_key") == 0).alias("is_consolidated"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum_expr(
            dec("l_extendedprice") * (ONE() - dec("l_discount", 6, 4)),
            scale=4,
        ).alias("revenue"),
    )


SALTED_JOIN_HOTKEY_SQL = """
WITH routed AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS route_key,
    l_extendedprice, l_discount
  FROM lineitem
)
SELECT o.o_orderpriority, r.route_key = 0 AS is_consolidated,
  count(*) AS n_items,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4))))
       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
FROM routed r JOIN orders o ON o.o_orderkey = r.route_key
GROUP BY 1, 2
"""


def quantity_profile(spark, sf_dir):
    """Exact per-group distribution profile incl. median (0.5
    interpolation is exact for the integer-valued quantity column)."""
    return column_profile(
        load(spark, sf_dir, "lineitem"), keys=["l_returnflag"], value="l_quantity"
    )


QUANTITY_PROFILE_SQL = """
SELECT l_returnflag, count(*) AS n,
  min(l_quantity) AS v_min, max(l_quantity) AS v_max,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
    AS v_sum,
  quantile_cont(l_quantity, 0.5) AS v_median
FROM lineitem GROUP BY l_returnflag
"""


def orders_expectation_gate(spark, sf_dir):
    """Data-quality expectation gate (`operators/quality.py::
    expectation_report`): five named rules — three hard, one with a 25%
    tolerance the ~20% price-band violations stay under, and one hard
    date-window rule the 2001 orders genuinely BREAK (a failing row is
    part of the contract: the gate must say no) — plus key uniqueness,
    all evaluated in ONE aggregation over one scan."""
    from ..operators.quality import (
        Expectation,
        expectation_report,
        in_range,
        in_set,
        not_null,
    )

    orders = load(spark, sf_dir, "orders")
    rules = [
        Expectation("orderkey_not_null", not_null("o_orderkey"), 0.0),
        Expectation(
            "status_in_domain", in_set("o_orderstatus", ["F", "O", "P"]), 0.0
        ),
        Expectation(
            "price_in_band", in_range("o_totalprice", 1500.0, 400000.0), 0.25
        ),
        Expectation(
            "date_in_window",
            in_range("o_orderdate", "1995-01-01", "2000-12-31"),
            0.0,
        ),
    ]
    return expectation_report(orders, rules, unique_keys=["o_orderkey"])


ORDERS_EXPECTATION_GATE_SQL = """
WITH agg AS (
  SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
    sum(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v0,
    sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS v1,
    sum(CASE WHEN o_totalprice BETWEEN 1500.0 AND 400000.0
         THEN 0 ELSE 1 END) AS v2,
    sum(CASE WHEN o_orderdate BETWEEN '1995-01-01' AND '2000-12-31'
         THEN 0 ELSE 1 END) AS v3
  FROM orders
),
rules AS (
  SELECT 'orderkey_not_null' AS rule, n, v0 AS v, 0.0 AS ratio FROM agg
  UNION ALL SELECT 'status_in_domain', n, v1, 0.0 FROM agg
  UNION ALL SELECT 'price_in_band', n, v2, 0.25 FROM agg
  UNION ALL SELECT 'date_in_window', n, v3, 0.0 FROM agg
  UNION ALL SELECT 'unique(o_orderkey)', n, n - nd, 0.0 FROM agg
)
SELECT rule, CAST(n AS BIGINT) AS n_rows, CAST(v AS BIGINT) AS n_violations,
  CAST(floor(v * 1000000.0 / greatest(n, 1)) AS BIGINT) AS violation_ppm,
  CAST(floor(ratio * 1000000.0) AS BIGINT) AS allowed_ppm,
  floor(v * 1000000.0 / greatest(n, 1)) <= floor(ratio * 1000000.0) AS passed
FROM rules
"""


def events_freshness_gate(spark, sf_dir):
    """Per-source freshness gate (`operators/quality.py::
    freshness_report`): is each event type's newest event recent enough
    against an INJECTED as-of (never wall-clock — reruns and backfills
    must gate on the batch's logical time)? The 12.5 h budget
    discriminates by scale (2 of 5 types pass at sf0.01). The exposed
    lag is an exact integer (floor seconds); the operator's rounded
    double stays internal so the hash never rides float rounding."""
    from ..operators.quality import freshness_report

    as_of = "2024-01-31 12:00:00"
    rep = freshness_report(
        load(spark, sf_dir, "events"),
        "ts",
        as_of,
        max_lag_hours=12.5,
        groups=["event_type"],
    )
    return rep.select(
        "event_type",
        F.col("n_rows").cast("long").alias("n_rows"),
        "oldest_ts",
        "newest_ts",
        F.expr(
            f"(unix_micros(CAST('{as_of}' AS TIMESTAMP))"
            " - unix_micros(newest_ts)) div 1000000"
        ).cast("long").alias("lag_floor_s"),
        "passed",
    )


EVENTS_FRESHNESS_GATE_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
  min(ts) AS oldest_ts, max(ts) AS newest_ts,
  CAST((epoch_us(TIMESTAMP '2024-01-31 12:00:00') - epoch_us(max(ts)))
       // 1000000 AS BIGINT) AS lag_floor_s,
  (epoch_us(TIMESTAMP '2024-01-31 12:00:00') - epoch_us(max(ts)))
    <= CAST(12.5 * 3600 * 1000000 AS BIGINT) AS passed
FROM events GROUP BY event_type
"""


def rollup_day_by_type(spark, sf_dir):
    """Hypertable rollup cascade (`operators/incremental.py::
    rollup_cascade`): hour → day continuous aggregates where the day
    level is built FROM the hourly level (sum-mergeable measures), and
    the oracle aggregates the raw facts directly — the equality IS the
    cascade-correctness proof. Value sums ride exact decimals so the
    two aggregation orders cannot diverge."""
    from ..operators.incremental import rollup_cascade

    ev = load(spark, sf_dir, "events").withColumn(
        "v_dec", F.col("value").cast("decimal(12,4)")
    )
    levels = rollup_cascade(
        ev,
        "ts",
        keys=["event_type"],
        measures=[("n_events", "count"), ("v_dec", "sum"), ("value", "max")],
        granularities=["hour", "day"],
    )
    return levels["day"].select(
        "event_type",
        "bucket",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("v_dec").cast("decimal(18,4)").cast("double").alias("v_sum"),
        F.col("value").alias("v_max"),
    )


ROLLUP_DAY_BY_TYPE_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
    AS v_sum,
  max(value) AS v_max
FROM events GROUP BY 1, 2
"""


def mg_heavy_hitter_tokens(spark, sf_dir):
    """Misra-Gries heavy hitters with exact recount
    (`operators/sketches.py::frequent_items`): every token above 0.5%
    corpus share, EXACT counts — candidate generation is per-partition
    bounded-memory MG summaries (Arrow-batched), so the shuffle carries
    npartitions × capacity candidate rows instead of one row per
    distinct token; pigeonhole guarantees no true heavy hitter is
    missed, so the result equals the oracle's full groupBy."""
    from ..llm.text import words_of
    from ..operators.sketches import frequent_items

    toks = (
        fan_out(load(spark, sf_dir, "documents"))
        .select(F.explode(words_of(F.col("text"))).alias("token"))
    )
    return frequent_items(toks, "token", min_share=0.005)


MG_HEAVY_HITTER_TOKENS_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            w -> len(w) >= 1)) AS token
  FROM documents
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(floor(count(*) * 1000000.0 / n) AS BIGINT) AS share_ppm
FROM toks, tot
GROUP BY token, n
HAVING count(*) > n * CAST(0.005 AS DOUBLE)
"""


def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (beyond the cube/rollup queries): totals
    by status, by priority, and grand total in one pass."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
          count(*) AS n_orders,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DECIMAL(20,4)) AS DOUBLE)
            AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


GROUPING_SETS_REVENUE_SQL = """
SELECT o_orderstatus, o_orderpriority,
  count(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DECIMAL(20,4)) AS DOUBLE)
    AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def agg_topk_quantities(spark, sf_dir):
    """Top-3 per supplier via collect-sort-slice (bounded per-group
    state) — same rows as a window top-k, better physics for huge
    groups; the oracle states it as the window form."""
    return agg_topk_per_group(
        load(spark, sf_dir, "lineitem"),
        group="l_suppkey",
        order_cols=["l_quantity", "l_orderkey", "l_linenumber"],
        k=3,
    )


AGG_TOPK_QUANTITIES_SQL = """
SELECT l_suppkey, rnk, l_quantity, l_orderkey, l_linenumber FROM (
  SELECT l_suppkey, l_quantity, l_orderkey, l_linenumber,
    CAST(row_number() OVER (
      PARTITION BY l_suppkey
      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS INT) AS rnk
  FROM lineitem
) WHERE rnk <= 3
"""


def orders_table_profile(spark, sf_dir):
    """Per-column null/distinct profile of orders (the data-quality
    validation verb as a query)."""
    return table_profile(load(spark, sf_dir, "orders"))


ORDERS_TABLE_PROFILE_SQL = """
SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  count(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL SELECT 'o_custkey', count(*),
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT o_custkey) FROM orders
UNION ALL SELECT 'o_orderstatus', count(*),
  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT o_orderstatus) FROM orders
UNION ALL SELECT 'o_totalprice', count(*),
  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT o_totalprice) FROM orders
UNION ALL SELECT 'o_orderdate', count(*),
  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT o_orderdate) FROM orders
UNION ALL SELECT 'o_orderpriority', count(*),
  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  count(DISTINCT o_orderpriority) FROM orders
"""


def snapshot_diff_orders(spark, sf_dir):
    """CDC between two deterministic snapshots of ``orders``: the "old"
    state is pre-2000 orders, the "new" state is 1996+ orders with a
    keyed price revision — yielding inserts (2000+), deletes (pre-1996)
    and updates (revised keys in the overlap). Exercises
    ``operators.cdc.snapshot_diff`` (one full-outer join, null-safe
    column compare) through the oracle."""
    from ..operators.cdc import snapshot_diff

    orders = load(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    new = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_orderstatus", "o_totalprice"]
    )


SNAPSHOT_DIFF_ORDERS_SQL = """
WITH old_snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderdate < TIMESTAMP '2000-01-01'
),
new_snap AS (
  SELECT o_orderkey, o_orderstatus,
    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
         ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
)
SELECT o_orderkey, change_type FROM (
  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
    CASE WHEN o.o_orderkey IS NULL THEN 'insert'
         WHEN n.o_orderkey IS NULL THEN 'delete'
         WHEN (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
           THEN 'update' END AS change_type
  FROM old_snap o FULL JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
WHERE change_type IS NOT NULL
"""


_Z_BITS = 8  # 256 buckets per dimension → 16-bit Morton codes


def zorder_curve_stats(spark, sf_dir):
    """Z-order (Morton-curve) clustering made driver-checkable: bucket
    both part dimensions (price, size) to 8 bits, interleave into the
    16-bit curve code, and profile 64 curve segments — per segment the
    bounding box of BOTH dimensions, the property that lets parquet
    footer stats prune files for predicates on EITHER column after an
    OPTIMIZE-ZORDER-style rewrite (``operators/layout.py::zorder_write``
    does the actual write; the quantitative footer-stats gate lives in
    tests). All shift/mask integer algebra inside whole-stage codegen;
    one broadcast of the scalar bounds; one bounded-key groupBy."""
    from ..operators.layout import bucketize, morton_code

    part = load(spark, sf_dir, "part")
    bounds = part.agg(
        F.min("p_retailprice").alias("xlo"),
        F.max("p_retailprice").alias("xhi"),
        F.min("p_size").cast("double").alias("ylo"),
        F.max("p_size").cast("double").alias("yhi"),
    )
    df = part.crossJoin(F.broadcast(bounds))
    xb = bucketize(
        F.col("p_retailprice"), F.col("xlo"), F.col("xhi"), _Z_BITS
    )
    yb = bucketize(
        F.col("p_size").cast("double"), F.col("ylo"), F.col("yhi"), _Z_BITS
    )
    z = morton_code(xb, yb, bits=_Z_BITS)
    return (
        df.select(z.alias("zc"), "p_retailprice", "p_size")
        .select(
            F.expr("zc div 1024").alias("z_bucket"),
            "p_retailprice",
            "p_size",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("x_min"),
            F.max("p_retailprice").alias("x_max"),
            F.min("p_size").cast("long").alias("size_min"),
            F.max("p_size").cast("long").alias("size_max"),
        )
    )


def _morton_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


ZORDER_CURVE_STATS_SQL = f"""
WITH b AS (
  SELECT min(p_retailprice) AS xlo, max(p_retailprice) AS xhi,
    CAST(min(p_size) AS DOUBLE) AS ylo, CAST(max(p_size) AS DOUBLE) AS yhi
  FROM part
),
coded AS (
  SELECT p_retailprice, p_size,
    least(CAST(floor((p_retailprice - xlo) / (xhi - xlo) * 256) AS BIGINT),
          255) AS xb,
    least(CAST(floor((CAST(p_size AS DOUBLE) - ylo) / (yhi - ylo) * 256)
          AS BIGINT), 255) AS yb
  FROM part, b
),
z AS (
  SELECT p_retailprice, p_size, ({_morton_sql('xb', 'yb', _Z_BITS)}) AS zc
  FROM coded
)
SELECT zc // 1024 AS z_bucket, count(*) AS n_parts,
  min(p_retailprice) AS x_min, max(p_retailprice) AS x_max,
  CAST(min(p_size) AS BIGINT) AS size_min,
  CAST(max(p_size) AS BIGINT) AS size_max
FROM z GROUP BY 1
"""


QUERIES = {
    "zorder_curve_stats": QuerySpec(
        "zorder_curve_stats", zorder_curve_stats, ZORDER_CURVE_STATS_SQL,
        "Morton-curve segment profile: both-dimension bounding boxes",
        ("advanced", "layout"),
    ),
    "snapshot_diff_orders": QuerySpec(
        "snapshot_diff_orders", snapshot_diff_orders, SNAPSHOT_DIFF_ORDERS_SQL,
        "CDC snapshot diff: insert/delete/update rows between table states",
        ("cdc", "join", "operators"),
    ),
    "agg_topk_quantities": QuerySpec(
        "agg_topk_quantities", agg_topk_quantities, AGG_TOPK_QUANTITIES_SQL,
        "Top-k per group via bounded collect-sort-slice (no window)",
        ("topk", "agg", "operators"),
    ),
    "orders_table_profile": QuerySpec(
        "orders_table_profile", orders_table_profile, ORDERS_TABLE_PROFILE_SQL,
        "Per-column null/distinct data-quality profile",
        ("agg", "validation"),
    ),
    "asof_join_clicks": QuerySpec(
        "asof_join_clicks", asof_join_clicks, ASOF_JOIN_CLICKS_SQL,
        "As-of join (union-window composition) vs DuckDB ASOF JOIN",
        ("asof", "join", "operators"),
    ),
    "band_join_parts": QuerySpec(
        "band_join_parts", band_join_parts, BAND_JOIN_PARTS_SQL,
        "Broadcast range join into price bands", ("range-join", "operators"),
    ),
    "salted_agg_lineitem": QuerySpec(
        "salted_agg_lineitem", salted_agg_lineitem, SALTED_AGG_LINEITEM_SQL,
        "Skew-salted two-phase aggregation (== plain groupBy)",
        ("skew", "agg", "operators"),
    ),
    "orders_expectation_gate": QuerySpec(
        "orders_expectation_gate", orders_expectation_gate,
        ORDERS_EXPECTATION_GATE_SQL,
        "Single-pass expectation rules incl. a tolerated band and a "
        "genuinely failing date rule",
        ("quality", "operators"),
    ),
    "events_freshness_gate": QuerySpec(
        "events_freshness_gate", events_freshness_gate,
        EVENTS_FRESHNESS_GATE_SQL,
        "Per-source freshness gate against an injected as-of",
        ("quality", "operators"),
    ),
    "rollup_day_by_type": QuerySpec(
        "rollup_day_by_type", rollup_day_by_type, ROLLUP_DAY_BY_TYPE_SQL,
        "Hour->day rollup cascade == direct aggregation of raw facts",
        ("timeseries", "agg", "operators"),
    ),
    "mg_heavy_hitter_tokens": QuerySpec(
        "mg_heavy_hitter_tokens", mg_heavy_hitter_tokens,
        MG_HEAVY_HITTER_TOKENS_SQL,
        "Misra-Gries heavy hitters with exact recount == full groupBy",
        ("sketch", "text", "operators"),
    ),
    "salted_join_hotkey": QuerySpec(
        "salted_join_hotkey", salted_join_hotkey, SALTED_JOIN_HOTKEY_SQL,
        "Hot-key-scoped salted join (== plain join) on a power-law "
        "routed key",
        ("skew", "join", "operators"),
    ),
    "quantity_profile": QuerySpec(
        "quantity_profile", quantity_profile, QUANTITY_PROFILE_SQL,
        "Exact per-group profile incl. median", ("agg", "operators"),
    ),
    "grouping_sets_revenue": QuerySpec(
        "grouping_sets_revenue", grouping_sets_revenue,
        GROUPING_SETS_REVENUE_SQL,
        "Explicit GROUPING SETS aggregation", ("agg",),
    ),
}


def shard_movement_report(spark, sf_dir):
    """Rendezvous-hashing re-shard stability: the (shard_before,
    shard_after) transition matrix for growing an 8-shard layout to 9
    (`operators/layout.py::shard_movement_report`). With HRW hashing
    every moved key must land on the NEW shard — the consistent-
    placement property that keeps a 100 TB re-shard to ~1/9 of the
    data instead of the 8/9 a mod-N layout would move."""
    from ..operators.layout import shard_movement_report as report

    return report(
        load(spark, sf_dir, "documents").select("doc_id"),
        "doc_id", n_before=8, n_after=9,
    )


SHARD_MOVEMENT_REPORT_SQL = """
WITH keys AS (SELECT doc_id FROM documents),
before_w AS (
  SELECT doc_id, s, md5(s || '|' || CAST(doc_id AS VARCHAR)) AS w
  FROM keys, range(0, 8) t(s)
),
before_a AS (
  SELECT doc_id, s AS shard_before FROM (
    SELECT doc_id, s,
      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
    FROM before_w
  ) WHERE rn = 1
),
after_w AS (
  SELECT doc_id, s, md5(s || '|' || CAST(doc_id AS VARCHAR)) AS w
  FROM keys, range(0, 9) t(s)
),
after_a AS (
  SELECT doc_id, s AS shard_after FROM (
    SELECT doc_id, s,
      row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, s) AS rn
    FROM after_w
  ) WHERE rn = 1
)
SELECT b.shard_before, a.shard_after,
  CAST(count(*) AS BIGINT) AS n_keys,
  (b.shard_before != a.shard_after) AS is_move
FROM before_a b JOIN after_a a USING (doc_id)
GROUP BY b.shard_before, a.shard_after
"""


QUERIES["shard_movement_report"] = QuerySpec(
    "shard_movement_report", shard_movement_report,
    SHARD_MOVEMENT_REPORT_SQL,
    "Rendezvous-hash re-shard transition matrix (8 to 9 shards)",
    ("layout", "operators"),
)
