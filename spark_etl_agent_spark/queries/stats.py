"""Statistical-moment aggregates and incremental aggregate maintenance.

``var_samp``/``stddev``/``corr`` built-ins stream doubles in
engine-specific order, so their low bits differ between Spark and any
oracle — unusable for hash-checked parity. The moments gallery instead
carries the *sufficient statistics* (n, Σx, Σx², Σxy) as exact decimals
(the inputs are integer- or cent-valued, so the decimal products are
exact) and derives variance/stddev/correlation from them with a fixed
sequence of double ops, quantized to integer micro/nano-units on output
(compiled engines may contract a·b+c chains into FMA — a 1-2 ULP wobble
that integer units absorb; measured on the corr chain vs DuckDB). This
is the decimal-sufficient-statistics idiom of
``functions/deterministic.py`` extended to second moments, plus the
``tfidf_micro`` quantization idiom for the derived ratios.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.incremental import merge_partial_aggs
from .base import QuerySpec, load


def stat_moments_gallery(spark, sf_dir):
    """Per-returnflag variance / stddev of quantity and the
    quantity-price correlation, all from exact decimal sufficient
    statistics (see module docstring)."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(9,2)")
    p = F.col("l_extendedprice").cast("decimal(10,2)")
    suff = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("_sq"),
        F.sum(p).alias("_sp"),
        F.sum(q * q).alias("_sqq"),
        F.sum(p * p).alias("_spp"),
        F.sum(q * p).alias("_sqp"),
    )
    n = F.col("n").cast("double")
    sq = F.col("_sq").cast("double")
    sp = F.col("_sp").cast("double")
    sqq = F.col("_sqq").cast("double")
    spp = F.col("_spp").cast("double")
    sqp = F.col("_sqp").cast("double")
    var_q = (sqq - sq * sq / n) / (n - F.lit(1.0))
    var_p = (spp - sp * sp / n) / (n - F.lit(1.0))
    cov_qp = (sqp - sq * sp / n) / (n - F.lit(1.0))
    # quantized to integer micro/nano-units: compiled engines may
    # contract a*b+c into FMA, wobbling the last 1-2 ULP of the chain —
    # integer units absorb it (same idiom as tfidf_micro)
    return suff.select(
        "l_returnflag",
        "n",
        F.floor(var_q * 1e6).cast("bigint").alias("var_qty_micro"),
        F.floor(F.sqrt(var_q) * 1e6).cast("bigint").alias("std_qty_micro"),
        F.floor(cov_qp / (F.sqrt(var_q) * F.sqrt(var_p)) * 1e9)
        .cast("bigint")
        .alias("corr_qty_price_nano"),
    )


STAT_MOMENTS_GALLERY_SQL = """
WITH suff AS (
  SELECT l_returnflag, count(*) AS n,
    SUM(CAST(l_quantity AS DECIMAL(9,2))) AS sq,
    SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS sp,
    SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)))
      AS sqq,
    SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_extendedprice AS DECIMAL(10,2)))
      AS spp,
    SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(10,2)))
      AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  CAST(FLOOR(
    (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(n AS DOUBLE) - 1.0) * 1e6) AS BIGINT) AS var_qty_micro,
  CAST(FLOOR(
    sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT) AS std_qty_micro,
  CAST(FLOOR(
    ((CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(n AS DOUBLE) - 1.0))
    / (sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(n AS DOUBLE) - 1.0))
       * sqrt((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
        / (CAST(n AS DOUBLE) - 1.0))) * 1e9) AS BIGINT) AS corr_qty_price_nano
FROM suff
"""


def incremental_revenue_agg(spark, sf_dir):
    """Aggregate maintenance without a reload: a stored pre-2000
    aggregate merged with the 2000+ delta aggregate must equal the
    full-table aggregate (which is exactly what the oracle computes) —
    the merge touches only partials, never the full fact table."""
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("2000-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,4)")).alias("_rev"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = merge_partial_aggs(
        base,
        delta,
        keys=["o_orderstatus"],
        measures=[
            ("n_orders", "count"),
            ("_rev", "sum"),
            ("first_order", "min"),
            ("last_order", "max"),
        ],
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        F.col("_rev").cast("decimal(20,4)").cast("double").alias("revenue"),
        "first_order",
        "last_order",
    )


INCREMENTAL_REVENUE_AGG_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS DECIMAL(20,4)) AS DOUBLE)
    AS revenue,
  min(o_orderdate) AS first_order,
  max(o_orderdate) AS last_order
FROM orders GROUP BY o_orderstatus
"""


def value_outlier_fences(spark, sf_dir):
    """IQR outlier detection per group: Tukey fences (q1 − 1.5·IQR,
    q3 + 1.5·IQR) over event values, plus the count of rows outside
    them (the right-tailed value distribution genuinely trips the
    upper fence — ~5% per type).

    Exactness: values are floored to integer cents FIRST (explicit
    ``floor`` — Spark's double→bigint cast truncates while DuckDB's
    rounds), so percentile interpolation is dyadic-fraction × integer
    — exact binary doubles with nothing for FMA contraction to wobble.

    Scale: quantiles come from ``operators.ranks.grouped_quantile_cont``
    (range-partitioned per-group ranks, interpolate at the two needed
    ranks) — Spark's exact ``percentile()`` aggregate buffers a whole
    group's values on one reducer, an OOM by construction when a
    handful of event types cover a 100 TB fact table. Identical
    result (same (n-1)·q linear interpolation), constant memory."""
    from ..operators.ranks import grouped_quantile_cont

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    fences = grouped_quantile_cont(
        cents, ["event_type"], "cents", [0.25, 0.75]
    ).select(
        "event_type",
        F.col("q_25").alias("q1"),
        F.col("q_75").alias("q3"),
    ).select(
        "event_type",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    return (
        cents.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.sum((F.col("cents") < F.col("lo_fence")).cast("long")).alias(
                "n_below"
            ),
            F.sum((F.col("cents") > F.col("hi_fence")).cast("long")).alias(
                "n_above"
            ),
        )
    )


VALUE_OUTLIER_FENCES_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
fences AS (
  SELECT event_type,
    quantile_cont(cents, 0.25) AS q1,
    quantile_cont(cents, 0.75) AS q3
  FROM c GROUP BY event_type
),
f AS (
  SELECT event_type, q1, q3,
    q1 - 1.5 * (q3 - q1) AS lo_fence,
    q3 + 1.5 * (q3 - q1) AS hi_fence
  FROM fences
)
SELECT c.event_type, f.q1, f.q3, f.lo_fence, f.hi_fence,
  CAST(SUM(CASE WHEN c.cents < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT)
    AS n_below,
  CAST(SUM(CASE WHEN c.cents > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
    AS n_above
FROM c JOIN f ON c.event_type = f.event_type
GROUP BY 1, 2, 3, 4, 5
"""



def join_skew_report(spark, sf_dir):
    """Pre-join skew diagnostic: the 10 heaviest l_suppkey values with
    their share of all lineitem rows, plus p_max/mean concentration —
    the report you run BEFORE deciding between a plain join, AQE skew
    split, or operators.skew.salted_join. One map-side-partial groupBy
    plus a broadcast scalar; the top-10 ORDER BY runs over the (tiny)
    per-key aggregate, never the fact rows."""
    li = load(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_rows"))
    totals = per_key.agg(
        F.sum("n_rows").cast("bigint").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            "l_suppkey",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total")).alias(
                "row_share"
            ),
            (
                F.col("n_rows").cast("double")
                / (F.col("__total").cast("double") / F.col("__nkeys"))
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), "l_suppkey")
        .limit(10)
    )


JOIN_SKEW_REPORT_SQL = """
WITH per_key AS (
  SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey
),
totals AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total,
         count(*) AS nkeys
  FROM per_key
)
SELECT l_suppkey, n_rows,
  CAST(n_rows AS DOUBLE) / total AS row_share,
  CAST(n_rows AS DOUBLE) / (CAST(total AS DOUBLE) / nkeys) AS skew_factor
FROM per_key, totals
ORDER BY n_rows DESC, l_suppkey
LIMIT 10
"""


def histogram_quantile_error(spark, sf_dir):
    """Equi-width histogram quantile sketch accuracy: per return flag,
    P50/P90/P99 of the price (integer cents) estimated from a 64-bucket
    count histogram vs the exact interpolated quantile — the report
    that sizes the bucket count before replacing exact quantiles with
    the mergeable sketch at 100 TB. Exact side via
    ``grouped_quantile_cont`` (no whole-group percentile buffer)."""
    from ..operators.sketches import histogram_quantile_report

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    return histogram_quantile_report(
        li, "l_returnflag", "cents", nbuckets=64
    ).withColumnRenamed("grp", "l_returnflag")


HISTOGRAM_QUANTILE_ERROR_SQL = """
WITH vals AS (
  SELECT l_returnflag AS grp, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
  FROM lineitem WHERE l_extendedprice IS NOT NULL
),
bounds AS (SELECT min(v) AS vmin, max(v) AS vmax FROM vals),
hist AS (
  SELECT grp, ((v - b.vmin) * 64) // (b.vmax - b.vmin + 1) AS bucket,
    count(*) AS cnt, min(b.vmin) AS vmin, min(b.vmax) AS vmax
  FROM vals, bounds b GROUP BY 1, 2
),
sizes AS (SELECT grp, sum(cnt) AS n FROM hist GROUP BY grp),
-- q literals MUST be DOUBLE: DuckDB parses 0.9 as DECIMAL, making
-- (n-1)*q exact where Spark's double math carries a 1e-13 tail —
-- which flips floor() at integer boundaries and shifts frac
qs(q_pct, q) AS (VALUES (50, CAST(0.5 AS DOUBLE)),
                        (90, CAST(0.9 AS DOUBLE)),
                        (99, CAST(0.99 AS DOUBLE))),
targets AS (
  SELECT grp, q_pct, q, n,
    CAST(floor((n - 1) * q) + 1 AS BIGINT) AS t
  FROM sizes, qs
),
cum AS (
  SELECT grp, bucket, cnt, vmin, vmax,
    coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM hist
),
est AS (
  SELECT tg.grp, tg.q_pct, CAST(tg.n AS BIGINT) AS n_values,
    CAST(c.vmin AS DOUBLE)
      + c.bucket * ((c.vmax - c.vmin + 1) / 64.0)
      + ((tg.t - c.cumb) / CAST(c.cnt AS DOUBLE))
        * ((c.vmax - c.vmin + 1) / 64.0) AS est_cents
  FROM targets tg JOIN cum c
    ON c.grp = tg.grp AND c.cumb < tg.t AND c.cumb + c.cnt >= tg.t
),
ranked AS (
  SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS r
  FROM vals
),
-- replay grouped_quantile_cont's fixed op order exactly (h = (n-1)·q,
-- frac = h - floor(h), vlo + frac·(vhi - vlo)): DuckDB's own
-- quantile_cont interpolates in a different order and drifts an ulp
-- on non-dyadic q
tgt AS (
  SELECT grp, q_pct,
    (n - 1) * q - floor((n - 1) * q) AS frac,
    CAST(floor((n - 1) * q) + 1 AS BIGINT) AS rlo,
    CAST(least(floor((n - 1) * q) + 2, n) AS BIGINT) AS rhi
  FROM sizes, qs
),
exact AS (
  SELECT t.grp, t.q_pct,
    min(CASE WHEN rk.r = t.rlo THEN CAST(rk.v AS DOUBLE) END)
      + t.frac * (min(CASE WHEN rk.r = t.rhi THEN CAST(rk.v AS DOUBLE) END)
                  - min(CASE WHEN rk.r = t.rlo THEN CAST(rk.v AS DOUBLE) END))
      AS exact_cents
  FROM tgt t JOIN ranked rk
    ON rk.grp = t.grp AND (rk.r = t.rlo OR rk.r = t.rhi)
  GROUP BY t.grp, t.q_pct, t.frac
)
SELECT e.grp AS l_returnflag, e.q_pct, e.n_values, e.est_cents,
  x.exact_cents, e.est_cents - x.exact_cents AS err_cents
FROM est e JOIN exact x ON x.grp = e.grp AND x.q_pct = e.q_pct
"""


QUERIES = {
    "histogram_quantile_error": QuerySpec(
        "histogram_quantile_error", histogram_quantile_error,
        HISTOGRAM_QUANTILE_ERROR_SQL,
        "Histogram quantile sketch vs exact P50/P90/P99 error report",
        ("agg", "stats", "sketch"),
    ),
    "value_outlier_fences": QuerySpec(
        "value_outlier_fences", value_outlier_fences,
        VALUE_OUTLIER_FENCES_SQL,
        "Tukey IQR fences + outlier counts (exact dyadic percentiles)",
        ("agg", "stats", "validation"),
    ),
    "stat_moments_gallery": QuerySpec(
        "stat_moments_gallery", stat_moments_gallery, STAT_MOMENTS_GALLERY_SQL,
        "Deterministic variance/stddev/corr from decimal sufficient stats",
        ("agg", "stats"),
    ),
    "join_skew_report": QuerySpec(
        "join_skew_report", join_skew_report, JOIN_SKEW_REPORT_SQL,
        "Join-key skew diagnostic: heaviest keys, share, skew factor",
        ("agg", "stats", "skew"),
    ),
    "incremental_revenue_agg": QuerySpec(
        "incremental_revenue_agg", incremental_revenue_agg,
        INCREMENTAL_REVENUE_AGG_SQL,
        "Incremental aggregate maintenance: base+delta merge == full agg",
        ("agg", "incremental", "operators"),
    ),
}
