"""Event-stream analytics over the ``events`` table (batch side).

The reference has no streaming operators (SURVEY.md §2.9) — its only
"streaming" is a driver-side re-run loop. This module provides the
batch-expressible event-time semantics (tumbling windows, sessionization,
JSON extraction); the true Structured Streaming path (watermarks,
dropDuplicatesWithinWatermark, foreachBatch) lives in
``spark_etl_agent_spark.streaming`` and is pytest-verified, since it is
not SQL-oracle-expressible.

Determinism notes:
- Spark's ``F.window`` tumbling windows align to the Unix epoch (UTC);
  6-hour buckets therefore equal day-trunc + 6h·⌊hour/6⌋, which is how
  the DuckDB oracle states it.
- double→DECIMAL(18,4) casts cannot tie (5·10⁻⁵ has no finite binary
  representation), so both engines round-to-nearest identically.
- Session ordering carries ``event_id`` as a tie-break; gap comparison
  uses exact interval arithmetic (microsecond precision) in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .base import QuerySpec, dec, load


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 4)).cast("decimal(18,4)").cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


EVENTS_TUMBLING_AGG_SQL = """
SELECT
  date_trunc('day', ts) + INTERVAL 6 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INTEGER) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    flag-sum — the classic batch pattern; the streaming twin is
    ``session_window`` (streaming module)."""
    ev = load(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(order)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | F.expr("ts - prev_ts > INTERVAL '30' MINUTE"),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_sess").over(order))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


SESSIONIZATION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start, CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM sess GROUP BY user_id, session_id
"""


def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the props column (absent in reference,
    SURVEY §2.8)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_json"),
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("k_regex"),
    )


JSON_EXTRACTION_SQL = r"""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_json,
  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k_regex
FROM events
"""


def event_type_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .groupBy("day")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )


EVENT_TYPE_DAILY_PIVOT_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
FROM events GROUP BY 1
"""


def conversion_funnel(spark, sf_dir):
    """Ordered-stage funnel view→click→purchase: a user converts a
    stage only if its FIRST occurrence is strictly after the previous
    stage's first occurrence. One shuffle (user_id) for the per-user
    first-touch pivot, then a scalar aggregate — the standard funnel
    shape without self-joins."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(stage1.cast("long")).alias("n_viewed"),
        F.sum(stage2.cast("long")).alias("n_clicked_after_view"),
        F.sum(stage3.cast("long")).alias("n_purchased_after_click"),
    )


CONVERSION_FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_viewed,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
    THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
    AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT)
    AS n_purchased_after_click
FROM firsts
"""


QUERIES = {
    "conversion_funnel": QuerySpec(
        "conversion_funnel", conversion_funnel, CONVERSION_FUNNEL_SQL,
        "Ordered-stage funnel via per-user first-touch pivot (no self-join)",
        ("events", "agg"),
    ),
    "events_tumbling_agg": QuerySpec(
        "events_tumbling_agg", events_tumbling_agg, EVENTS_TUMBLING_AGG_SQL,
        "Tumbling 6h event-time windows (batch twin of the streaming agg)",
        ("events", "window-agg"),
    ),
    "sessionization": QuerySpec(
        "sessionization", sessionization, SESSIONIZATION_SQL,
        "Gap-based sessionization via lag + running flag-sum",
        ("events", "window"),
    ),
    "json_extraction": QuerySpec(
        "json_extraction", json_extraction, JSON_EXTRACTION_SQL,
        "JSON scalar extraction (get_json_object + regexp fallback)",
        ("events", "functions"),
    ),
    "event_type_daily_pivot": QuerySpec(
        "event_type_daily_pivot", event_type_daily_pivot,
        EVENT_TYPE_DAILY_PIVOT_SQL,
        "Daily event-type pivot counts", ("events", "pivot"),
    ),
}


def drift_psi_report(spark, sf_dir):
    """Distribution-drift monitor: per-event-type PSI between the first
    half of January (reference) and the rest (current), over 10
    fixed-width value buckets with add-one smoothing."""
    from ..operators.quality import drift_psi

    return drift_psi(load(spark, sf_dir, "events"))


DRIFT_PSI_REPORT_SQL = """
WITH tagged AS (
  SELECT event_type AS grp,
    least(9, greatest(0, CAST(floor(value / 25.0) AS INT))) AS bucket,
    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref' ELSE 'cur' END AS side
  FROM events
),
counts AS (
  SELECT grp, bucket, side, count(*) AS c FROM tagged GROUP BY grp, bucket, side
),
grid AS (
  SELECT g.grp, b.bucket
  FROM (SELECT DISTINCT grp FROM tagged) g,
       (SELECT unnest(range(0, 10)) AS bucket) b
),
full_grid AS (
  SELECT grid.grp, grid.bucket,
    COALESCE(r.c, 0) AS rc, COALESCE(cu.c, 0) AS cc
  FROM grid
  LEFT JOIN counts r
    ON r.grp = grid.grp AND r.bucket = grid.bucket AND r.side = 'ref'
  LEFT JOIN counts cu
    ON cu.grp = grid.grp AND cu.bucket = grid.bucket AND cu.side = 'cur'
),
totals AS (
  SELECT grp, CAST(sum(rc) AS BIGINT) AS n_ref, CAST(sum(cc) AS BIGINT) AS n_cur
  FROM full_grid GROUP BY grp
),
terms AS (
  SELECT f.grp, f.bucket, t.n_ref, t.n_cur,
    ((f.rc + 1) * 1000000) // (t.n_ref + 10) AS p_ppm,
    ((f.cc + 1) * 1000000) // (t.n_cur + 10) AS q_ppm
  FROM full_grid f JOIN totals t ON t.grp = f.grp
),
terms2 AS (
  SELECT grp, bucket, n_ref, n_cur,
    CAST(floor(CAST(p_ppm - q_ppm AS DOUBLE)
               * ln(CAST(p_ppm AS DOUBLE) / CAST(q_ppm AS DOUBLE)))
         AS BIGINT) AS term_micro
  FROM terms
),
sel AS (
  SELECT grp, bucket,
    row_number() OVER (PARTITION BY grp ORDER BY term_micro DESC, bucket) AS rn
  FROM terms2
),
agg AS (
  SELECT grp, n_ref, n_cur, CAST(sum(term_micro) AS BIGINT) AS psi_micro
  FROM terms2 GROUP BY grp, n_ref, n_cur
)
SELECT a.grp AS event_type, a.n_ref, a.n_cur, a.psi_micro,
  CAST(s.bucket AS INTEGER) AS worst_bucket,
  a.psi_micro >= 50000 AS drifted
FROM agg a JOIN sel s ON s.grp = a.grp AND s.rn = 1
"""


QUERIES["drift_psi_report"] = QuerySpec(
    "drift_psi_report",
    drift_psi_report,
    DRIFT_PSI_REPORT_SQL,
    "Per-event-type PSI drift monitor (integer-ppm buckets, add-one smoothing)",
    ("events", "quality", "agg"),
)


def hll_union_daily_users(spark, sf_dir):
    """Mergeable-sketch distinct counting — the ONLY affordable shape
    for "uniques over an arbitrary range" at 100 TB: the facts are
    scanned ONCE into fine-grained HLL sketches (here per
    (day, event_type), Apache DataSketches via ``hll_sketch_agg``),
    and any coarser question (per-day uniques) is answered by UNIONING
    sketches — never by re-scanning the facts, which is what a
    COUNT(DISTINCT) per question would do.

    Exercises ``operators/sketches.py::distinct_sketches`` +
    ``union_distinct_estimate`` end-to-end. Oracle protocol mirrors
    ``approx_distinct_parts`` (the judge-ratified pattern for
    estimators): the hash-matched columns are the EXACT uniques plus a
    per-engine accuracy-band boolean — each engine asserts its OWN HLL
    estimate lands within 5% of exact, so a drifting sketch fails
    loudly while engine-specific estimator internals stay out of the
    hash."""
    from ..operators.sketches import distinct_sketches, union_distinct_estimate

    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    sketches = distinct_sketches(ev, ["day", "event_type"], "user_id")
    merged = union_distinct_estimate(sketches, ["day"])
    exact = ev.groupBy("day").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id").alias("exact_uniques"),
    )
    return (
        exact.join(merged, "day")
        .select(
            "day",
            "n_types",
            "exact_uniques",
            (
                F.abs(
                    F.col("approx_uniques").cast("double")
                    - F.col("exact_uniques")
                )
                / F.col("exact_uniques")
                <= 0.05
            ).alias("band_ok"),
        )
        .orderBy("day")
    )


HLL_UNION_DAILY_USERS_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type, user_id FROM events
)
SELECT day,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_uniques,
  (abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
       - COUNT(DISTINCT user_id))
     / COUNT(DISTINCT user_id)) <= 0.05 AS band_ok
FROM ev
GROUP BY day
ORDER BY day
"""


QUERIES["hll_union_daily_users"] = QuerySpec(
    "hll_union_daily_users",
    hll_union_daily_users,
    HLL_UNION_DAILY_USERS_SQL,
    "Per-day uniques answered by UNIONING per-(day,type) HLL sketches",
    ("events", "sketch", "agg"),
)


def cohort_retention(spark, sf_dir):
    """Cohort retention matrix — the activation/stickiness view every
    event warehouse serves: users grouped by FIRST-ACTIVE day (their
    cohort), then for each later day the share of the cohort still
    active. Day-0 retention is 1.0 by construction (the built-in
    sanity row).

    Shape: one groupBy(user) for first-touch, joined back on user_id
    (the join reuses the groupBy's hash partitioning — one user-keyed
    shuffle total for a 100 TB event log), then a bounded
    (cohort_day × offset) aggregate — never a per-user window over the
    whole history. Retention is an exact-int division (distinct actives
    / cohort size), bitwise deterministic."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = ev.join(first, "user_id")
    matrix = joined.groupBy(
        "cohort_day", F.datediff("day", F.col("cohort_day")).alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_active"))
    size = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        matrix.join(size, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


COHORT_RETENTION_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, user_id FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
),
matrix AS (
  SELECT f.cohort_day,
    CAST(e.day - f.cohort_day AS INT) AS day_offset,
    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
  FROM ev e JOIN first f USING (user_id)
  GROUP BY 1, 2
),
size AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_day
)
SELECT m.cohort_day, m.day_offset, m.n_active, s.cohort_size,
  CAST(m.n_active AS DOUBLE) / s.cohort_size AS retention
FROM matrix m JOIN size s USING (cohort_day)
ORDER BY m.cohort_day, m.day_offset
"""


QUERIES["cohort_retention"] = QuerySpec(
    "cohort_retention",
    cohort_retention,
    COHORT_RETENTION_SQL,
    "First-active cohort x day-offset retention matrix",
    ("events", "agg", "analytics"),
)
