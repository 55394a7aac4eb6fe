"""Time-series queries: calendar gap-filling with carry-forward and
rolling 7-day distinct actives — `operators/timeseries.py` oracled.

The gap-fill input is a hash-sparse event subset (``event_id % 97``) so
missing days genuinely exist at every scale factor — a value threshold
would be scale-dependent and could empty out (or fill in) as SF grows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.timeseries import gap_fill, rolling_distinct_count
from .base import QuerySpec, load


def gap_fill_daily(spark, sf_dir):
    """Daily event count/value per event_type on the sparse subset,
    gap-filled over the full calendar with carry-forward sums."""
    ev = load(spark, sf_dir, "events")
    sparse = ev.filter(F.col("event_id") % 97 == 0)
    daily = sparse.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,4)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("sum_value"),
    )
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("_min_day"),
        F.max(F.col("ts").cast("date")).alias("_max_day"),
    )
    out = gap_fill(
        daily,
        keys=["event_type"],
        day_col="day",
        value_cols=["sum_value"],
        bounds=bounds,
    )
    return out.select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "is_gap",
        "sum_value",
        "sum_value_ff",
    )


GAP_FILL_DAILY_SQL = """
WITH sparse AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value
  FROM events WHERE event_id % 97 = 0
),
daily AS (
  SELECT event_type, day, count(*) AS n_events,
    CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE)
      AS sum_value
  FROM sparse GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(min(ts) AS DATE) AS min_day, CAST(max(ts) AS DATE) AS max_day
  FROM events
),
spine AS (
  SELECT k.event_type, CAST(d.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) k,
       (SELECT unnest(generate_series(min_day, max_day, INTERVAL 1 DAY)) AS day
        FROM bounds) d
)
SELECT s.event_type, s.day,
  coalesce(dl.n_events, 0) AS n_events,
  (dl.sum_value IS NULL) AS is_gap,
  dl.sum_value,
  last_value(dl.sum_value IGNORE NULLS) OVER (
    PARTITION BY s.event_type ORDER BY s.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ff
FROM spine s LEFT JOIN daily dl ON s.event_type = dl.event_type AND s.day = dl.day
"""


def rolling_active_users(spark, sf_dir):
    """Trailing 7-day distinct active users per day — dedup-first +
    bounded explode, never a COUNT(DISTINCT) window frame."""
    ev = load(spark, sf_dir, "events")
    with_day = ev.select("user_id", F.col("ts").cast("date").alias("day"))
    max_day = ev.agg(F.max(F.col("ts").cast("date")).alias("_mx"))
    out = rolling_distinct_count(
        with_day.join(F.broadcast(max_day)),
        entity_col="user_id",
        day_col="day",
        window_days=7,
        max_day=F.col("_mx"),
    )
    return out.withColumnRenamed("n_user_id_7d", "n_active_7d")


ROLLING_ACTIVE_USERS_SQL = """
WITH deduped AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT CAST(max(ts) AS DATE) AS max_day FROM events),
contributes AS (
  SELECT user_id,
    CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE)
      AS window_day
  FROM deduped
)
SELECT window_day, count(DISTINCT user_id) AS n_active_7d
FROM contributes, mx
WHERE window_day <= max_day
GROUP BY window_day
"""


QUERIES = {
    "gap_fill_daily": QuerySpec(
        "gap_fill_daily", gap_fill_daily, GAP_FILL_DAILY_SQL,
        "Calendar spine gap-fill with last-value carry-forward",
        ("timeseries", "window", "operators"),
    ),
    "rolling_active_users": QuerySpec(
        "rolling_active_users", rolling_active_users,
        ROLLING_ACTIVE_USERS_SQL,
        "Trailing 7-day distinct actives: dedup-first + bounded explode",
        ("timeseries", "agg", "operators"),
    ),
}
