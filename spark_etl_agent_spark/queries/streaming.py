"""Streaming inventory entries: genuine Structured Streaming pipelines
(file source → watermark → windowed state) executed with
Trigger.AvailableNow and returned as batch frames — so the driver's
DuckDB oracle checks *streaming* results value-for-value. Tumbling,
sliding, and gap-based session windows all surface this way; the
stateful ops that cannot (watermark dedup, foreachBatch sinks,
applyInPandasWithState) are pytest-verified against batch twins in
``tests/test_streaming.py``.

Oracle notes: Spark windows align to the Unix epoch, so a 3-hour slide
start is day-trunc + 3h·⌊hour/3⌋ and each event lands in exactly two
6h/3h sliding windows (that start and the one 3h earlier). Session
windows close at last-event + gap with an *exclusive* end — an event
arriving exactly ``gap`` after the previous one starts a NEW session,
so the oracle's break condition is ``>=`` (the batch ``sessionization``
query deliberately uses ``>``, the other boundary convention)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..streaming import (
    dedup_within_watermark,
    events_stream,
    run_available_now,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)
from .base import QuerySpec


def streaming_tumbling_agg(spark, sf_dir):
    return run_available_now(
        tumbling_window_counts(events_stream(spark, sf_dir)),
        output_mode="complete",
    )


STREAMING_TUMBLING_AGG_SQL = """
SELECT
  date_trunc('day', ts) + INTERVAL 6 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INTEGER) AS window_start,
  date_trunc('day', ts) + INTERVAL 6 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 6) + 1 AS INTEGER) AS window_end,
  event_type,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def streaming_sliding_agg(spark, sf_dir):
    return run_available_now(
        sliding_window_counts(events_stream(spark, sf_dir)),
        output_mode="complete",
    )


STREAMING_SLIDING_AGG_SQL = """
WITH starts AS (
  SELECT event_type,
    date_trunc('day', ts) + INTERVAL 3 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 3) AS INTEGER) AS s0
  FROM events
),
expanded AS (
  SELECT s0 AS window_start, event_type FROM starts
  UNION ALL
  SELECT s0 - INTERVAL 3 HOUR AS window_start, event_type FROM starts
)
SELECT window_start,
  window_start + INTERVAL 6 HOUR AS window_end,
  event_type,
  COUNT(*) AS n_events
FROM expanded
GROUP BY 1, 2, 3
"""


def streaming_session_agg(spark, sf_dir):
    return run_available_now(
        session_window_stats(events_stream(spark, sf_dir)),
        output_mode="complete",
    )


STREAMING_SESSION_AGG_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
  CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
  user_id,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, session_id
"""


def streaming_watermark_dedup(spark, sf_dir):
    """Stateful streaming dedup (``dropDuplicatesWithinWatermark``) on
    (user_id, event_type): state holds each key only until the
    watermark passes it — the bounded-state dedup for unbounded input.
    The kept row's non-key columns are arrival-order-dependent, so the
    oracled output projects exactly the dedup keys (deterministic:
    the distinct key set)."""
    stream = events_stream(spark, sf_dir).select("ts", "user_id", "event_type")
    deduped = dedup_within_watermark(stream, keys=["user_id", "event_type"])
    out = run_available_now(deduped, output_mode="append")
    return out.select("user_id", "event_type")


STREAMING_WATERMARK_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


def streaming_static_enrichment(spark, sf_dir):
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch — no stream state for
    the static side), then windowed per market segment. The canonical
    'enrich facts with dims in flight' shape."""
    from .base import load

    stream = events_stream(spark, sf_dir)
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(customer, "user_id")
    agg = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("decimal(18,4)")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )
    return run_available_now(agg, output_mode="complete")


STREAMING_STATIC_ENRICHMENT_SQL = """
SELECT
  date_trunc('day', ts) + INTERVAL 6 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INTEGER) AS window_start,
  date_trunc('day', ts) + INTERVAL 6 HOUR * CAST(FLOOR(EXTRACT(hour FROM ts) / 6) + 1 AS INTEGER) AS window_end,
  c_mktsegment,
  COUNT(*) AS n_events,
  CAST(CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2, 3
"""


def streaming_stream_join(spark, sf_dir):
    """Stream-STREAM interval join (the attribution join): each click
    joined to the same user's purchases within 2 h after it, both sides
    watermarked so state stays bounded on unbounded input
    (`streaming/pipeline.py::click_purchase_conversions`). The hardest
    built-in streaming op — two stateful sides shuffled on user_id,
    event-time range pruning state within each key."""
    from ..streaming import click_purchase_conversions

    return run_available_now(
        click_purchase_conversions(events_stream(spark, sf_dir)),
        output_mode="append",
    )


STREAMING_STREAM_JOIN_SQL = """
SELECT c.user_id,
  c.event_id AS click_id, c.ts AS click_ts,
  p.event_id AS purchase_id, p.ts AS purchase_ts,
  p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 120 MINUTE
"""


def streaming_running_totals(spark, sf_dir):
    """Custom keyed-state operator surfaced for the driver:
    ``applyInPandasWithState`` accumulates per-user running totals
    (count, exact micro-unit value sum, last event time) across
    micro-batches; Update mode emits a row per (user, batch), so the
    final state per user is the max-count row. The oracle is the batch
    twin — after consuming ALL input, cumulative state per user equals
    a plain groupBy. Value sums accumulate in integer micro-units
    (value·10⁴) so state never drifts across batch boundaries.

    Floor analysis (round-8 re-measure of the round-7 3.10 s reading):
    the input is ONE micro-batch in every era (recentProgress length 1;
    AvailableNow over a single parquet file), and the standalone warm
    wall re-measures at 1.76-2.08 s — bit-identical to the round-6
    bench (1.78 s). Per-phase: ~0.12 s stream build (schema footer
    read), ~1.45 s for the single micro-batch (state-store shuffle +
    Arrow worker round-trip + state commit + memory-sink write — the
    fixed engine floor per batch; the oracle's 0.011 s plain GROUP BY
    pays none of it), ~0.2 s for the max-count window over the sink.
    Nothing added a batch or a state round-trip in round 7 — the 3.10 s
    bench reading was run-order overlap in the pipelined bench loop
    (this query EXECUTES during its build phase, so its wall depends on
    what the loop overlapped it with) plus host-load noise. The
    per-batch constant amortizes at scale: batch count is set by the
    trigger cadence, not data volume."""
    from pyspark.sql import Window

    from ..streaming.stateful import user_running_totals

    out = run_available_now(
        user_running_totals(events_stream(spark, sf_dir)),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


STREAMING_RUNNING_TOTALS_SQL = """
SELECT user_id,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
  MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


QUERIES = {
    "streaming_static_enrichment": QuerySpec(
        "streaming_static_enrichment", streaming_static_enrichment,
        STREAMING_STATIC_ENRICHMENT_SQL,
        "Stream-static dimension enrichment join + windowed agg, oracled",
        ("streaming", "join", "window-agg"),
    ),
    "streaming_watermark_dedup": QuerySpec(
        "streaming_watermark_dedup", streaming_watermark_dedup,
        STREAMING_WATERMARK_DEDUP_SQL,
        "Stateful dropDuplicatesWithinWatermark dedup (AvailableNow), oracled",
        ("streaming", "dedup"),
    ),
    "streaming_tumbling_agg": QuerySpec(
        "streaming_tumbling_agg", streaming_tumbling_agg,
        STREAMING_TUMBLING_AGG_SQL,
        "Structured Streaming tumbling windows (AvailableNow), oracled",
        ("streaming", "window-agg"),
    ),
    "streaming_sliding_agg": QuerySpec(
        "streaming_sliding_agg", streaming_sliding_agg,
        STREAMING_SLIDING_AGG_SQL,
        "Structured Streaming sliding 6h/3h windows (AvailableNow), oracled",
        ("streaming", "window-agg"),
    ),
    "streaming_session_agg": QuerySpec(
        "streaming_session_agg", streaming_session_agg,
        STREAMING_SESSION_AGG_SQL,
        "Structured Streaming gap-based session windows (AvailableNow), oracled",
        ("streaming", "window-agg"),
    ),
    "streaming_running_totals": QuerySpec(
        "streaming_running_totals", streaming_running_totals,
        STREAMING_RUNNING_TOTALS_SQL,
        "applyInPandasWithState keyed running totals (AvailableNow), oracled",
        ("streaming", "stateful"),
    ),
    "streaming_stream_join": QuerySpec(
        "streaming_stream_join", streaming_stream_join,
        STREAMING_STREAM_JOIN_SQL,
        "Watermarked stream-stream interval join (attribution), oracled",
        ("streaming", "join"),
    ),
}
