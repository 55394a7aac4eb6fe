"""Streaming inventory entry: the genuine Structured Streaming pipeline
(file source → watermark → tumbling windows) executed with
Trigger.AvailableNow and returned as a batch frame — so the driver's
DuckDB oracle checks *streaming* results value-for-value. The stateful
ops that cannot surface this way (session windows, watermark dedup,
foreachBatch sinks) are pytest-verified against batch twins in
``tests/test_streaming.py``."""

from __future__ import annotations

from ..streaming import events_stream, run_available_now, tumbling_window_counts
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


QUERIES = {
    "streaming_tumbling_agg": QuerySpec(
        "streaming_tumbling_agg", streaming_tumbling_agg,
        STREAMING_TUMBLING_AGG_SQL,
        "Structured Streaming tumbling windows (AvailableNow), oracled",
        ("streaming", "window-agg"),
    ),
}
