"""Structured Streaming (north-star extension — the reference has no
streaming at all, SURVEY.md §2.9; its only "streaming" is a driver-side
re-run loop, reproduced in ``jobs.runner``). Real event-time pipelines
over the ``events`` table live in :mod:`.pipeline`."""

from .pipeline import (
    click_purchase_conversions,
    dedup_within_watermark,
    events_stream,
    load_with_verify_sink,
    run_available_now,
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)
from .stateful import user_running_totals

__all__ = [
    "click_purchase_conversions",
    "events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_stats",
    "dedup_within_watermark",
    "load_with_verify_sink",
    "run_available_now",
    "user_running_totals",
]
