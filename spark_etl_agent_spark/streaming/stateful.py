"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 — the extension path for semantics the built-in
windows/dedup cannot express).

``user_running_totals`` keeps per-user cumulative state (event count,
value sum, last-seen timestamp) across micro-batches and emits the
updated row whenever the user appears in a batch. State is keyed and
partitioned by user — at 100 TB the state store shards with the
shuffle, and Arrow batches keep the Python boundary vectorized. The
value sum is accumulated in integer micro-units (value·10⁴ rounded) so
state never drifts and the batch twin matches exactly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value_micros long, last_ts timestamp"
)
STATE_SCHEMA = "n long, sv long, last long"


def _update_user_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, sv, last = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer accumulation of value·1e4 (micro-unit cents)
        sv += int((pdf["value"] * 10_000).round().astype("int64").sum())
        batch_last = pdf["ts"].max()
        last = max(last, int(batch_last.value // 1000))  # ns → µs
    state.update((n, sv, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value_micros": [sv],
            "last_ts": [pd.Timestamp(last, unit="us")],
        }
    )


def user_running_totals(stream: DataFrame) -> DataFrame:
    """Per-user cumulative totals with explicit keyed state — the
    custom-stateful-operator shape (Update output mode)."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
