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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _to_micros(values: pd.Series) -> np.ndarray:
    """Quantize value → value·10⁴ with explicit HALF-AWAY-FROM-ZERO
    rounding (int64). pandas ``.round()`` is banker's (half-to-even)
    while the DuckDB oracle's ``round()`` is half-away-from-zero; a
    value landing exactly on .5 micro-units would diverge between the
    engines and break the bit-identical-replay contract, so both sides
    pin the same rule here."""
    x = values.to_numpy(dtype="float64") * 10_000.0
    return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype("int64")

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
        sv += int(_to_micros(pdf["value"]).sum())
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


EWMA_OUTPUT_SCHEMA = "user_id long, n_events long, ewma_micros long"
EWMA_STATE_SCHEMA = "e long, n long"


def _update_ewma_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    e, n = state.get if state.exists else (0, 0)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # event-time replay order WITHIN the batch; the query stages
    # micro-batches as time ranges, so (batch, ts, event_id) IS the
    # global event-time order and the recursion is well-defined
    pdf = pdf.sort_values(["ts", "event_id"])
    xs = _to_micros(pdf["value"])
    for x in xs:
        x = int(x)
        e = x if n == 0 else (e + x) // 2
        n += 1
    state.update((e, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_micros": [e]}
    )


def user_value_ewma(stream: DataFrame) -> DataFrame:
    """Per-user integer EWMA (α = 1/2) over the event-time-ordered
    value stream — the second custom keyed-state operator: unlike the
    running totals (an order-free sum), EWMA state is a genuine
    RECURSION (eₜ = (eₜ₋₁ + xₜ) div 2, e₀ = x₀) that must thread
    through micro-batch boundaries in replay order. Pure int64, so the
    streamed fixpoint is bit-identical to the oracle's recursive-CTE
    replay of the same order. Update mode; final state per user is the
    max-n row."""
    return (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_ewma_state,
            outputStructType=EWMA_OUTPUT_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
