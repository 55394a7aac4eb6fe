"""Time-series warehouse operators: calendar gap-filling and rolling
distinct counts — the two shapes naive SQL gets wrong at scale.

**Gap-fill**: a date spine generated *executor-side* with
``sequence()`` + ``explode`` (never a driver loop or a collected
calendar), left-joined against the daily aggregate, with
last-observation-carried-forward via ``last(ignorenulls)`` over the key
partition. Cost: the daily aggregate's own shuffle plus a
broadcast-sized spine join — the spine is |keys| × |days|, bounded.

**Rolling distinct**: ``COUNT(DISTINCT x) OVER (RANGE 7 days)`` forces
per-frame state proportional to the frame's row count; the scalable
shape is dedup-first — collapse to distinct (key, day) once, explode
each surviving row into the ≤w window days it contributes to, and run
one plain distinct-count per window day. Fan-out is w× the *deduped*
row count (≪ raw events), every shuffle key is bounded.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    daily: DataFrame,
    keys: List[str],
    day_col: str,
    value_cols: List[str],
    bounds: DataFrame,
) -> DataFrame:
    """Fill missing (keys, day) slots between ``bounds``'s
    ``(_min_day, _max_day)`` scalar frame. Returns one row per key per
    spine day with ``is_gap`` flagged and each value column both raw
    (NULL on gaps) and carried-forward (``<col>_ff``)."""
    spine_days = bounds.select(
        F.explode(
            F.sequence(F.col("_min_day"), F.col("_max_day"))
        ).alias(day_col)
    )
    key_frame = daily.select(*keys).distinct()
    spine = key_frame.join(F.broadcast(spine_days))
    joined = spine.join(daily, on=[*keys, day_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "is_gap", F.col(value_cols[0]).isNull()
    )
    for c in value_cols:
        out = out.withColumn(f"{c}_ff", F.last(c, ignorenulls=True).over(w))
    return out


def rolling_distinct_count(
    df: DataFrame,
    entity_col: str,
    day_col: str,
    window_days: int = 7,
    max_day: Optional[F.Column] = None,
) -> DataFrame:
    """Distinct ``entity_col`` count per day over a trailing
    ``window_days`` window, dedup-first (see module docstring).

    A (entity, day) observation contributes to window days
    ``[day, day + window_days - 1]``; clamp to ``max_day`` so trailing
    windows past the data's end are not emitted."""
    deduped = df.select(entity_col, day_col).distinct()
    contributes = deduped.select(
        entity_col,
        F.explode(
            F.sequence(
                F.col(day_col),
                F.date_add(F.col(day_col), window_days - 1),
            )
        ).alias("window_day"),
    )
    if max_day is not None:
        contributes = contributes.filter(F.col("window_day") <= max_day)
    return contributes.groupBy("window_day").agg(
        F.countDistinct(entity_col).alias(f"n_{entity_col}_{window_days}d")
    )
