"""Incremental aggregate maintenance: merge a stored aggregate with a
delta instead of recomputing from the full fact table.

The reference reloads everything every run
(``services/jcap_pa_etl_service.py`` truncate + reload); at 100 TB the
only affordable update path is: keep the aggregate table, aggregate the
(small) delta, and merge the two — cost proportional to the delta plus
the aggregate's own (bounded, group-count-sized) cardinality, not the
fact table.

Works for any *sum-mergeable* measure set: count, sum, min, max merge
by re-applying themselves over the union of partials (count merges by
SUM of partial counts). AVG must be carried as (sum, count) partials
and divided at read time; exact DISTINCT is not mergeable (use HLL
sketches when approximate is acceptable).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure merge rules: how a partial aggregate recombines
_MERGE = {
    "count": F.sum,  # partial counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def merge_partial_aggs(
    base: DataFrame,
    delta: DataFrame,
    keys: List[str],
    measures: List[Tuple[str, str]],
) -> DataFrame:
    """Merge two partial-aggregate frames with identical schemas.

    ``measures`` is ``[(column, kind)]`` with kind in
    {count, sum, min, max}. Both inputs must already be aggregated to
    one row per key. One shuffle on the (bounded) group keys — the fact
    table is never touched."""
    for col, kind in measures:
        if kind not in _MERGE:
            raise ValueError(
                f"measure {col!r}: {kind!r} is not sum-mergeable "
                f"(supported: {sorted(_MERGE)})"
            )
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(*[_MERGE[kind](col).alias(col) for col, kind in measures])
    )


def rollup_cascade(
    facts: DataFrame,
    ts_col: str,
    keys: List[str],
    measures: List[Tuple[str, str]],
    granularities: List[str] = ("hour", "day", "month"),
) -> dict:
    """Multi-granularity continuous aggregates: each level is built
    from the level BELOW it, never from the raw facts — the hypertable
    rollup pattern (TimescaleDB continuous aggregates, Druid rollup).

    The raw table is scanned exactly once (the finest level); every
    coarser level re-aggregates the previous level's (bounded,
    group-count-sized) output with the sum-mergeable rules of
    :func:`merge_partial_aggs`. At 100 TB the daily rollup over an
    hourly aggregate touches ``keys × 24`` rows per day instead of the
    raw events — and an incremental refresh composes: merge the delta
    into the finest level, then cascade only the affected buckets up.

    ``granularities`` must be ordered fine→coarse (``date_trunc``
    units). Returns ``{granularity: DataFrame}`` with a ``bucket``
    timestamp column per level."""
    for col, kind in measures:
        if kind not in _MERGE:
            raise ValueError(
                f"measure {col!r}: {kind!r} is not sum-mergeable "
                f"(supported: {sorted(_MERGE)})"
            )
    out = {}
    finest = granularities[0]
    level = facts.groupBy(
        *keys, F.date_trunc(finest, F.col(ts_col)).alias("bucket")
    ).agg(
        *[
            (F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(col)).alias(col)
            for col, kind in measures
        ]
    )
    out[finest] = level
    for gran in granularities[1:]:
        level = level.groupBy(
            *keys, F.date_trunc(gran, F.col("bucket")).alias("bucket")
        ).agg(*[_MERGE[kind](col).alias(col) for col, kind in measures])
        out[gran] = level
    return out
