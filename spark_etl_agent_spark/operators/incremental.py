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
