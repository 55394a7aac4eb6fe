"""Slowly-changing-dimension (Type 2) history builder.

The reference pipeline is full-reload (truncate + reload,
``services/jcap_pa_etl_service.py:40-120``) — every run discards
history. The scale-right warehouse verb is the SCD2 collapse: given an
attribute observed per (key, timestamp), emit one row per *run* of
identical attribute values with a validity interval
``[valid_from, valid_to)`` and an ``is_current`` flag.

Shape (gaps-and-islands, pure window algebra — no collect, no Python):

1. one window pass per key ordered by ts: a null-safe "changed vs
   previous row" flag (``lag``),
2. a running sum of the flag → version number (island id),
3. one groupBy (key, version) → ``min(ts)`` as valid_from,
4. one final ``lead`` window → valid_to (next version's start).

Cost at 100 TB: two shuffles on the dimension key — the same key both
times, so AQE/exchange-reuse collapses them to one physical exchange;
per-key state in the windows is O(1). Skewed keys are not a concern for
true dimensions (bounded rows per key); for fact-derived keys use the
pre-aggregation the caller already needs for (key, ts) uniqueness.
"""

from __future__ import annotations

from functools import reduce
from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    keys: List[str],
    attrs: List[str],
    ts: str,
) -> DataFrame:
    """Collapse per-observation rows into SCD2 validity intervals.

    ``df`` must be unique on (keys, ts) — pre-aggregate first if the
    source can observe one key several times per timestamp (ties would
    make "the attribute at ts" ill-defined and the output
    nondeterministic).

    Returns ``keys + attrs + (valid_from, valid_to, is_current)`` where
    ``valid_to`` is NULL on each key's current row.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w)) for a in attrs],
    )
    # first row of each key: lag is NULL on every attr → eqNullSafe is
    # False only if the attr itself is NULL; force the first row open
    versioned = df.withColumn(
        "_new_version",
        F.when(F.lag(F.col(ts)).over(w).isNull(), F.lit(1))
        .when(changed, F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "_version",
        F.sum("_new_version").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = versioned.groupBy(*keys, "_version", *attrs).agg(
        F.min(ts).alias("valid_from")
    )
    wv = Window.partitionBy(*keys).orderBy("valid_from")
    return runs.select(
        *keys,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
