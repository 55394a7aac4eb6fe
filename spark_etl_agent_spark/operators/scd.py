"""Slowly-changing-dimension (Type 2) history builder.

The reference pipeline is full-reload (truncate + reload,
``services/jcap_pa_etl_service.py:40-120``) — every run discards
history. The scale-right warehouse verb is the SCD2 collapse: given an
attribute observed per (key, timestamp), emit one row per *run* of
identical attribute values with a validity interval
``[valid_from, valid_to)`` and an ``is_current`` flag.

Shape (gaps-and-islands, pure window algebra — no collect, no Python):

1. one window pass per key ordered by ts: a null-safe "changed vs
   previous row" flag (``lag``) marks each run's *start* row,
2. filter to the start rows — they carry the run's attrs and its
   ``valid_from`` (attrs are constant within a run, so the start row IS
   the run; no groupBy / running-sum island id is needed),
3. one ``lead`` window → valid_to (next run's start).

Cost at 100 TB: ONE shuffle — both windows partition on the same key
and the filter preserves partitioning, so the second window adds no
exchange (pinned by ``tests/test_plans.py``); per-key window state is
O(1). Skewed keys are not a concern for true dimensions (bounded rows
per key); for fact-derived keys use the pre-aggregation the caller
already needs for (key, ts) uniqueness.
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
    # first row of each key: lag(ts) is NULL → always a run start
    # (eqNullSafe against an all-NULL lag would miss NULL-valued attrs)
    starts = df.withColumn(
        "_is_start",
        F.lag(F.col(ts)).over(w).isNull() | changed,
    ).filter(F.col("_is_start"))
    wv = Window.partitionBy(*keys).orderBy(ts)
    return starts.select(
        *keys,
        *attrs,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(wv).alias("valid_to"),
        F.lead(ts).over(wv).isNull().alias("is_current"),
    )
