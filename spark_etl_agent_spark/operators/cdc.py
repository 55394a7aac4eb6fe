"""Snapshot diff (change-data-capture between two table states).

The reference's ETL is full-reload (truncate + reload every run,
``services/jcap_pa_etl_service.py``); at 100 TB the scale-right verb is
the *diff*: given yesterday's and today's snapshot, emit only the
inserted / deleted / updated rows and apply those (via
``Catalog.merge_upsert`` or a streaming sink).

Shape: one full-outer join on the key columns — a single co-partitioned
shuffle per side on the same key, no window, no collect. Column
comparison is null-safe (``IS DISTINCT FROM`` semantics), so NULL→value
and value→NULL transitions are real updates.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: List[str],
    compare_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``:
    ``(keys..., change_type ∈ {insert, delete, update})``.

    ``compare_cols`` defaults to every shared non-key column. Unchanged
    rows are dropped (the common case — the output is the delta, which
    is what makes this cheaper than a reload at scale)."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(keys))
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{k}") == F.col(f"_nk_{k}") for k in keys],
    )
    joined = o.join(n, cond, "full")
    changed = (
        reduce(
            lambda a, b: a | b,
            [
                ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
                for c in compare_cols
            ],
        )
        if compare_cols
        else F.lit(False)
    )
    change_type = (
        F.when(F.col(f"_ok_{keys[0]}").isNull(), F.lit("insert"))
        .when(F.col(f"_nk_{keys[0]}").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
        )
    )
