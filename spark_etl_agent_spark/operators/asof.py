"""As-of join: for every left row, the most recent right row with
``right.ts <= left.ts`` within the same key — the time-series join
Spark has no native operator for (pandas has ``merge_asof``).

Implementation is the scalable union-window composition, NOT a
per-key loop or a pandas fallback:

1. tag both sides and ``unionByName`` them (allowMissingColumns),
2. one window per key ordered by ``(ts, side)`` — right rows sort
   *before* left rows at equal timestamps so ``<=`` semantics hold,
3. ``last(right_value, ignorenulls=True)`` carries the latest right
   payload forward onto each left row,
4. filter back to left rows.

Cost model: ONE shuffle of each side on the key + a per-key sort —
the same work a sort-merge join would do, with no row explosion and
no skew beyond what the key distribution already has. At 100 TB this
beats the naive "theta-join then argmax" (which explodes to |L|·|R|
per key before pruning).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: Optional[List[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``value_cols`` are the right-side payload
    columns carried over (default: all non-key, non-ts columns).
    Right rows must be unique per (key, ts) for a deterministic result
    — pre-aggregate the right side if they are not.

    Caveat: a right row whose payload value is itself NULL is treated
    as "no observation" for that column (``ignorenulls`` carries the
    previous non-NULL forward) — pandas ``merge_asof`` would surface
    the matched row's NULL instead. Encode explicit missing as a
    sentinel if the distinction matters."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        on, ts, *[F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side", *[f"{c}{suffix}" for c in value_cols])
        .select(
            *left.columns,
            *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )
