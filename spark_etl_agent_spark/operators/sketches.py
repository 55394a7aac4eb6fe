"""Distributional summaries: exact and approximate sketches.

At 100 TB exact DISTINCT/quantiles force full shuffles of the key
space; the approximate forms (HLL++, GK/KLL-style quantiles — both
built into Spark) are constant-memory per partition with one tiny
merge. The engine exposes both and the oracle checks the exact ones;
approximate results are algorithm-specific (rows-only checked).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, keys: List[str], value: str) -> DataFrame:
    """Per-group profile with deterministic members: count, min, max,
    exact decimal sum, exact median (0.5 interpolation is exact in
    binary for integer-valued inputs)."""
    v = F.col(value)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.sum(v.cast("decimal(12,4)")).cast("decimal(18,4)").cast("double").alias("v_sum"),
        F.expr(f"percentile({value}, 0.5)").alias("v_median"),
    )


def approx_profile(
    df: DataFrame, keys: List[str], value: str, rsd: float = 0.05
) -> DataFrame:
    """Approximate counterpart: HLL distinct + quantile sketch
    (percentile_approx). Constant memory per partition at any scale."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value, rsd=rsd).alias("v_approx_distinct"),
        F.percentile_approx(value, [0.25, 0.5, 0.75, 0.9], 10000).alias(
            "v_approx_quantiles"
        ),
    )
