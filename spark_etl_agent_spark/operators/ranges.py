"""Range / banded joins: match rows to intervals
(``lo <= x < hi``) without a full theta-join.

Two regimes, chosen by the band side's size:

- **broadcast** (default): the interval table is small (price bands,
  rate tables, calendars) — broadcast it and let the range predicate
  evaluate stream-side with zero shuffle. This is the 100 TB fast path
  whenever bands fit in memory.
- **bucketed**: both sides large — quantize ``x`` and the interval
  endpoints to a common grid, equi-join on the bucket id (one bounded
  shuffle), then re-check the exact predicate. Interval spans many
  buckets → explode the interval to its covered buckets (bounded by
  span/grid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    facts: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Broadcast range join: ``facts.value ∈ [bands.lo, bands.hi)``."""
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return facts.join(F.broadcast(bands), cond, how)


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float = 100.0,
) -> DataFrame:
    """Large×large range join via grid bucketing: one equi-shuffle on
    the bucket id instead of a cartesian compare."""
    f = facts.withColumn(
        "_bucket", F.floor(F.col(value) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bucket_width)).cast("long"),
                F.floor((F.col(hi) - F.lit(1e-9)) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        f.join(iv, "_bucket")
        .filter((F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi)))
        .drop("_bucket")
    )
