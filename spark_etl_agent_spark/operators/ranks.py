"""Distributed global ranking — exact ``ntile``/``row_number`` over an
unbounded frame WITHOUT a single-partition sort.

A global ``Window.orderBy(...)`` moves every row to one partition; at
100 TB (or even a tens-of-millions-row entity aggregate) that serial
sort is the bottleneck. The scalable shape:

1. range-partition on the sort key (``repartitionByRange`` — sampled
   boundaries, fully parallel, globally ordered across partitions);
2. per-partition sizes → cumulative offsets. Partition *metadata*
   (≤ npart rows), so its tiny ordering window is bounded regardless
   of data volume;
3. global rank = partition offset + intra-partition ``row_number``
   (windows partitioned by partition id run in parallel);
4. for ntile, the exact SQL bucket formula from (rank, n): the first
   ``n mod k`` buckets get ``n div k + 1`` rows, the rest ``n div k``.

Results are bit-identical to the single-partition window at ANY
``npart`` (guarded by ``tests/test_determinism.py``) because ranks are
computed from the total order, which range partitioning preserves —
the sampled boundary *placement* only moves work, never answers.

The sort key must be a total order (include a unique tie-break column,
e.g. the primary key) — engine-dependent tie behavior is the other
classic source of cross-engine hash mismatches.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_OFF = "__rank_off"
_N = "__rank_n"
_LRN = "__rank_lrn"


def global_rank(
    df: DataFrame,
    order_by: List[Column],
    rank_col: str = "rank",
    npart: Optional[int] = None,
) -> DataFrame:
    """Append a 1-based dense global ``row_number`` over ``order_by``
    (which must be a total order) with no single-partition data stage.
    ``npart`` defaults to the cluster's parallelism."""
    npart = npart or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(npart, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    sizes = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("_psz"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("_psz").over(w_prev), F.lit(0)).alias(_OFF),
        F.sum("_psz").over(w_all).alias(_N),
    )
    w_local = Window.partitionBy(_PID).orderBy(*order_by)
    return (
        ranged.withColumn(_LRN, F.row_number().over(w_local))
        .join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
    )


def parallel_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: List[Column],
    bucket_col: str = "bucket",
    npart: Optional[int] = None,
) -> DataFrame:
    """Exact ``ntile(n_buckets) OVER (ORDER BY ...)`` — hash-identical
    to the window function, computed via ``global_rank``. Output keeps
    the input columns plus ``bucket_col`` (int, 1-based)."""
    ranked = global_rank(df, order_by, rank_col="__rank", npart=npart)
    q = F.floor(F.col(_N) / F.lit(n_buckets))
    rem = F.col(_N) % F.lit(n_buckets)
    cut = rem * (q + 1)
    rank = F.col("__rank")
    # greatest(q,1) only guards the (n < n_buckets) branch CASE never
    # takes — ANSI div-by-zero safety.
    bucket = (
        F.when(rank <= cut, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - cut) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
    return ranked.withColumn(bucket_col, bucket).drop(
        _PID, _OFF, _N, _LRN, "__rank"
    )
