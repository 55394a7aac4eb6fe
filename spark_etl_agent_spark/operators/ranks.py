"""Distributed global ranking — exact ``ntile``/``row_number``/
``quantile_cont`` over an unbounded frame WITHOUT a single-partition
sort or a whole-group memory buffer.

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

from functools import reduce
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
    # bounded: partition METADATA — ≤ npart rows regardless of data volume
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


def grouped_quantile_cont(
    df: DataFrame,
    groups: List[str],
    value: str,
    qs: List[float],
    npart: Optional[int] = None,
) -> DataFrame:
    """Exact linear-interpolated quantiles (SQL ``quantile_cont`` /
    Spark ``percentile`` semantics: position ``h = (n-1)·q``, result
    ``v[⌊h⌋] + (h-⌊h⌋)·(v[⌊h⌋+1] - v[⌊h⌋])``) per group — WITHOUT
    collecting any group's values into one reducer.

    Spark's exact ``percentile()`` aggregate buffers every value of a
    group in memory; with a handful of groups over a 100 TB fact table
    that is an OOM by construction. Here the values are range-partitioned
    on (group, value), ranked per group via partition-size offsets
    (metadata, ≤ |groups|·npart rows), and only the TWO ranked rows each
    quantile needs are picked out and interpolated — one extra range
    shuffle, constant memory everywhere.

    Output: one row per group with a ``q_<q>`` double column per
    requested quantile (``0.25 → q_25``). NULL values are dropped
    first — SQL ``quantile_cont`` / ``percentile`` semantics; a group
    with only NULLs produces no row (matching the aggregate's NULL by
    absence of interpolable data). NULL group KEYS are kept as a real
    group (all internal joins are null-safe), matching
    ``groupBy().agg(percentile(...))``."""
    npart = npart or df.sparkSession.sparkContext.defaultParallelism
    gcols = [F.col(g) for g in groups]
    ranged = df.filter(F.col(value).isNotNull()).repartitionByRange(
        npart, *gcols, F.col(value)
    ).withColumn(_PID, F.spark_partition_id())
    sizes = ranged.groupBy(*groups, _PID).agg(F.count(F.lit(1)).alias("_psz"))
    w_prev = (
        Window.partitionBy(*groups)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*groups)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    offsets = sizes.select(
        *groups,
        F.col(_PID),
        F.coalesce(F.sum("_psz").over(w_prev), F.lit(0)).alias(_OFF),
        F.sum("_psz").over(w_all).alias(_N),
    )
    w_local = Window.partitionBy(_PID, *groups).orderBy(F.col(value))
    # Null-safe join on the group keys: a plain name-list equi-join
    # would silently drop NULL-keyed groups, which Spark's own
    # percentile()-over-groupBy keeps as a real group.
    off_re = offsets.select(
        *[F.col(g).alias(f"_og_{g}") for g in groups],
        F.col(_PID).alias("_opid"),
        _OFF,
        _N,
    )
    off_cond = reduce(
        lambda a, b: a & b,
        [F.col(g).eqNullSafe(F.col(f"_og_{g}")) for g in groups]
        + [F.col(_PID) == F.col("_opid")],
    )
    ranked = (
        ranged.withColumn(_LRN, F.row_number().over(w_local))
        .join(F.broadcast(off_re), off_cond)
        .drop("_opid", *[f"_og_{g}" for g in groups])
        .withColumn("_rank", F.col(_OFF) + F.col(_LRN))
    )

    # one (group, q) target row set: ranks ⌊h⌋+1 and min(⌊h⌋+2, n)
    qdf = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    pos = (
        offsets.select(*groups, _N)
        .distinct()
        .crossJoin(F.broadcast(qdf))
        .withColumn("_h", (F.col(_N) - 1) * F.col("q"))
        .select(
            *[F.col(g).alias(f"_pg_{g}") for g in groups],
            "q",
            (F.floor("_h") + 1).alias("_rlo"),
            F.least(F.floor("_h") + 2, F.col(_N)).alias("_rhi"),
            (F.col("_h") - F.floor("_h")).alias("_frac"),
        )
    )
    cond = [F.col(g).eqNullSafe(F.col(f"_pg_{g}")) for g in groups]
    cond.append(
        (F.col("_rank") == F.col("_rlo")) | (F.col("_rank") == F.col("_rhi"))
    )
    picked = ranked.join(
        F.broadcast(pos), reduce(lambda a, b: a & b, cond)
    ).select(
        *groups,
        "q",
        "_rlo",
        "_rhi",
        "_frac",
        "_rank",
        F.col(value).cast("double").alias("_v"),
    )
    per_q = picked.groupBy(*groups, "q", "_frac").agg(
        F.min(F.when(F.col("_rank") == F.col("_rlo"), F.col("_v"))).alias("_vlo"),
        F.min(F.when(F.col("_rank") == F.col("_rhi"), F.col("_v"))).alias("_vhi"),
    ).select(
        *groups,
        "q",
        (
            F.col("_vlo") + F.col("_frac") * (F.col("_vhi") - F.col("_vlo"))
        ).alias("_quant"),
    )
    out = per_q.groupBy(*groups).pivot(
        "q", [float(q) for q in qs]
    ).agg(F.first("_quant"))
    for q in qs:
        out = out.withColumnRenamed(str(float(q)), f"q_{int(round(q * 100))}")
    return out


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
