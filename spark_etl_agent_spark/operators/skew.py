"""Skew-safe shuffles: salting for heavy-hitter keys.

AQE's skew-join splitting (enabled in the session defaults) handles
most join skew at runtime; these operators are the *explicit* form for
when the skew is known ahead of time (the classic power-law key at
100 TB) or the operation is an aggregation (AQE skew handling does not
apply to aggregates).
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (output_name, fn, input) where fn ∈ {sum, count, min, max} — the
# decomposable aggregates whose partial and final functions coincide
# (count partials combine with sum). avg derives as sum/count downstream.
AggSpec = Tuple[str, str, str]

_PARTIAL = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: List[str],
    aggs: List[AggSpec],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: shuffle once on (keys, salt) so a heavy
    key spreads over ``salt_buckets`` reducers, then combine the
    partials with a second (tiny — one row per key×salt) shuffle on the
    keys alone. Result is identical to a plain groupBy; only the
    shuffle layout changes."""
    for _, fn, _ in aggs:
        if fn not in _PARTIAL:
            raise ValueError(f"non-decomposable aggregate for salting: {fn}")
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[fn](col).alias(f"_p_{name}") for name, fn, col in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](F.col(f"_p_{name}")).alias(name) for name, fn, col in aggs]
    )


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the
    small side once per salt value, join on (key, salt). The heavy key
    spreads over ``salt_buckets`` tasks instead of one straggler.

    Only ``inner``/``left``(-semi/-anti) are supported: every big-side
    row carries exactly one salt, so those semantics are preserved — but
    ``right``/``full`` would emit each *unmatched small-side* row once
    per salt replica (``salt_buckets`` duplicate outer rows), silently
    corrupting the result, so they are rejected."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "right/full would duplicate unmatched small-side rows "
            "once per salt bucket"
        )
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = skewed_small.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_s = skewed_small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def salted_join_hotkeys(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: List,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Two-path skew join: only rows whose key is in ``hot_keys`` pay
    the salt machinery (spread over ``salt_buckets`` tasks, small side
    replicated per salt); every other key takes the PLAIN equi-join.
    This is the explicit form of what AQE skew-split does at runtime,
    for when the heavy hitters are known ahead of time (power-law keys
    at 100 TB) — and unlike :func:`salted_join`, the salt fan-out
    (small-side replication + the extra shuffle column) is confined to
    the hot fraction instead of taxing the whole table.

    ``hot_keys`` is a driver-side list (heavy hitters are few by
    definition — pair with ``sketches.frequent_items`` to detect them).
    Same ``how`` restrictions as :func:`salted_join`. NULL keys take
    the cold path (they match nothing on an equi-join but must survive
    a LEFT join's preserved side).
    """
    if not hot_keys:
        return big.join(small, on, how)
    is_hot = F.col(on).isin(list(hot_keys))
    hot_out = salted_join(
        big.filter(is_hot), small.filter(is_hot), on, salt_buckets, how
    )
    cold_out = big.filter(~F.coalesce(is_hot, F.lit(False))).join(
        small, on, how
    )
    return hot_out.unionByName(cold_out)


def salted_topk(
    df: DataFrame,
    keys: List[str],
    order_cols: List[Column],
    k: int,
    salt_buckets: int = 32,
    rank_col: str = "rank_in_group",
) -> DataFrame:
    """Exact per-group top-k when the groups are FEW (a codebook of
    cells, a handful of languages): a plain per-group window sorts the
    whole table in ``n_groups`` reducers — at 100 TB one straggler per
    group. Two phases instead: rank inside (keys, salt) so each group's
    sort spreads over ``salt_buckets`` tasks and only k survivors per
    bucket continue, then rank the ≤ k·salt_buckets survivors per group.
    Identical result to the single window (any true top-k row is
    preceded by < k rows within its own bucket, so phase 1 never drops
    it); only the shuffle layout changes.

    ``order_cols`` must be a TOTAL order (include a unique tiebreaker)
    or the selected rows at the k boundary are nondeterministic.
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % salt_buckets).cast("int")
    )
    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    pruned = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return pruned.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
