"""Sequence packing (concat-and-chunk) for LLM pretraining.

GPT-style pretraining concatenates the tokenized corpus in a fixed
order into one virtual token stream and slices it into fixed-length
training sequences. Given a per-document token count and a total order,
this operator assigns every document its half-open span
``[start_off, end_off)`` in that stream and the chunk range
``[chunk_first, chunk_last]`` it lands in — without materializing the
stream and, critically, without a single-partition global window.

A naive ``sum(tokens) OVER (ORDER BY id)`` with no PARTITION BY moves
the entire corpus through ONE task — the classic global-window scale
killer. The distributed shape (same skeleton as
``operators.ranks.global_rank``):

1. ``repartitionByRange`` on the order key — sampled boundaries, fully
   parallel, globally ordered across partitions;
2. per-partition token totals → cumulative *partition* offsets
   (metadata, ≤ npart rows, broadcast);
3. global end offset = partition offset + intra-partition running sum
   (windows partitioned by partition id run in parallel).

Results are bit-identical at any ``npart`` because offsets derive from
the total order, which range partitioning preserves (exact integer
arithmetic throughout — guarded by the partition-count-independence
test in ``tests/test_pretrain.py``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pack_pid"
_OFF = "__pack_off"


def pack_chunks(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    npart: Optional[int] = None,
) -> DataFrame:
    """Append ``start_off``, ``end_off``, ``chunk_first``,
    ``chunk_last``, ``n_chunks`` for a chunk size of ``budget`` tokens.

    ``order_col`` must be a total order (unique key — document id).
    ``tokens_col`` is the document's token count (≥ 0; a zero-token
    document gets an empty span and the chunk containing its offset).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    npart = npart or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(npart, F.col(order_col)).withColumn(
        _PID, F.spark_partition_id()
    )
    sizes = ranged.groupBy(_PID).agg(
        F.sum(tokens_col).cast("bigint").alias("_ptok")
    )
    # bounded: partition METADATA — ≤ npart rows regardless of data volume
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("_ptok").over(w_prev), F.lit(0)).alias(_OFF),
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    end_off = (
        F.col(_OFF) + F.sum(tokens_col).over(w_local).cast("bigint")
    ).alias("end_off")
    out = (
        ranged.join(F.broadcast(offsets), _PID)
        .select(*df.columns, end_off)
        .withColumn(
            "start_off", F.col("end_off") - F.col(tokens_col).cast("bigint")
        )
    )
    # integer DIV keeps the arithmetic exact (floor(double/double) would
    # wobble in the low bits at 100T-token offsets)
    return (
        out.withColumn("chunk_first", F.expr(f"start_off DIV {budget}"))
        .withColumn(
            "chunk_last",
            F.greatest(
                F.col("chunk_first"),
                F.expr(f"(end_off - 1) DIV {budget}"),
            ),
        )
        .withColumn(
            "n_chunks", F.col("chunk_last") - F.col("chunk_first") + F.lit(1)
        )
    )


def ordered_budget_prefix(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_by,
    npart: Optional[int] = None,
) -> DataFrame:
    """Greedy ordered-prefix selection under a global token budget: walk
    the corpus in ``order_by`` order (must be a total order — e.g.
    quality DESC then id) and keep every document whose cumulative
    token count stays ≤ ``budget`` — the "best docs until the budget is
    spent" selection a fixed-size pretraining mixture makes.

    Same distributed skeleton as :func:`pack_chunks` (range partition on
    the order key → per-partition totals → broadcast partition offsets →
    parallel intra-partition running sums): no single-partition global
    window, bit-identical at any ``npart``. Appends ``cum_tokens`` (the
    running total INCLUDING the row) to the selected rows; a document
    that would cross the budget boundary is excluded (ordered prefix,
    not knapsack — deterministic and one-pass).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    npart = npart or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(npart, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    sizes = ranged.groupBy(_PID).agg(
        F.sum(tokens_col).cast("bigint").alias("_ptok")
    )
    # bounded: partition METADATA — ≤ npart rows regardless of data volume
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("_ptok").over(w_prev), F.lit(0)).alias(_OFF),
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged.join(F.broadcast(offsets), _PID).select(
        *df.columns,
        (F.col(_OFF) + F.sum(tokens_col).over(w_local).cast("bigint")).alias(
            "cum_tokens"
        ),
    )
    return out.filter(F.col("cum_tokens") <= budget)


def packing_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Corpus-level packing audit: total tokens/chunks, how many
    documents straddle a chunk boundary, and the fill ratio of the final
    (ragged) chunk. One scalar aggregation — map-side partial, no
    meaningful shuffle."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("end_off").alias("total_tokens"),
        (F.expr(f"(max(end_off) + {budget} - 1) DIV {budget}")).alias(
            "n_chunks_total"
        ),
        F.sum(
            F.when(F.col("chunk_last") > F.col("chunk_first"), 1).otherwise(0)
        ).alias("n_straddling"),
        F.when(
            F.expr(f"max(end_off) % {budget}") == 0, F.lit(1.0)
        )
        .otherwise(
            F.expr(f"max(end_off) % {budget}").cast("double")
            / F.lit(float(budget))
        )
        .alias("tail_fill_ratio"),
    )
