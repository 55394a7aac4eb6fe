"""Bloom-filter pre-join pruning, built from native bitwise aggregates.

Reference parity: none — the reference's only membership test is the
anti-join-free ``SELECT DISTINCT`` (SURVEY.md §2.4 A3).  This module is
the 100 TB ingest-dedup primitive: "which of these batch rows are NOT
already in a huge index?" without ever shuffling the index.

Spark's own runtime row-level filtering does exactly this internally
(``BloomFilterAggregate`` / ``BloomFilterMightContain``), but those
expressions are not registered for SQL/DataFrame use, so the operator
builds the same shape out of registered primitives only:

- **build** — every index key sets ``n_hashes`` bit positions
  (``xxhash64(key, seed)`` mod ``n_bits``); positions fold into a
  sparse ``(word_idx, bits)`` bitmap via map-side-partial ``bit_or``.
  The reduce input is bounded by the bitmap width (``n_bits / 64``
  rows, ≤ 128 KB at the default 2²⁰ bits), NOT by index size — the one
  shuffle in the whole scheme moves a sketch, never data.
- **probe** — ``n_hashes`` *broadcast* hash joins against the bitmap
  (each O(1) per row, all map-side, no exchange on the probe side).
  A row "might be present" iff every probed bit is set.  No false
  negatives, ≈0.1 % false positives at the default sizing for ~60 k
  keys; false positives only cost a second look, never wrong output.

``bloom_antijoin`` composes build+probe symmetrically so the final
*exact* anti-join only ever sees sketch-pruned sides:

    batch rows failing the index bloom  → definitely new, emitted as-is
    batch rows passing                  → candidate dups ("maybe")
    index rows failing the MAYBE bloom  → irrelevant, never leave the scan
    index rows passing                  → tiny candidate key set

so a TB-scale index is scanned twice (once per bloom pass) but never
shuffled or joined at full width.  Output is exactly equal to
``batch LEFT ANTI JOIN index`` (pinned by test and DuckDB oracle).

Sizing: ``n_bits`` should be ≈ 16× the expected distinct index keys
for ~0.1 % fp (fp ≈ (1 - e^(-kn/m))^k).  At 100 TB, size m to the key
cardinality — the bitmap stays broadcast-small up to billions of keys
(2³³ bits = 1 GiB is the practical ceiling; shard by key range past
that).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 5
FLAG = "__bloom_hit"


def _positions(key: Column, n_bits: int, n_hashes: int) -> List[Column]:
    """``n_hashes`` independent bit positions for one key: seeded
    ``xxhash64`` (the seed rides as an extra hashed column), ``pmod``
    keeps positions non-negative. A NULL key yields NULL positions —
    callers treat that as "not present" (anti-join keeps NULL keys,
    matching NOT EXISTS equality semantics)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)).cast("long")
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Sparse bloom bitmap ``(word_idx long, bits long)`` over a key
    column — ≤ ``n_bits/64`` rows regardless of input size.  Partial
    ``bit_or`` runs map-side, so the shuffle carries at most one row
    per (task, word) — sketch-sized, not data-sized."""
    pos = df.select(
        F.explode(
            F.array(*_positions(F.col(key_col), n_bits, n_hashes))
        ).alias("pos")
    ).where(F.col("pos").isNotNull())
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    flag_col: str = FLAG,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Adds ``flag_col``: true iff *every* probed bit is set (the key
    MIGHT be in the set the bitmap was built from; false = definitely
    not).  The probe is ``n_hashes`` broadcast hash joins against the
    ≤ 2 MB bitmap — map-side only, zero exchange on ``df``'s side, so
    probing a 100 TB scan adds no shuffle.  NULL keys flag false."""
    out = df
    checks = []
    for i, p in enumerate(_positions(F.col(key_col), n_bits, n_hashes)):
        w, b = f"__bw{i}", f"__bb{i}"
        out = out.withColumn(f"__p{i}", p).join(
            F.broadcast(
                bitmap.select(
                    F.col("word_idx").alias(w), F.col("bits").alias(b)
                )
            ),
            F.shiftright(F.col(f"__p{i}"), 6) == F.col(w),
            "left",
        )
        checks.append(
            F.coalesce(F.col(b), F.lit(0)).bitwiseAND(
                F.expr(f"shiftleft(1L, cast(__p{i} % 64 AS int))")
            )
            != 0
        )
    flag = checks[0]
    for c in checks[1:]:
        flag = flag & c
    drop = [c for i in range(n_hashes) for c in (f"__p{i}", f"__bw{i}", f"__bb{i}")]
    return out.withColumn(flag_col, F.coalesce(flag, F.lit(False))).drop(*drop)


def bloom_antijoin(
    batch: DataFrame,
    index: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exact ``batch LEFT ANTI JOIN index ON key_col`` where the index
    is only ever scanned, never shuffled:

    1. index bloom → batch rows that *definitely* aren't in the index
       pass straight through (for a mostly-novel ingest batch that is
       almost everything — zero join work);
    2. the "maybe" remainder builds its own (tiny) bloom; the index
       scan is row-wise pruned against it, leaving only candidate keys
       (true dups + fp — bounded by the maybe side, not the index);
    3. one exact anti-join between the two pruned sides seals
       correctness — bloom fp can only send extra rows into this join,
       never change its answer.

    Cache lifetime: the probed batch stays persisted (it backs both
    branches of the returned frame and cannot be released here); the
    two sketch checkpoints are bitmap-sized. Callers that loop
    antijoins in a long-lived session release them with their scoped
    cache sweep (the bench/ingest-sink idiom) or a job-boundary
    ``clearCache``.
    """
    # The sketch feeds n_hashes broadcast joins; without materializing
    # it, every join re-runs the index scan + bit_or aggregation (the
    # per-join column aliases sit below the exchange, so Spark's
    # ReusedExchange canonicalization never kicks in — measured 10
    # rebuilds per antijoin). localCheckpoint pays ONE sketch build;
    # the checkpointed result is ≤ n_bits/64 rows by construction.
    flagged = bloom_might_contain(
        batch,
        bloom_bitmap(
            index.select(key_col), key_col, n_bits, n_hashes
        ).localCheckpoint(),
        key_col,
        n_bits=n_bits,
        n_hashes=n_hashes,
    ).persist()  # feeds both the definite and maybe branches
    definite = flagged.filter(~F.col(FLAG)).drop(FLAG)
    maybe = flagged.filter(F.col(FLAG)).drop(FLAG)
    # candidate index keys: row-wise bloom probe (map-side) → the only
    # rows that survive are keys colliding with SOME maybe-key; the
    # distinct is over that tiny remainder, not the index
    maybe_bloom = bloom_bitmap(
        maybe.select(key_col), key_col, n_bits, n_hashes
    ).localCheckpoint()
    index_candidates = (
        bloom_might_contain(
            index.select(key_col),
            maybe_bloom,
            key_col,
            n_bits=n_bits,
            n_hashes=n_hashes,
        )
        .filter(F.col(FLAG))
        .select(key_col)
        .distinct()
    )
    survivors = maybe.join(index_candidates, key_col, "left_anti")
    return definite.unionByName(survivors)
