"""Multi-dimensional file clustering (Z-order / Morton curve).

``Catalog.compact_table(sort_within_by=...)`` clusters on ONE key:
per-file min/max stats become selective on that key and readers skip
files — but a predicate on any *other* column still reads everything.
Z-ordering interleaves the bits of two (or more) bucketized dimensions
into a single sort key, so file bounding boxes are small in EVERY
clustered dimension at once — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` — and parquet footer stats then prune files for
predicates on either dimension.

Everything is native integer expressions (shift/AND/OR — inside
whole-stage codegen); the write is one range repartition + local sort,
the same cost as a single-key compaction. Verified quantitatively in
``tests/test_operators.py`` by reading the written files' footer
min/max with pyarrow: z-ordered files bound BOTH dimensions tightly
where a single-key sort leaves the second dimension spanning its full
range in every file.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank a numeric column into [0, 2^bits) using broadcast scalar
    bounds; the max value clamps into the top bucket."""
    n = 1 << bits
    return F.least(
        F.floor((col - lo) / (hi - lo) * n), F.lit(n - 1)
    ).cast("long")


def morton_code(xb: Column, yb: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two bucket ranks (x even bits, y
    odd bits) — pure shift/mask algebra, whole-stage-codegen'd."""
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def zorder_write(
    df: DataFrame,
    path: str,
    dims: Tuple[str, str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of two numeric dimensions. Bounds come from one scalar
    aggregate (broadcast back); the layout pass is a single range
    shuffle on the morton key plus a local sort — no global sort."""
    x, y = dims
    bounds = df.agg(
        F.min(x).alias("_xlo"), F.max(x).alias("_xhi"),
        F.min(y).alias("_ylo"), F.max(y).alias("_yhi"),
    )
    coded = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_z",
            morton_code(
                bucketize(F.col(x), F.col("_xlo"), F.col("_xhi"), bits),
                bucketize(F.col(y), F.col("_ylo"), F.col("_yhi"), bits),
                bits,
            ),
        )
        .drop("_xlo", "_xhi", "_ylo", "_yhi")
    )
    (
        coded.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stat_ranges(path: str, cols: List[str]) -> List[dict]:
    """Per-parquet-file min/max for ``cols`` from the footer stats —
    the same metadata a reader uses to skip files. (pyarrow, driver-
    side: this inspects a handful of footers, not data.)"""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(path.rstrip("/") + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(names[c]).statistics
                if s is None or not s.has_min_max:
                    lo, hi = None, None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            stats[c] = (lo, hi)
        out.append({"file": f, **stats})
    return out


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Rendezvous (highest-random-weight, Thaler & Ravishankar 1998)
    shard assignment: the shard whose md5(shard|key) weight is highest
    wins (tie → lower shard id). The property that matters at scale:
    growing the ring from N to N+1 moves ONLY the keys whose new
    top weight belongs to the NEW shard (~1/(N+1) of them) — every
    other key keeps its shard, unlike mod-N hashing which reshuffles
    (N-1)/N of the corpus. Pure expression: one codegen'd argmax over
    ``n_shards`` literal structs, zero shuffle, no UDF."""
    key_s = key.cast("string")
    structs = [
        F.struct(
            F.md5(F.concat(F.lit(f"{s}|"), key_s)).alias("w"),
            F.lit(-s).alias("negs"),
        )
        for s in range(n_shards)
    ]
    return (-F.array_max(F.array(*structs))["negs"]).cast("long")


def shard_movement_report(
    df: DataFrame, key_col: str, n_before: int, n_after: int
) -> DataFrame:
    """Re-shard stability report: assign every key under ``n_before``
    and ``n_after`` rendezvous shards and count the (shard_before,
    shard_after) transition matrix — the report an operator reads
    before growing a 100 TB sharded layout (expected off-diagonal mass
    ≈ 1/n_after when adding shards; with rendezvous hashing every
    off-diagonal row must land on a NEW shard, which the tests pin).
    One scan, one bounded groupBy (≤ n_before·n_after keys)."""
    assigned = df.select(
        rendezvous_shard(F.col(key_col), n_before).alias("shard_before"),
        rendezvous_shard(F.col(key_col), n_after).alias("shard_after"),
    )
    return (
        assigned.groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .select(
            "shard_before",
            "shard_after",
            "n_keys",
            (F.col("shard_before") != F.col("shard_after")).alias("is_move"),
        )
    )
