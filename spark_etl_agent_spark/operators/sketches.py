"""Distributional summaries: exact and approximate sketches.

At 100 TB exact DISTINCT/quantiles force full shuffles of the key
space; the approximate forms (HLL++, GK/KLL-style quantiles — both
built into Spark) are constant-memory per partition with one tiny
merge. The engine exposes both and the oracle checks the exact ones;
approximate results are algorithm-specific (rows-only checked).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_profile(df: DataFrame, keys: List[str], value: str) -> DataFrame:
    """Per-group profile with deterministic members: count, min, max,
    exact decimal sum, exact median (0.5 interpolation is exact in
    binary for integer-valued inputs).

    The median comes from ``ranks.grouped_quantile_cont`` — the exact
    ``percentile()`` aggregate buffers a whole group's values on one
    reducer, which cannot hold when a handful of groups cover a fact
    table; the rank-based form is identical and constant-memory."""
    from .ranks import grouped_quantile_cont

    from functools import reduce as _reduce

    v = F.col(value)
    base = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.sum(v.cast("decimal(12,4)")).cast("decimal(18,4)").cast("double").alias("v_sum"),
    )
    # LEFT join with null-safe key equality: a group whose value column
    # is entirely NULL has no quantile row (the rank pass drops NULL
    # values), and a NULL group KEY would never equi-match — both must
    # stay in the profile with v_median NULL, exactly as the SQL
    # oracle's percentile aggregate behaves.
    med = grouped_quantile_cont(df.select(*keys, value), keys, value, [0.5]).select(
        *[F.col(g).alias(f"_mg_{g}") for g in keys],
        F.col("q_50").alias("v_median"),
    )
    cond = _reduce(
        lambda a, b: a & b,
        [base[g].eqNullSafe(F.col(f"_mg_{g}")) for g in keys],
    )
    return base.join(med, cond, "left").select(
        *keys, "n", "v_min", "v_max", "v_sum", "v_median"
    )


def agg_topk_per_group(
    df: DataFrame,
    group: str,
    order_cols: List[str],
    k: int = 3,
) -> DataFrame:
    """Top-k per group via two-stage bounded reduction. First order
    column descends, the rest ascend as tie-breaks.

    Stage 1 takes each (input-partition, group) slice's local top-k —
    the window's sort is external (spills), and its output is ≤ k rows
    per slice. Stage 2 ranks the ≤ k·npartitions survivors per group —
    a tiny shuffle. This replaces the earlier collect-sort-slice
    aggregate, whose ``collect_list`` buffered the ENTIRE group in the
    aggregation buffer before the slice — a heap OOM (object agg
    buffers don't spill) exactly when groups are huge, the case the
    operator exists for. The window form sorts but never holds a group
    in memory; bounding happens before the cross-partition shuffle."""
    head, *ties = order_cols
    order = [F.col(head).desc()] + [F.col(c).asc() for c in ties]
    w_local = Window.partitionBy("_pid", group).orderBy(*order)
    w_global = Window.partitionBy(group).orderBy(*order)
    return (
        df.select(group, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
        .withColumn("rnk", F.row_number().over(w_global))
        .filter(F.col("rnk") <= k)
        .select(group, "rnk", head, *ties)
    )


def table_profile(df: DataFrame) -> DataFrame:
    """Per-column data-quality profile (row count, null count, exact
    distinct) — the validation verb behind 'is this load sane'.

    Single-pass: ONE aggregation computes every column's stats (the
    multiple exact-distincts compile to one Expand + one shuffle), then
    ``stack`` unpivots the one-row result to (column, stats) rows. The
    naive per-column loop would scan the table N times — at 100 TB a
    10-column profile must not cost 10 full scans. Expand multiplies
    rows ×N_distinct_columns in-flight; for very wide tables swap
    ``countDistinct`` for ``approx_count_distinct`` (no Expand, constant
    memory, same single-scan shape)."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `__nn_{c}`, `__nd_{c}`" for c in cols)
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def histogram(df: DataFrame, value: str, nbuckets: int = 20) -> DataFrame:
    """Equi-width histogram of ``value``: (bucket, n_rows, lo, hi).

    Two passes: a scalar min/max aggregate (broadcast back — one row),
    then one groupBy on the bucket id. The division/floor arithmetic is
    identical IEEE ops in any engine, so bucket assignment is
    deterministic; the top boundary value is clamped into the last
    bucket. At 100 TB this is the profiling shape that replaces a
    driver-side ``df.describe()``: nothing leaves the executors but
    ``nbuckets`` rows."""
    stats = df.agg(F.min(value).alias("_mn"), F.max(value).alias("_mx"))
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(nbuckets))
    bucket = F.least(
        F.floor((F.col(value) - F.col("_mn")) / width), F.lit(nbuckets - 1)
    ).cast("int")
    return (
        df.join(F.broadcast(stats))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_mn").alias("_mn"),
            F.min("_mx").alias("_mx"),
        )
        .select(
            "bucket",
            "n_rows",
            (
                F.col("_mn")
                + F.col("bucket") * ((F.col("_mx") - F.col("_mn")) / F.lit(float(nbuckets)))
            ).alias("lo"),
            (
                F.col("_mn")
                + (F.col("bucket") + 1)
                * ((F.col("_mx") - F.col("_mn")) / F.lit(float(nbuckets)))
            ).alias("hi"),
        )
    )


def distinct_sketches(df: DataFrame, keys: List[str], entity: str) -> DataFrame:
    """Pre-aggregated distinct: one mergeable HLL sketch per key group
    (``hll_sketch_agg`` — Apache DataSketches binary). At 100 TB this
    is the only affordable shape for "uniques over an arbitrary date
    range": scan the facts ONCE into per-day sketches, then answer any
    range by unioning sketches — COUNT(DISTINCT) re-scans the facts per
    question, and exact distinct counts are not mergeable at all."""
    return df.groupBy(*keys).agg(
        F.expr(f"hll_sketch_agg({entity})").alias("sketch")
    )


def union_distinct_estimate(
    sketches: DataFrame, group: List[str] | None = None
) -> DataFrame:
    """Union pre-built sketches (optionally re-grouped coarser) and
    estimate uniques — touches only the sketch table."""
    agg = F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
        "approx_uniques"
    )
    if group:
        return sketches.groupBy(*group).agg(agg)
    return sketches.agg(agg)


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


def frequent_items(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
    capacity_factor: int = 4,
) -> DataFrame:
    """Heavy hitters with guaranteed recall: every value occurring in
    more than ``min_share`` of rows is returned with its EXACT count.

    Two passes, both bounded:

    1. **Candidate generation** — per-partition Misra-Gries summaries
       (``capacity = capacity_factor / min_share`` counters) via
       Arrow-batched ``mapInPandas``: memory per task is the counter
       capacity, NOT the key cardinality, and each partition emits at
       most ``capacity`` candidate rows. Recall is guaranteed by
       pigeonhole with NO sharding assumption: MG keeps any value
       whose count in partition p exceeds ``n_p / capacity``; if a
       value were dropped by EVERY partition its global count would be
       ≤ ΣN_p/capacity = N/capacity < N·min_share — below threshold.
       So every true heavy hitter survives somewhere, and one
       surviving partition is enough to become a candidate.
    2. **Exact recount** — one semi-join of the fact column against the
       (tiny) distinct candidate set + a groupBy on candidates only.
       False-positive candidates are filtered by the final threshold;
       counts are exact, not estimates.

    vs a plain groupBy-count: identical answer, but the full groupBy
    shuffles one row per DISTINCT value — at 100 TB of URLs/tokens that
    is the dominant shuffle; this shuffles ``npartitions × capacity``
    candidate rows plus the recount of candidates only."""
    capacity = max(8, int(capacity_factor / min_share))

    def mg_partition(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                # pd.isna, not `is None`: pandas delivers SQL NULLs in
                # float columns as NaN, and NaN != NaN would mint a
                # fresh counter key per row — flooding the bounded set
                # and evicting real candidates (recall break).
                if pd.isna(v):
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({col: list(counters.keys())})

    field = df.schema[col]
    cand = (
        df.select(col)
        .mapInPandas(mg_partition, f"`{col}` {field.dataType.simpleString()}")
        .distinct()
    )
    total = df.agg(F.count(F.lit(1)).alias("_tot"))
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .join(F.broadcast(total))
        .filter(F.col("n_rows") > F.col("_tot") * F.lit(min_share))
        .select(
            col,
            "n_rows",
            F.floor(F.col("n_rows") * 1e6 / F.col("_tot"))
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


def countmin_sketch_report(
    values: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
    topn: int = 20,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) + accuracy
    report: build the ``depth × width`` cell grid over a value column,
    then report the CMS point estimate next to the exact count for the
    ``topn`` most frequent values — CMS guarantees ``estimate ≥
    exact`` (one-sided error), and the overestimate column is the
    width-sizing signal you read before trusting the sketch alone at
    100 TB (E[overestimate] ≈ N/width per row, min over depth rows).

    Scale shape: the exact per-value count is one uniform map-side-
    combined shuffle; the grid is derived from the COUNT table (sum of
    counts per hashed cell — mathematically identical to hashing every
    occurrence of the stream-ingest deployment path, at a fraction of
    the explode cost) and is bounded at ``depth·width`` rows, so it
    broadcasts back onto the ``topn``-bounded probe side
    (TakeOrderedAndProject). Hashes are md5-derived (the portable
    cross-engine idiom), so the whole report is bit-identical to the
    SQL oracle.
    """
    counts = values.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))

    def bucket_of(row_expr, val_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(row_expr.cast("string"), F.lit("|"), F.col(val_col))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    cells = (
        counts.select(rows, col, "cnt")
        .select(F.col("r"), bucket_of(F.col("r"), col).alias("bucket"), "cnt")
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cell_count"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc(col)).limit(topn)
    probes = top.select(rows, col, "cnt").select(
        F.col(col), F.col("cnt"), F.col("r"),
        bucket_of(F.col("r"), col).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy(col, "cnt")
        .agg(F.min("cell_count").alias("cms"))
    )
    return est.select(
        F.col(col).alias("token"),
        F.col("cnt").cast("long").alias("exact_count"),
        F.col("cms").cast("long").alias("cms_estimate"),
        (F.col("cms") - F.col("cnt")).cast("long").alias("overestimate"),
    )


# HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) with the
# standard small-range linear-counting correction.  alpha_m for m=256
# pinned as an exact ppm integer so the whole estimate is integer math
# (floor(0.7213 / (1 + 1.079/256) * 1e6)); the constant is part of the
# operator contract, NOT recomputed in floating point at runtime.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_ALPHA_PPM = 718272
# numerator of the raw estimate in milli-units:
#   E*1000 = alpha_ppm * m^2 * 2^61 / (1e6 * S) * 1e3
#          = (alpha_ppm * m^2 * 2^61) div (1000 * S)
HLL_RAW_NUMERATOR = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << 61)


def hll_distinct_report(
    values: DataFrame,
    group: str,
    col: str,
    linear_range_milli: int = 2500 * HLL_M,
) -> DataFrame:
    """HyperLogLog distinct-count sketch per group + accuracy report
    against the exact ``COUNT(DISTINCT)`` — the calibration you read
    before replacing exact distincts with the sketch at 100 TB, where
    an exact DISTINCT shuffles the full key space but the HLL partial
    aggregate is 256 registers per task regardless of input size.

    Register math is the portable cross-engine idiom, bit-identical to
    the SQL oracle:

    - ``bucket`` = first 2 md5 hex chars (``p=8`` → m=256 registers);
    - ``rho``    = leading-zero run of the NEXT 60 hash bits + 1,
      via ``61 - length(bin(w))`` (``bin`` strips leading zeros in
      both Spark and DuckDB; ``w = 0`` → 61);
    - register sum ``S = Σ_j 2^(61 - r_j)`` exactly — present buckets
      as ``shiftleft(1, 61 - r)`` summed in DECIMAL(38,0) (the int64
      sum can overflow at r=0), empty buckets folded in as
      ``(m - n_present) * 2^61``;
    - raw estimate in milli-units by exact integer division
      (Spark ``div`` on DECIMAL ≡ DuckDB HUGEINT ``//``);
    - linear counting ``m * ln(m / V)`` for the small range, floored
      to milli-units (the ``tfidf_micro`` ln idiom).

    Scale shape: registers only ever depend on the VALUE, so the
    occurrence table needs no pre-distinct — one uniform shuffle on
    ``(group, bucket)`` whose reduce key space is bounded by
    ``groups × 256`` after map-side partial ``max``.  The exact
    distinct (report baseline only — the thing the sketch replaces in
    production) is the single full-width shuffle in the plan.
    """
    h = F.md5(F.col(col).cast("string"))
    buckets = values.select(
        F.col(group),
        F.col(col),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(h, 3, 15), 16, 10).cast("long").alias("w"),
    ).select(
        group,
        col,
        "bucket",
        F.when(F.col("w") == 0, F.lit(61))
        .otherwise(F.lit(61) - F.length(F.bin(F.col("w"))))
        .cast("int")
        .alias("rho"),
    )
    regs = buckets.groupBy(group, "bucket").agg(F.max("rho").alias("r"))
    per_group = regs.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_present"),
        # shiftleft on an INT literal wraps at 32 bits — the base must
        # be BIGINT for shifts up to 61 (SQL form: the Python helper
        # only takes a literal shift count)
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), 61 - r)").cast("decimal(38,0)")
        ).alias("s_present"),
    )
    exact = values.groupBy(group).agg(
        F.countDistinct(col).alias("exact_distinct")
    )
    est = per_group.select(
        group,
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("zero_buckets"),
        F.expr(
            f"CAST('{HLL_RAW_NUMERATOR}' AS DECIMAL(38,0)) div "
            f"(CAST(1000 AS DECIMAL(38,0)) * (s_present + "
            f"(CAST({HLL_M} AS DECIMAL(38,0)) - n_present) * "
            f"CAST({1 << 61} AS DECIMAL(38,0))))"
        ).cast("long").alias("raw_milli"),
    ).select(
        group,
        "zero_buckets",
        "raw_milli",
        F.when(
            (F.col("raw_milli") <= F.lit(linear_range_milli))
            & (F.col("zero_buckets") > 0),
            F.floor(
                F.lit(float(HLL_M))
                * F.log(F.lit(float(HLL_M)) / F.col("zero_buckets").cast("double"))
                * F.lit(1000.0)
            ),
        )
        .otherwise(F.col("raw_milli"))
        .cast("long")
        .alias("hll_estimate_milli"),
    )
    # signed relative error in exact ppm: integer-divide the ABSOLUTE
    # difference and re-apply the sign — Spark `div` truncates toward
    # zero while DuckDB `//` floors, so negative-operand division is
    # NOT cross-engine portable; non-negative division is.
    return est.join(exact, group).select(
        group,
        "exact_distinct",
        "zero_buckets",
        "raw_milli",
        "hll_estimate_milli",
        F.expr(
            "CAST(sign(hll_estimate_milli - exact_distinct * 1000) * "
            "(abs(hll_estimate_milli - exact_distinct * 1000) * 1000000 "
            "div (exact_distinct * 1000)) AS BIGINT)"
        ).alias("err_ppm"),
    )


def histogram_quantile_report(
    values: DataFrame,
    group: str,
    col: str,
    nbuckets: int = 64,
    qs=((50, 0.5), (90, 0.9), (99, 0.99)),
) -> DataFrame:
    """Equi-width histogram quantile sketch + accuracy report: per
    group, estimate each requested quantile from an ``nbuckets``-cell
    count histogram (cumulate to the target rank, interpolate inside
    the landing bucket assuming uniform fill) next to the EXACT
    ``(n-1)·q`` interpolated quantile — the calibration you read
    before replacing exact quantiles with the sketch at 100 TB. The
    histogram is the mergeable structure (a bounded ``(group, bucket)``
    count — partial aggregates combine by addition across shards/days);
    the exact side exists only as the report baseline and comes from
    :func:`..ranks.grouped_quantile_cont` (range-partitioned ranks —
    never a whole-group percentile buffer).

    ``col`` must be integer-valued (pre-floored cents/micros — the
    cross-engine quantization idiom). Global bucket bounds ride a
    one-row broadcast (the documented broadcast-scalar BNLJ shape), so
    per-group sketches share edges and merge. Bucket index is exact
    int64 math; the two interpolations are fixed-order double
    arithmetic, bit-identical to the SQL oracle.
    """
    from .ranks import grouped_quantile_cont

    vals = values.select(
        F.col(group).alias("grp"), F.col(col).alias("v")
    ).filter(F.col(col).isNotNull())
    bounds = vals.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    hist = (
        vals.join(F.broadcast(bounds))
        .select(
            "grp",
            F.expr(f"((v - vmin) * {nbuckets}) div (vmax - vmin + 1)").alias(
                "bucket"
            ),
            "vmin",
            "vmax",
        )
        .groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("vmin").alias("vmin"),
            F.min("vmax").alias("vmax"),
        )
    )
    sizes = hist.groupBy("grp").agg(F.sum("cnt").alias("n"))
    qdf = values.sparkSession.createDataFrame(
        [(int(p), float(q)) for p, q in qs], "q_pct int, q double"
    )
    targets = (
        sizes.join(F.broadcast(qdf))
        .withColumn(
            "t", (F.floor((F.col("n") - 1) * F.col("q")) + 1).cast("long")
        )
        .select("grp", "q_pct", "q", "n", "t")
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "cumb", F.coalesce(F.sum("cnt").over(w), F.lit(0))
    ).select(
        F.col("grp").alias("_cgrp"), "bucket", "cnt", "cumb", "vmin", "vmax"
    )
    landed = targets.join(
        F.broadcast(cum),
        (F.col("grp") == F.col("_cgrp"))
        & (F.col("cumb") < F.col("t"))
        & (F.col("cumb") + F.col("cnt") >= F.col("t")),
    )
    bw = (F.col("vmax") - F.col("vmin") + 1) / F.lit(float(nbuckets))
    est = landed.select(
        "grp",
        "q_pct",
        F.col("n").cast("long").alias("n_values"),
        (
            F.col("vmin").cast("double")
            + F.col("bucket") * bw
            + ((F.col("t") - F.col("cumb")) / F.col("cnt").cast("double")) * bw
        ).alias("est_cents"),
    )
    exact = grouped_quantile_cont(
        vals, ["grp"], "v", [q for _, q in qs]
    ).select(
        F.col("grp").alias("_egrp"),
        F.expr(
            "stack(%d, %s) AS (_eq_pct, exact_cents)"
            % (
                len(qs),
                ", ".join(f"{int(p)}, q_{int(p)}" for p, _ in qs),
            )
        ),
    )
    return est.join(
        F.broadcast(exact),
        (F.col("grp") == F.col("_egrp")) & (F.col("q_pct") == F.col("_eq_pct")),
    ).select(
        "grp",
        "q_pct",
        "n_values",
        "est_cents",
        "exact_cents",
        (F.col("est_cents") - F.col("exact_cents")).alias("err_cents"),
    )
