"""Data-quality audit verbs: referential integrity + expectation rules
at scale.

The reference's validation surface is row-count variance
(``services/jcap_pa_etl_service.py`` backup/validate); a 100 TB corpus
also needs *relationship* checks — how many child rows point at a
parent key that does not exist — and *column expectation* gates
(completeness / range / set-membership / uniqueness). These are the
load-gates that catch a partial dimension load or a schema-valid-but-
garbage batch before a silently-wrong join fans out NULLs.

Shapes: ``left_anti`` join per relation (one shuffle on the FK — or
zero when the parent key set broadcasts); ONE aggregation pass for all
expectation rules on a table (uniqueness adds one distinct per keyed
rule, planned as Expand in the same scan). Never materializes failing
rows to the driver; for the remediation path, call :func:`orphans` (or
filter by the rule predicate) and sink them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no matching parent key (NULL FKs are not
    orphans — they are counted separately by the audit)."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def referential_audit(
    relations: List[Tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """One summary row per (name, child, child_key, parent, parent_key)
    relation: child row count, NULL-FK count, orphan count.

    Each relation costs one anti-join over the child; Spark plans a
    broadcast anti-join whenever the distinct parent key set is small
    (the usual dimension case), so the common audit is shuffle-free on
    the fact side.
    """
    out = None
    for name, child, child_key, parent, parent_key in relations:
        n_orphans = (
            orphans(child, child_key, parent, parent_key)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("relation"), F.col("n").alias("n_orphans"))
        )
        base = child.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(
                F.when(F.col(child_key).isNull(), 1).otherwise(0)
            ).cast("long").alias("n_null_fk"),
        )
        piece = base.join(n_orphans, on="relation", how="inner")
        out = piece if out is None else out.unionByName(piece)
    return out


# -- expectation rules ---------------------------------------------------------


@dataclass(frozen=True)
class Expectation:
    """One named rule over a table. ``predicate`` is a boolean Column
    evaluated per row; rows where it is false (or NULL) count as
    violations. ``max_violation_ratio`` is the gate: 0.0 = hard rule,
    0.01 = tolerate up to 1% bad rows (real corpora are never
    perfectly clean; a hard gate on a soft rule blocks every load)."""

    name: str
    predicate: Column
    max_violation_ratio: float = 0.0


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    return F.col(col).between(F.lit(lo), F.lit(hi))


def in_set(col: str, values: Sequence) -> Column:
    return F.col(col).isin(list(values))


def matches(col: str, regex: str) -> Column:
    return F.col(col).rlike(regex)


def expectation_report(
    df: DataFrame,
    rules: List[Expectation],
    unique_keys: Optional[List[str]] = None,
) -> DataFrame:
    """Evaluate every rule in ONE aggregation over one scan: each rule
    contributes a conditional count, so N rules cost the same pass as
    one (never a scan per rule — the per-column-loop anti-pattern).
    Optional ``unique_keys`` adds a key-uniqueness rule via one
    count-distinct in the same aggregate.

    Output: one row per rule — (rule, n_rows, n_violations,
    violation_ppm, allowed_ppm, passed). The caller gates the load on
    ``passed`` (``bool_and`` over the frame, or anti-filter to quarantine
    the violating rows)."""
    if not rules and not unique_keys:
        raise ValueError(
            "expectation_report needs at least one rule or unique_keys"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(r.predicate, F.lit(0)).otherwise(F.lit(1))
            ).cast("long").alias(f"__v_{i}")
        )
    if unique_keys:
        aggs.append(F.countDistinct(*[F.col(k) for k in unique_keys]).alias("__nd"))
    one = df.agg(*aggs)

    # Typed unpivot (explode over structs), NOT a string-interpolated
    # stack() selectExpr: rule names are data, never SQL text, so
    # quotes/backslashes/any character in a name cannot break parsing.
    entries = []
    names = []
    for i, r in enumerate(rules):
        names.append((r.name, r.max_violation_ratio))
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"__v_{i}").alias("n_violations"),
            )
        )
    if unique_keys:
        nm = "unique(" + ",".join(unique_keys) + ")"
        names.append((nm, 0.0))
        entries.append(
            F.struct(
                F.lit(nm).alias("rule"),
                (F.col("__n") - F.col("__nd")).alias("n_violations"),
            )
        )
    rows = one.select(
        "__n", F.explode(F.array(*entries)).alias("__e")
    ).select("__n", F.col("__e.rule").alias("rule"),
             F.col("__e.n_violations").alias("n_violations"))
    allowed = F.create_map(
        *[x for nm, ratio in names for x in (F.lit(nm), F.lit(ratio))]
    )
    return rows.select(
        "rule",
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.floor(
            F.col("n_violations") * F.lit(1_000_000.0)
            / F.greatest(F.col("__n"), F.lit(1))
        ).cast("bigint").alias("violation_ppm"),
        F.floor(allowed[F.col("rule")] * F.lit(1_000_000.0))
        .cast("bigint")
        .alias("allowed_ppm"),
    ).withColumn(
        "passed", F.col("violation_ppm") <= F.col("allowed_ppm")
    )


def freshness_report(
    df: DataFrame,
    ts_col: str,
    as_of,
    max_lag_hours: float,
    groups: Optional[List[str]] = None,
) -> DataFrame:
    """Freshness gate: is the newest event (optionally per group/source)
    recent enough? One MIN/MAX aggregation — no sort, no collect.
    ``as_of`` is injected (a datetime or ISO string), never wall-clock
    read inside the plan: reruns and backfills must evaluate the gate
    against the batch's logical time, and tests need determinism.

    Output per group: newest_ts, oldest_ts, lag_hours (as_of − newest),
    passed. A source that stopped emitting shows up as a failing row
    here hours before a volume-variance check would notice."""
    as_of_col = F.lit(as_of).cast("timestamp")
    agg = [
        F.min(ts_col).alias("oldest_ts"),
        F.max(ts_col).alias("newest_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    base = df.groupBy(*groups).agg(*agg) if groups else df.agg(*agg)
    # .cast("timestamp") first: a TIMESTAMP_NTZ feed column (what raw
    # parquet often carries) cannot cast straight to DOUBLE, and under
    # the UTC-pinned session the NTZ→LTZ hop is value-identical
    lag_h = (
        as_of_col.cast("double")
        - F.col("newest_ts").cast("timestamp").cast("double")
    ) / F.lit(3600.0)
    return base.select(
        *(groups or []),
        "n_rows",
        "oldest_ts",
        "newest_ts",
        F.round(lag_h, 6).alias("lag_hours"),
    ).withColumn(
        "passed",
        F.col("newest_ts").isNotNull()
        & (F.col("lag_hours") <= F.lit(float(max_lag_hours))),
    )


def drift_psi(
    df,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str = "event_type",
    boundary: str = "2024-01-16",
    n_buckets: int = 10,
    bucket_width: float = 25.0,
    alert_micro: int = 50_000,
):
    """Population Stability Index between a reference window
    (``ts < boundary``) and the current window, per group — the
    standard "did this feed's distribution drift?" monitor a
    production pipeline runs before trusting new data.

    Shape: one scan tags every row with (group, value bucket, side);
    one bounded-key groupBy counts the grid; the full
    group × bucket grid is rebuilt executor-side (``sequence``
    explode over the distinct groups — missing buckets matter because
    of add-one smoothing) and the per-group PSI is a bounded-key sum.
    Nothing scales with rows except the first scan.

    Determinism: bucket proportions are integer ppm with add-one
    (Laplace) smoothing — ``(c+1)·1e6 div (total+n_buckets)`` — so
    every PSI term is ``floor((p_ppm − q_ppm) · ln(p_ppm/q_ppm))``,
    an int64 under the tfidf 1-ULP ln idiom, and the per-group sum is
    order-independent. ``worst_bucket`` ties break on the lower
    bucket id.
    """
    b = bucketize(value_col, n_buckets, bucket_width)
    side = F.when(
        F.col(ts_col) < F.lit(boundary).cast("timestamp"), F.lit("ref")
    ).otherwise(F.lit("cur"))
    tagged = df.select(
        F.col(group_col).alias("grp"), b.alias("bucket"), side.alias("side")
    )
    counts = tagged.groupBy("grp", "bucket", "side").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        tagged.select("grp")
        .distinct()
        .select("grp", F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"))
    )
    ref = counts.filter(F.col("side") == "ref").select(
        "grp", "bucket", F.col("c").alias("rc")
    )
    cur = counts.filter(F.col("side") == "cur").select(
        "grp", "bucket", F.col("c").alias("cc")
    )
    full = (
        grid.join(ref, ["grp", "bucket"], "left")
        .join(cur, ["grp", "bucket"], "left")
        .select(
            "grp",
            "bucket",
            F.coalesce("rc", F.lit(0)).cast("long").alias("rc"),
            F.coalesce("cc", F.lit(0)).cast("long").alias("cc"),
        )
    )
    return psi_from_grid(full, n_buckets, alert_micro).withColumnRenamed(
        "grp", group_col
    )


def bucketize(value_col: str, n_buckets: int, bucket_width: float):
    """Fixed-width value bucket, clamped into [0, n_buckets)."""
    return F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor(F.col(value_col) / F.lit(float(bucket_width))).cast("int"),
        ),
    )


def reference_histogram(
    df,
    value_col: str = "value",
    group_col: str = "event_type",
    n_buckets: int = 10,
    bucket_width: float = 25.0,
):
    """Full (group × bucket) reference histogram — the frozen "p side"
    a streaming drift monitor compares every micro-batch against. The
    grid is dense (missing buckets as 0) because add-one smoothing
    needs every cell, and the group universe is the REFERENCE's: the
    monitor watches known feeds; a group that first appears mid-stream
    is a schema event, not drift. Output: (grp, bucket, rc)."""
    tagged = df.select(
        F.col(group_col).alias("grp"),
        bucketize(value_col, n_buckets, bucket_width).alias("bucket"),
    )
    counts = tagged.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        tagged.select("grp")
        .distinct()
        .select(
            "grp",
            F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
        )
    )
    return grid.join(counts, ["grp", "bucket"], "left").select(
        "grp", "bucket", F.coalesce("c", F.lit(0)).cast("long").alias("rc")
    )


def psi_from_grid(full, n_buckets: int = 10, alert_micro: int = 50_000):
    """PSI report from a dense (grp, bucket, rc, cc) count grid — the
    shared algebra of :func:`drift_psi` (batch, ref window vs current
    window) and the streaming drift sink (frozen reference vs each
    micro-batch). Integer ppm with add-one smoothing; per-group sums of
    int64 terms; worst bucket ties to the lower id. Output:
    (grp, n_ref, n_cur, psi_micro, worst_bucket, drifted)."""
    totals = full.groupBy("grp").agg(
        F.sum("rc").alias("n_ref"), F.sum("cc").alias("n_cur")
    )
    terms = full.join(totals, "grp").select(
        "grp",
        "bucket",
        "n_ref",
        "n_cur",
        F.expr(f"((rc + 1) * 1000000) div (n_ref + {int(n_buckets)})")
        .cast("long")
        .alias("p_ppm"),
        F.expr(f"((cc + 1) * 1000000) div (n_cur + {int(n_buckets)})")
        .cast("long")
        .alias("q_ppm"),
    ).select(
        "grp",
        "bucket",
        "n_ref",
        "n_cur",
        F.floor(
            (F.col("p_ppm") - F.col("q_ppm")).cast("double")
            * F.log(F.col("p_ppm").cast("double") / F.col("q_ppm").cast("double"))
        )
        .cast("long")
        .alias("term_micro"),
    )
    return (
        terms.groupBy("grp", "n_ref", "n_cur")
        .agg(
            F.sum("term_micro").alias("psi_micro"),
            (-F.array_max(
                F.collect_list(
                    F.struct(
                        F.col("term_micro").alias("t"),
                        (-F.col("bucket")).alias("nb"),
                    )
                )
            )["nb"]).cast("int").alias("worst_bucket"),
        )
        .select(
            "grp",
            "n_ref",
            "n_cur",
            "psi_micro",
            "worst_bucket",
            (F.col("psi_micro") >= F.lit(int(alert_micro))).alias("drifted"),
        )
    )
