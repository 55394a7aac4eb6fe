"""Reproducible sampling & splitting for training-data pipelines.

``df.sample()`` is partitioning-dependent (seed + partition index), so
results change whenever the file layout changes — useless for a
training corpus that must be re-derivable bit-for-bit. These operators
hash a stable key instead: membership depends only on the ROW, never on
partitioning, executor count, or engine — the property that makes
sample membership auditable at 100 TB (and lets a DuckDB oracle verify
it exactly).

Mechanism: the first 8 hex digits of ``md5(salt || key)`` as a uniform
integer in [0, 2^32) — compare against ``rate·2^32`` to sample, or
take mod N for split assignment.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 16 ** 8  # first 8 md5 hex digits


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform integer in [0, 2^32) derived from the row key only."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
                  16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "s1"
) -> DataFrame:
    """Keep ≈rate of rows, membership a pure function of the key."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * _HASH_SPACE))


def split_label(
    key: Column,
    weights: Tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split1",
) -> Column:
    """The split assignment as a pure COLUMN expression of the key —
    usable as a projection anywhere the key is already present (no
    split-table join needed; a join would shuffle both sides for a
    value that is a deterministic function of one column)."""
    b = hash_bucket(key, salt)
    t_train = int(weights[0] * _HASH_SPACE)
    t_val = int((weights[0] + weights[1]) * _HASH_SPACE)
    return (
        F.when(b < t_train, "train").when(b < t_val, "val").otherwise("test")
    )


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    weights: Tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split1",
) -> DataFrame:
    """Assign each row a stable split label; a row's split never changes
    under repartitioning, engine change, or re-run."""
    return df.withColumn(
        "split", split_label(F.col(key_col), weights, salt)
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, salt: str = "w1"
) -> DataFrame:
    """Per-row acceptance with probability proportional to a weight in
    [0, 1] (e.g. a quality score): keep iff hash_bucket < weight·2^32.
    Same stable-membership guarantee — acceptance is a pure function of
    (key, weight), so re-runs and engine changes reproduce the exact
    corpus."""
    # explicit floor: Spark's double→long cast truncates but other
    # engines round — floor is the portable, mirrorable semantics
    return df.filter(
        hash_bucket(F.col(key_col), salt)
        < F.floor(F.col(weight_col).cast("double") * _HASH_SPACE).cast("long")
    )


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: Dict[str, float],
    salt: str = "strat1",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample boilerplate-heavy sources),
    same stable-membership guarantee."""
    b = hash_bucket(F.col(key_col), salt)
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | (
            (F.col(stratum_col) == stratum) & (b < int(rate * _HASH_SPACE))
        )
    return df.filter(cond)


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    weights: Dict[str, float],
    max_epochs: float = 4.0,
) -> DataFrame:
    """Domain-reweighting plan (the DoReMi/Pile-style mixture step):
    given target mixture proportions and a repetition cap, compute the
    LARGEST total corpus achievable — the binding domain is the one that
    would have to repeat more than ``max_epochs`` times to meet its
    share; every other domain is scaled down proportionally.

    Returns one row per target domain PRESENT in the data (an absent
    domain yields no row — callers that require every configured
    domain must check, as ``jobs.pretrain`` does, because a missing
    row means the configured mixture is unachievable):
    ``(domain, n_avail, target_w, n_target, epochs)`` with
    ``n_target = floor(target_w * scale)`` where
    ``scale = min_d(n_avail_d * max_epochs / w_d)``.

    Deterministic across engines: per-domain double division then a MIN
    (no order-dependent summation); the scalar joins back via a
    broadcast — counts are one map-side-partial aggregation over the
    corpus, everything after is metadata-sized.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("every target weight must be > 0")
    if max_epochs <= 0:
        raise ValueError("max_epochs must be > 0")
    target_w = F.lit(None).cast("double")
    for d, w in weights.items():
        target_w = F.when(F.col(domain_col) == d, F.lit(float(w))).otherwise(
            target_w
        )
    tagged = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n_avail"))
        .withColumn("target_w", target_w)
        .filter(F.col("target_w").isNotNull())
    )
    scale = tagged.agg(
        F.min(
            F.col("n_avail").cast("double")
            * F.lit(float(max_epochs))
            / F.col("target_w")
        ).alias("__scale")
    )
    return tagged.crossJoin(F.broadcast(scale)).select(
        F.col(domain_col),
        "n_avail",
        "target_w",
        F.floor(F.col("target_w") * F.col("__scale"))
        .cast("bigint")
        .alias("n_target"),
        (
            F.floor(F.col("target_w") * F.col("__scale")).cast("double")
            / F.col("n_avail")
        ).alias("epochs"),
    )


def resample_epochs(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    epochs: Dict[str, float],
    salt: str = "mix1",
) -> DataFrame:
    """Materialize a fractional-epoch resampling: each row of domain d
    is emitted ``floor(epochs_d)`` times plus one more with probability
    ``frac(epochs_d)`` — so the expected multiplicity is exactly
    ``epochs_d`` (``epochs_d < 1`` is a plain downsample). Acceptance of
    the fractional copy hashes (key, copy index), so membership is a
    pure row function — re-runs, repartitionings, and the DuckDB oracle
    reproduce the corpus bit-for-bit.

    Output = input columns + ``copy`` (1-based). The explode is a
    zero-shuffle projection; output size is the only cost, exactly as a
    repeated-epochs training corpus must be.
    """
    if any(e < 0 for e in epochs.values()):
        raise ValueError("epochs must be >= 0")
    eps = F.lit(None).cast("double")
    for d, e in epochs.items():
        eps = F.when(F.col(domain_col) == d, F.lit(float(e))).otherwise(eps)
    # strictly-positive filter matters: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]), so a 0-epoch domain would otherwise emit a copy-0
    # row that passes the floor() keep-test
    with_eps = df.withColumn("__eps", eps).filter(F.col("__eps") > 0)
    exploded = with_eps.withColumn(
        "copy", F.explode(F.sequence(F.lit(1), F.ceil("__eps").cast("int")))
    )
    frac = F.col("__eps") - F.floor("__eps")
    keep = (F.col("copy") <= F.floor("__eps")) | (
        hash_bucket(
            F.concat(F.col(key_col).cast("string"), F.lit(":"), F.col("copy")),
            salt,
        )
        < F.floor(frac * _HASH_SPACE).cast("long")
    )
    return exploded.filter(keep).drop("__eps")


def temperature_mixture_plan(
    df: DataFrame,
    domain_col: str,
    temperature_pct: int = 50,
) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual-pretraining
    standard: sample domain d with probability ∝ n_d^α, α<1, so
    low-resource domains are upweighted without fixing weights by
    hand — mBERT/XLM-R use α≈0.7, α=0.5 is √-sampling).

    Integer-exact restatement so both engines agree bit-for-bit:
    α = temperature_pct/100 restricted to {50, 100} — α=0.5 uses
    ``floor(sqrt(n))`` (exact: ints < 2^52 are exactly representable,
    IEEE sqrt is correctly rounded, perfect squares land exactly) and
    α=1.0 degenerates to proportional sampling. Output per domain:
    ``(domain, n_avail, w_int, share_ppm)`` with
    ``share_ppm = w_int·1e6 div Σw`` — pure int64, no transcendental.

    One map-side-partial count over the corpus; everything after is
    metadata-sized (the Σw scalar broadcasts back).
    """
    if temperature_pct not in (50, 100):
        raise ValueError(
            "temperature_pct must be 50 (sqrt) or 100 (proportional) — "
            "other α need a transcendental pow, which breaks the "
            "exact-integer oracle contract"
        )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_avail"))
    if temperature_pct == 50:
        w = F.floor(F.sqrt(F.col("n_avail").cast("double"))).cast("long")
    else:
        w = F.col("n_avail").cast("long")
    weighted = counts.withColumn("w_int", w)
    total = weighted.agg(F.sum("w_int").alias("__tw"))
    return weighted.crossJoin(F.broadcast(total)).select(
        F.col(domain_col),
        "n_avail",
        "w_int",
        F.expr("(w_int * 1000000) div __tw").cast("long").alias("share_ppm"),
    )
