"""HyperLogLog sketch (operators/sketches.py::hll_distinct_report):
pure-Python register reference, estimator accuracy on known
cardinalities, and the occurrence-invariance property that makes the
no-pre-distinct scale shape sound."""

import hashlib
import math

from pyspark.sql import functions as F

from spark_etl_agent_spark.operators.sketches import (
    HLL_ALPHA_PPM,
    HLL_M,
    HLL_RAW_NUMERATOR,
    hll_distinct_report,
)


def _reference_hll(values):
    """Register-exact Python replica of the operator contract."""
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:17], 16)  # next 60 bits
        rho = 61 if w == 0 else 61 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(1 << (61 - r) for r in regs.values())
    s += (HLL_M - len(regs)) * (1 << 61)
    raw_milli = HLL_RAW_NUMERATOR // (1000 * s)
    zeros = HLL_M - len(regs)
    if raw_milli <= 2500 * HLL_M * 1000 // 1000 and zeros > 0:
        est = math.floor(HLL_M * math.log(HLL_M / zeros) * 1000)
    else:
        est = raw_milli
    return raw_milli, zeros, est


def test_hll_matches_python_reference(spark):
    values = [f"val{i}" for i in range(777)]
    df = spark.createDataFrame([("g", v) for v in values], "g string, v string")
    row = hll_distinct_report(df, "g", "v").collect()[0]
    raw_milli, zeros, est = _reference_hll(values)
    assert row["exact_distinct"] == 777
    assert row["zero_buckets"] == zeros
    assert row["raw_milli"] == raw_milli
    assert row["hll_estimate_milli"] == est


def test_hll_accuracy_within_bound(spark):
    """Relative error stays within ~3 sigma of the HLL bound
    (1.04 / sqrt(m) = 6.5% for m=256) on a 5k-cardinality set."""
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(5000)], "g string, v string"
    )
    row = hll_distinct_report(df, "g", "v").collect()[0]
    assert row["exact_distinct"] == 5000
    rel = abs(row["hll_estimate_milli"] / 1000.0 - 5000) / 5000
    assert rel < 3 * 1.04 / math.sqrt(HLL_M)


def test_hll_occurrence_invariant(spark):
    """Registers depend only on the VALUE — duplicated occurrences and
    partition layout change nothing. This is what licenses skipping
    the pre-distinct at 100 TB."""
    vals = [f"tok{i}" for i in range(300)]
    once = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    many = spark.createDataFrame(
        [("g", v) for v in vals for _ in range(7)], "g string, v string"
    ).repartition(13)
    a = hll_distinct_report(once, "g", "v").collect()[0]
    b = hll_distinct_report(many, "g", "v").collect()[0]
    for c in ("zero_buckets", "raw_milli", "hll_estimate_milli",
              "exact_distinct", "err_ppm"):
        assert a[c] == b[c], c


def test_hll_linear_counting_small_range(spark):
    """A tiny set lands in the linear-counting regime: estimate is
    m*ln(m/V) floored to milli, not the raw harmonic-mean form."""
    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(10)], "g string, v string"
    )
    row = hll_distinct_report(df, "g", "v").collect()[0]
    assert row["zero_buckets"] >= HLL_M - 10
    expected = math.floor(HLL_M * math.log(HLL_M / row["zero_buckets"]) * 1000)
    assert row["hll_estimate_milli"] == expected
    # linear counting is near-exact at this density
    assert abs(row["hll_estimate_milli"] - 10_000) <= 300


def test_hll_alpha_constant_contract():
    """The pinned ppm constant IS floor(alpha_256 * 1e6)."""
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    assert HLL_ALPHA_PPM == math.floor(alpha * 1e6)
    assert HLL_RAW_NUMERATOR == HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << 61)


def test_hll_plan_no_cartesian_single_wide_shuffle(spark, sf_dir):
    """Plan gate: no cartesian anywhere; the sketch path's shuffle key
    space is (group, bucket) — the only full-width distinct is the
    report's exact-baseline side."""
    from spark_etl_agent_spark.queries import registry

    df = registry()["hll_distinct_trigrams"].spark(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
