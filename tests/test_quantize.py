"""Planted-case tests for int8 embedding quantization
(`llm/quantize.py`) and the hashed-feature linear quality scorer
(`llm/text.py::linear_quality_score`)."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.quantize import quantize_int8_report
from spark_etl_agent_spark.llm.text import linear_quality_score


def test_quantize_int8_planted(spark):
    # micro components: [1000000, -500000, 250000]; absmax 1e6;
    # scale = 1e6/127; x/scale = [127, -63.5, 31.75] → ties away from
    # zero → q = [127, -64, 32]
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, -0.5, 0.25])]
    )
    out = quantize_int8_report(df).collect()[0]
    scale = 1_000_000 / 127.0
    assert out.n_dims == 3
    assert out.scale == pytest.approx(scale)
    # errors in nano units (micro * 1000)
    exp_errs = [
        round(abs(q * scale - x) * 1000)
        for q, x in [(127, 1_000_000), (-64, -500_000), (32, 250_000)]
    ]
    assert out.sum_abs_err == sum(exp_errs)
    assert out.max_abs_err == max(exp_errs)
    assert out.cos_fidelity == pytest.approx(1.0, abs=1e-4)


def test_quantize_int8_zero_vector_guard(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[0.0, 0.0])])
    out = quantize_int8_report(df).collect()[0]
    assert out.scale == 0.0
    assert out.sum_abs_err == 0 and out.max_abs_err == 0
    assert out.cos_fidelity is None


def test_quantize_int8_is_projection_only(spark, sf_dir):
    """No shuffle anywhere: the operator must stay scan-bound."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        quantize_int8_report(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def _py_weight(word: str, n_buckets: int = 256) -> int:
    bucket = int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n_buckets
    h = hashlib.md5(str(bucket).encode()).hexdigest()[:4]
    return (int(h, 16) % 2001) - 1000


def test_linear_quality_score_planted(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Alpha beta ALPHA"),
            Row(doc_id=2, text="   "),  # whitespace-only: no row
        ]
    )
    rows = {r.doc_id: r for r in linear_quality_score(df).collect()}
    assert set(rows) == {1}
    expected_z = 2 * _py_weight("alpha") + _py_weight("beta")
    r = rows[1]
    assert r.n_tokens == 3
    assert r.z_milli == expected_z
    assert r.mean_w_milli == pytest.approx(expected_z / 3)
    import math

    assert r.quality_bucket == math.floor(expected_z / 3 / 100)
