"""SQL function registry tests: every registered function is callable
from plain spark.sql and computes the documented value."""

import math

import pytest

from spark_etl_agent_spark.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    return register_all(spark)


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_text_functions(spark):
    assert one(spark, "word_count('The quick  brown fox')") == 4
    assert one(spark, "norm_text('  A  B\\tC ')") == "a b c"
    assert one(spark, "bpe_est_tokens('abcdefgh')") == 2
    import hashlib

    assert one(spark, "content_hash('abc')") == hashlib.md5(b"abc").hexdigest()


def test_vector_functions(spark):
    assert one(spark, "vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))") == 11.0
    assert one(spark, "vec_norm(array(3.0D, 4.0D))") == 5.0
    v = one(spark, "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))")
    assert math.isclose(v, 1.0)
    assert one(spark, "cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D))") == 0.0


def test_set_and_date_functions(spark):
    assert one(spark, "jaccard(array('a','b'), array('b','c'))") == pytest.approx(1 / 3)
    assert one(spark, "jaccard(array(), array())") is None
    assert (
        str(one(spark, "greatest_date_nullsafe(DATE'2020-01-02', DATE'2020-01-01')"))
        == "2020-01-02"
    )
    # P10 CASE semantics: NULL comparison falls to the ELSE branch
    assert (
        str(one(spark, "greatest_date_nullsafe(DATE'2020-01-02', CAST(NULL AS DATE))"))
        == "2020-01-02"
    )


def test_functions_compose_in_queries(spark):
    df = spark.sql(
        "SELECT jaccard(split(norm_text('a b c'), ' '), "
        "split(norm_text('B C d'), ' ')) AS j"
    )
    assert df.collect()[0]["j"] == pytest.approx(0.5)
