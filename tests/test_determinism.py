"""Partitioning-independence guards: the engine's central determinism
claim is that results are identical under any parallelism (the property
that makes the DuckDB oracle meaningful and nightly totals stable).
Run the decimal-sum flagship and a sampled query under different
partitionings and require bit-identical results."""

from spark_etl_agent_spark.queries import registry
from spark_etl_agent_spark.queries.base import load

from .parity import canonical_rows

SPECS = registry()


def _rows(df):
    return canonical_rows(df.toPandas())


def test_decimal_aggregation_partitioning_independent(spark, sf_dir):
    """The same decimal-sum aggregation over 1, 7 and 32 input
    partitions must be bit-identical (raw double sums would differ in
    the low bits between partitionings)."""
    from pyspark.sql import functions as F

    from spark_etl_agent_spark.queries.base import dec

    li = load(spark, sf_dir, "lineitem")

    def agg(df):
        return _rows(
            df.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum(dec("l_quantity"))
                .cast("decimal(18,4)")
                .cast("double")
                .alias("sum_qty"),
                F.sum(dec("l_extendedprice"))
                .cast("decimal(18,4)")
                .cast("double")
                .alias("sum_price"),
            )
        )

    baseline = agg(li.repartition(32))
    assert baseline
    for n in (1, 7):
        assert agg(li.repartition(n)) == baseline


def test_sampling_partitioning_independent(spark, sf_dir):
    from spark_etl_agent_spark.llm.sampling import deterministic_sample

    docs = load(spark, sf_dir, "documents").select("doc_id")
    a = set(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).collect())
    b = set(
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), "doc_id", 0.3).collect()
    )
    assert a == b and a


def test_entry_schema_stable(spark):
    """The driver smoke-checks entry() for a stable schema — two
    invocations must agree exactly."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry_det", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    s1 = mod.entry(spark).schema
    s2 = mod.entry(spark).schema
    assert s1 == s2
