"""``queries.base.fan_out`` split estimation.

The round-6 verdict found the file-COUNT heuristic backwards on a
few-huge-files layout: 10 × 10 GB is ~800 splits but 10 files, so
``len(inputFiles()) < defaultParallelism`` added a full-corpus
round-robin shuffle that real scale never needs. fan_out now estimates
splits from the actual file sizes against
``spark.sql.files.maxPartitionBytes`` — these tests pin both directions
by shrinking/growing ``maxPartitionBytes`` around a fixed parquet file.
"""

import pytest
from pyspark.sql import functions as F

from spark_etl_agent_spark.queries.base import fan_out


def _has_roundrobin(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "RoundRobinPartitioning" in plan or "Exchange RoundRobin" in plan


@pytest.fixture(scope="module")
def one_file(spark, tmp_path_factory):
    """A single parquet file (multiple row groups) — the layout whose
    split count the old file-count heuristic got wrong."""
    path = str(tmp_path_factory.mktemp("fanout") / "t.parquet")
    (
        spark.range(200_000)
        .select(
            F.col("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)  # many row groups
        .parquet(path)
    )
    return path


def test_single_huge_file_is_not_reshuffled(spark, one_file):
    """One file whose size spans >= defaultParallelism split targets
    must NOT get a round-robin repartition — the scan itself already
    yields enough splits."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # tiny split target → the one file is worth hundreds of splits
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096b")
        df = fan_out(spark.read.parquet(one_file))
        assert not _has_roundrobin(df)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_genuinely_small_file_is_widened(spark, one_file):
    """When the byte math really does say one split, the widen fires
    (the original purpose: a single-row-group fixture serializing all
    downstream per-row compute into one task)."""
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        df = fan_out(spark.read.parquet(one_file))
        assert _has_roundrobin(df)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_results_unchanged(spark, one_file):
    base = spark.read.parquet(one_file)
    assert fan_out(base).count() == base.count()
