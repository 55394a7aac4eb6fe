#!/usr/bin/env python
"""Scale-headroom smoke: run headline query shapes at sf0.1 and at a
10x synthetic blow-up of the same tables, and report the runtime ratio.

A plan that "works at sf0.1" can still hide a serial stage or an
accidental quadratic; this script is the cheap empirical check that the
headline shapes scale ~linearly on a fixed 32-core box (ratio ≈ 10x
data → ≤ ~10x time; well under on floor-dominated queries because the
constant per-query overhead amortizes — the local stand-in for "would
hold at 1000 executors").

Writes nothing outside /tmp. Usage: python scripts/scale_smoke.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_etl_agent_spark.core.session import SparkManager
from spark_etl_agent_spark.core.ship import ship_package

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOWUP = int(os.environ.get("SPARK_GRAFT_BLOWUP", "10"))
WORK = "/tmp/spark_graft_scale_smoke"


def blow_up(spark, out_dir: str) -> None:
    """Replicate lineitem/orders BLOWUP times with re-keyed join keys so
    join fan-out stays 1:N (not N^2) and group cardinality grows with
    the data like a real bigger dataset."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    reps = spark.range(BLOWUP).select(F.col("id").alias("_rep"))
    max_ok = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_rep") * max_ok)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )
    (
        od.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_rep") * max_ok)
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/orders.parquet")
    )


def shapes(spark, d: str):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    od = spark.read.parquet(f"{d}/orders.parquet")
    dec = lambda c: F.col(c).cast("decimal(12,4)")  # noqa: E731
    return {
        "scan_agg": li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.sum(dec("l_extendedprice")).alias("sp"),
            F.count(F.lit(1)).alias("n"),
        ),
        "fact_fact_join": li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n")),
        "window_topk": li.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("l_suppkey")
                .orderBy(F.col("l_extendedprice").desc(), "l_orderkey")
            ),
        ).filter(F.col("rn") <= 3),
        "distinct": li.select("l_partkey", "l_suppkey").distinct(),
    }


def run(spark, d: str) -> dict:
    out = {}
    for name, df in shapes(spark, d).items():
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = time.perf_counter() - t0
    return out


def main():
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    # shuffle sized for the BIG side (~BLOWUP x 11MB lineitem / 64MB)
    m = SparkManager(app_name="scale-smoke", shuffle_partitions=max(8, BLOWUP * 2))
    spark = m.spark
    ship_package(spark)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    blow_up(spark, WORK)
    base = run(spark, SF_DIR)
    base = run(spark, SF_DIR)  # warm second run is the honest baseline
    big = run(spark, WORK)

    print(f"{'shape':18s} {'sf0.1':>8s} {str(BLOWUP)+'x':>8s} {'ratio':>7s}")
    worst = 0.0
    for k in base:
        r = big[k] / base[k]
        worst = max(worst, r)
        print(f"{k:18s} {base[k]:8.2f} {big[k]:8.2f} {r:7.1f}")
    print(
        f"worst ratio {worst:.1f}x on {BLOWUP}x data "
        f"({'SUB' if worst <= BLOWUP else 'SUPER'}-linear)"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    m.stop()
    sys.exit(0 if worst <= BLOWUP * 1.5 else 1)


if __name__ == "__main__":
    main()
