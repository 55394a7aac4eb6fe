#!/usr/bin/env python
"""Single-query isolation bench (guide §1): run named queries through
the noop sink K times on a warm session configured exactly like
bench.py, print per-run walls, and optionally dump
``explain('formatted')`` per query to a directory.

Usage:
    python scripts/qbench.py [-n RUNS] [--plans DIR] [--suffix TAG] q1 q2 ...

Timing methodology matches bench.py (build + execute measured
separately; noop sink so no collect / sink cost). Intended for
before/after A/B on one query while optimizing — NOT a replacement for
the full bench.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_etl_agent_spark.core.session import SparkManager  # noqa: E402
from spark_etl_agent_spark.core.ship import ship_package  # noqa: E402
from spark_etl_agent_spark.queries import registry  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", "--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument(
        "--suffix", default="", help="plan filename suffix (before/after)"
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import glob

    input_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{sf_dir}/*.parquet")
    )
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = max(8, min(cores * 4, (input_bytes >> 26) + 1))

    m = SparkManager(
        app_name="qbench",
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "12g"
            ),
            "spark.python.worker.idleTimeoutSeconds": "0",
        },
    )
    spark = m.spark
    ship_package(spark)

    # same warmups as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(
        10_000, numPartitions=spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    from spark_etl_agent_spark.queries.base import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t)

    specs = registry()
    for name in args.names:
        spec = specs[name]
        for r in range(args.runs):
            spark.sparkContext.setJobDescription(f"qbench:{name}#{r}")
            # per-run cache isolation, mirroring bench.py's release
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jid in jmap.keySet().toArray():
                rdd = jmap.get(jid)
                if rdd is not None:
                    rdd.unpersist(False)
            b0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            b1 = time.perf_counter()
            if args.plans and r == 0:
                os.makedirs(args.plans, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                suffix = f"_{args.suffix}" if args.suffix else ""
                with open(
                    os.path.join(args.plans, f"{name}{suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            e0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            e1 = time.perf_counter()
            print(
                f"{name} run{r}: build={b1 - b0:.3f}s exec={e1 - e0:.3f}s"
                f" total={(b1 - b0) + (e1 - e0):.3f}s",
                flush=True,
            )
    m.stop()


if __name__ == "__main__":
    main()
