#!/usr/bin/env python
"""DuckDB oracle-side A/B twin of bench.py: run every declared oracle
at $SPARK_GRAFT_SF_DIR (default sf0.1) and print one JSON line with the
same shape, so Spark-vs-oracle comparisons come from the same host at
the same moment (shared-host variance cancels in back-to-back runs)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402

from spark_etl_agent_spark.queries import registry  # noqa: E402
from spark_etl_agent_spark.queries.base import TABLES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    con.execute(
        f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # Host-speed micro-calibration (r10 verdict ask #8): a PINNED
    # workload, byte-identical every round, whose wall is a pure host
    # thermometer — committed alongside the paired artifact so the
    # cross-round regression gate can normalize spark-wall movements
    # for ambient host drift (measured ~20% across one afternoon on
    # this shared host) instead of waivering them. Median of 5 draws.
    cal_sql = (
        "SELECT l_orderkey % 1024 AS k, sum(l_extendedprice), "
        "avg(l_discount), count(*) FROM lineitem GROUP BY k ORDER BY k"
    )
    cal_draws = []
    for _ in range(5):
        t0 = time.perf_counter()
        con.execute(cal_sql).fetchall()
        cal_draws.append(time.perf_counter() - t0)
    calibration_s = round(sorted(cal_draws)[len(cal_draws) // 2], 4)

    timings = {}
    for name, spec in sorted(registry().items()):
        if spec.oracle is None:
            continue
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    # full per-query detail for the committed paired artifact (the
    # stdout line below carries only the 10 slowest to stay inside the
    # driver's stdout tail, mirroring bench.py's convention)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "ORACLE_SUMMARY_sf0.1.json"), "w") as f:
        json.dump(
            {
                "metric": "oracle_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_dir,
                "calibration_s": calibration_s,
                "queries": timings,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "oracle_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf_dir,
                "calibration_s": calibration_s,
                "queries": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:10]
                ),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
