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
                "queries": dict(
                    sorted(timings.items(), key=lambda kv: -kv[1])[:10]
                ),
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
