#!/usr/bin/env python
"""Merge the two per-query summaries a paired A/B run writes
(BENCH_SUMMARY_sf0.1.json from bench.py, ORACLE_SUMMARY_sf0.1.json
from scripts/oracle_bench.py) into the committed round artifact
BENCH_PAIRED_r{N}.json — both sides per-query plus the paired ratio.

Usage: python scripts/merge_paired.py r06
"""

from __future__ import annotations

import json
import os
import re
import sys


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    if not re.search(r"r\d+", tag):
        sys.exit(
            f"tag must contain r<digits> (e.g. r11) so the regression "
            f"gate can find the round-number predecessor; got {tag!r}"
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = json.load(open(os.path.join(here, "BENCH_SUMMARY_sf0.1.json")))
    oracle = json.load(open(os.path.join(here, "ORACLE_SUMMARY_sf0.1.json")))
    bq, oq = bench["queries"], oracle["queries"]
    names = sorted(set(bq) & set(oq))
    missing = sorted(set(bq) ^ set(oq))
    if missing:
        print(f"WARNING: one-sided queries excluded from pairing: {missing}")
    queries = {
        n: {
            "spark_s": bq[n],
            "duck_s": oq[n],
            "ratio": round(bq[n] / oq[n], 3) if oq[n] else None,
        }
        for n in names
    }
    spark_total = round(sum(bq[n] for n in names), 3)
    duck_total = round(sum(oq[n] for n in names), 3)
    out = {
        "metric": "paired_inventory_ab",
        "sf": bench.get("sf", 0.1),
        "protocol": (
            "bench.py then scripts/oracle_bench.py back-to-back, same "
            "host, idle, as the LAST preship step"
        ),
        "n_queries": len(names),
        "spark_total_s": spark_total,
        "duck_total_s": duck_total,
        "paired_ratio": round(spark_total / duck_total, 3),
        # host-speed thermometer from the oracle run (median of 5 draws
        # of a pinned DuckDB workload): the cross-round regression gate
        # normalizes spark-wall movements by the ratio of the two
        # rounds' calibrations, so ambient host drift doesn't read as
        # an engine regression (or mask one)
        "host_calibration_s": oracle.get("calibration_s"),
        "spark_inventory_wall_s": round(bench["value"], 3)
        if "value" in bench
        else spark_total,
        "duck_inventory_wall_s": round(oracle["value"], 3)
        if "value" in oracle
        else duck_total,
        "queries": queries,
    }
    path = os.path.join(here, f"BENCH_PAIRED_{tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(
        f"wrote {path}: {len(names)} queries, spark {spark_total}s "
        f"vs duck {duck_total}s = {out['paired_ratio']}x"
    )

    # cross-run regression gate: fail the merge (the artifact stays on
    # disk for diagnosis) if any query's paired ratio worsened >1.5x vs
    # the round-number predecessor without a NOTES waiver — see
    # scripts/regression_gate.py for thresholds and the waiver syntax.
    # The JUST-WRITTEN artifact is passed explicitly as NEW and its
    # round-number predecessor as OLD: newest-two auto-selection would
    # gate the wrong pair when an older round tag is re-merged while a
    # newer artifact exists on disk.
    from regression_gate import _paired_artifacts, main as gate

    this_round = int(re.search(r"r(\d+)", tag).group(1))
    older = [
        p
        for p in _paired_artifacts()
        if (m := re.search(r"_r(\d+)\.json$", p))
        and int(m.group(1)) < this_round
    ]
    if not older:
        print("regression gate: no earlier paired artifact — skipped")
        return
    sys.argv = [sys.argv[0], path, older[-1]]
    rc = gate()
    if rc != 0:
        raise SystemExit(rc)


if __name__ == "__main__":
    main()
