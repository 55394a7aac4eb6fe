#!/usr/bin/env python
"""Computed NOTES numbers (r10 verdict ask #7: test totals and cohort
sizes drifted twice when hand-copied — emit them from the artifacts
instead, and let preship verify the committed NOTES carries them
byte-for-byte).

Modes:
    python scripts/notes_counts.py            # print the block
    python scripts/notes_counts.py --check NOTES_r11.md
        # extract the block between the BEGIN/END markers in the NOTES
        # file and fail unless it equals the freshly computed block

The block is bounded by literal marker lines so the check is exact:

    <!-- BEGIN COMPUTED COUNTS (scripts/notes_counts.py) -->
    ...
    <!-- END COMPUTED COUNTS -->
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

BEGIN = "<!-- BEGIN COMPUTED COUNTS (scripts/notes_counts.py) -->"
END = "<!-- END COMPUTED COUNTS -->"


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pytest_collected() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=_repo_root(),
        capture_output=True,
        text=True,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise SystemExit(
            f"could not parse pytest collection output:\n{out.stdout[-500:]}"
        )
    return int(m.group(1))


def _green_latest() -> dict:
    latest = {}
    for p in glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)\.json$", p).group(1))
        for name, row in json.load(open(p)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and not row.get("err")
            ):
                latest[name] = max(latest.get(name, 0), r)
    return latest


def _hist(latest: dict) -> str:
    from collections import Counter

    c = Counter(latest.values())
    return " ".join(f"r{k:02d}:{c[k]}" for k in sorted(c))


def compute_block() -> str:
    sys.path.insert(0, _repo_root())
    from spark_etl_agent_spark.queries import registry
    from spark_etl_agent_spark.queries.base import (
        DRIVER_WINDOW,
        DRIVER_WINDOW_ROUND,
    )

    inv = registry()
    latest = _green_latest()
    window = list(DRIVER_WINDOW)
    # window composition vs the committed artifacts
    from collections import Counter

    comp = Counter(latest.get(n, 0) for n in window)
    comp_s = " ".join(
        (f"r{k:02d}:{comp[k]}" if k else f"new:{comp[k]}")
        for k in sorted(comp)
    )
    predicted = dict(latest)
    for n in window:
        predicted[n] = DRIVER_WINDOW_ROUND

    lines = [
        BEGIN,
        f"- pytest collected: {_pytest_collected()} tests",
        f"- registry inventory: {len(inv)} queries; driver window: "
        f"{len(window)} (round {DRIVER_WINDOW_ROUND})",
        f"- window composition by current green-latest round: {comp_s}",
        f"- green-latest histogram BEFORE this round: {_hist(latest)}",
        f"- predicted histogram AFTER this round (window all green): "
        f"{_hist(predicted)}",
    ]
    bench = os.path.join(_repo_root(), "BENCH_SUMMARY_sf0.1.json")
    if os.path.exists(bench):
        b = json.load(open(bench))
        lines.append(
            f"- bench (BENCH_SUMMARY_sf0.1.json): {b['value']} s over "
            f"{b['n_queries']} queries"
        )
    paired = sorted(
        glob.glob(os.path.join(_repo_root(), "BENCH_PAIRED_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if paired:
        d = json.load(open(paired[-1]))
        lines.append(
            f"- paired ({os.path.basename(paired[-1])}): spark "
            f"{d['spark_total_s']} s vs duck {d['duck_total_s']} s = "
            f"{d['paired_ratio']}x over {d['n_queries']} queries"
        )
    lines.append(END)
    return "\n".join(lines)


def main() -> int:
    block = compute_block()
    if len(sys.argv) > 2 and sys.argv[1] == "--check":
        notes = os.path.join(_repo_root(), sys.argv[2])
        text = open(notes).read()
        if BEGIN not in text or END not in text:
            print(f"notes-counts: {sys.argv[2]} has no computed block")
            return 1
        embedded = text[text.index(BEGIN): text.index(END) + len(END)]
        if embedded != block:
            print("notes-counts: MISMATCH — committed block differs from "
                  "artifacts. Computed:")
            print(block)
            print("Committed:")
            print(embedded)
            return 1
        print(f"notes-counts: {sys.argv[2]} block matches artifacts")
        return 0
    print(block)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
