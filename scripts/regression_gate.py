#!/usr/bin/env python
"""Cross-run per-query regression gate over the committed paired A/B
artifacts (BENCH_PAIRED_r{N}.json).

The judge's eyeball pass over per-round regressions becomes a hard
signal: comparing the NEWEST paired artifact against the previous
committed one, the gate FAILS if any query's paired ratio
(spark_s / duck_s) worsened by more than ``RATIO_WORSEN`` (default
1.5×) — unless the round's NOTES file carries an explicit waiver line.

Noise guards (all must hold for a flag, so sub-second jitter and
oracle-floor shapes don't page anyone):
  - the query's NEW spark wall exceeds ``MIN_SPARK_S`` (default 1.0 s);
  - the NEW ratio exceeds ``MIN_RATIO`` (default 2.0) — a query that
    "regressed" from 0.05× to 0.1× still leads the oracle 10×;
  - millisecond-oracle floor shapes (old ``duck_s`` below
    ``DUCK_FLOOR_S``, default 0.05 s — e.g. a real-decode query whose
    oracle is a trivial analytic restatement) are judged on their
    SPARK wall instead: flag only when it worsens by more than
    ``WALL_WORSEN`` (default 2×), since a 3 ms denominator turns host
    jitter into a triple-digit "ratio regression";
  - the SPARK wall itself must have moved (> ``MIN_WALL_MOVE``,
    default 1.15×) — a ratio that worsened purely because the ORACLE
    side ran faster this round is denominator noise, not an engine
    regression (first caught live on corpus_select_budget: spark
    1.05 s → 1.08 s, duck 0.40 s → 0.18 s, "2.3× worse").

Waiver path (documented, auditable): add to the current round's
``NOTES_r{N}.md`` a line

    REGRESSION-WAIVER: <query_name> — <one-line reason>

The gate prints which flags were waived and by which file; a waiver
without a reason string after the name still works but reads badly in
review — write the reason.

Usage:
    python scripts/regression_gate.py                 # newest vs previous
    python scripts/regression_gate.py NEW.json OLD.json
Exit 0 = no unwaived regressions; exit 1 = gate failed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

RATIO_WORSEN = float(os.environ.get("SPARK_GRAFT_REGRESS_WORSEN", "1.5"))
MIN_SPARK_S = float(os.environ.get("SPARK_GRAFT_REGRESS_MIN_SPARK", "1.0"))
MIN_RATIO = float(os.environ.get("SPARK_GRAFT_REGRESS_MIN_RATIO", "2.0"))
DUCK_FLOOR_S = float(os.environ.get("SPARK_GRAFT_REGRESS_DUCK_FLOOR", "0.05"))
WALL_WORSEN = float(os.environ.get("SPARK_GRAFT_REGRESS_WALL_WORSEN", "2.0"))
MIN_WALL_MOVE = float(os.environ.get("SPARK_GRAFT_REGRESS_MIN_WALL_MOVE", "1.15"))


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _paired_artifacts() -> list:
    files = glob.glob(os.path.join(_repo_root(), "BENCH_PAIRED_r*.json"))

    def key(p):
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(files, key=key)


def _waivers(new_path: str) -> dict:
    """Map waived query name -> (notes file, reason line).

    Scoped to the NOTES file of the round being gated (parsed from the
    NEW artifact's ``_r{N}`` tag): a waiver is a one-round adjudication
    of one specific artifact pairing, not a permanent exemption.
    Globbing every past NOTES_r*.md would let any historical waiver
    silently disable the gate for that query forever."""
    out = {}
    m = re.search(r"_r(\d+)\.json$", os.path.basename(new_path))
    if not m:
        return out
    notes = os.path.join(_repo_root(), f"NOTES_r{int(m.group(1)):02d}.md")
    if not os.path.exists(notes):
        return out
    with open(notes) as f:
        for line in f:
            wm = re.match(r"\s*REGRESSION-WAIVER:\s*(\S+)\s*(.*)", line)
            if wm:
                out[wm.group(1)] = (os.path.basename(notes), line.strip())
    return out


def main() -> int:
    if len(sys.argv) >= 3:
        new_path, old_path = sys.argv[1], sys.argv[2]
    else:
        arts = _paired_artifacts()
        if len(arts) < 2:
            print(
                "regression gate: fewer than two committed BENCH_PAIRED "
                "artifacts — nothing to compare, pass"
            )
            return 0
        new_path, old_path = arts[-1], arts[-2]

    new_doc = json.load(open(new_path))
    old_doc = json.load(open(old_path))
    new, old = new_doc["queries"], old_doc["queries"]
    waivers = _waivers(new_path)

    # Host-drift normalization (r10 ask #8): both artifacts may carry a
    # pinned-workload DuckDB calibration (host_calibration_s). The
    # spark-WALL checks scale the old wall by the host-speed ratio, so
    # a 20% slower host doesn't read as a 20% engine regression (and a
    # 20% faster one doesn't mask a real slowdown). Ratio checks stay
    # unnormalized — both engines drift together in a paired run.
    # Clamped to [0.5, 2]: a calibration that claims >2x host movement
    # is itself suspect and must not silently neutralize the gate.
    cal_new = new_doc.get("host_calibration_s")
    cal_old = old_doc.get("host_calibration_s")
    host_factor = 1.0
    if cal_new and cal_old:
        host_factor = max(0.5, min(2.0, float(cal_new) / float(cal_old)))
        print(
            f"regression gate: host calibration {cal_old}s -> {cal_new}s, "
            f"normalizing old spark walls by x{host_factor:.3f}"
        )

    flagged, waived = [], []
    for name in sorted(set(new) & set(old)):
        nr, orr = new[name].get("ratio"), old[name].get("ratio")
        ns = new[name].get("spark_s", 0.0)
        os_ = old[name].get("spark_s", 0.0)
        od = old[name].get("duck_s", 0.0)
        if nr is None or orr is None or orr <= 0:
            continue
        if ns <= MIN_SPARK_S:
            continue
        os_n = os_ * host_factor  # old wall at TODAY's host speed
        if od < DUCK_FLOOR_S:
            # oracle-floor shape: ratio denominators are milliseconds;
            # judge the spark wall itself
            if os_n > 0 and ns > WALL_WORSEN * os_n:
                row = (
                    f"{name}: spark wall {os_:.2f}s -> {ns:.2f}s "
                    f"({ns / os_n:.2f}x worse host-normalized; "
                    f"oracle-floor shape, old duck {od * 1000:.0f}ms)"
                )
            else:
                continue
        elif (
            nr > MIN_RATIO
            and nr > RATIO_WORSEN * orr
            and os_n > 0
            and ns > MIN_WALL_MOVE * os_n
        ):
            row = (
                f"{name}: ratio {orr:.2f} -> {nr:.2f} "
                f"({nr / orr:.2f}x worse; spark {os_:.2f}s -> {ns:.2f}s)"
            )
        else:
            continue
        if name in waivers:
            waived.append(f"{row}  [waived in {waivers[name][0]}]")
        else:
            flagged.append(row)

    base = (os.path.basename(new_path), os.path.basename(old_path))
    print(f"regression gate: {base[0]} vs {base[1]}")
    for row in waived:
        print(f"  WAIVED  {row}")
    if flagged:
        print(
            f"  FAILED — {len(flagged)} unwaived per-query regression(s) "
            f"(> {RATIO_WORSEN}x worse paired ratio, spark > {MIN_SPARK_S}s,"
            f" ratio > {MIN_RATIO}):"
        )
        for row in flagged:
            print(f"  REGRESSED  {row}")
        print(
            "  waive intentionally-slower queries with a line in the "
            "round's NOTES_r{N}.md:  REGRESSION-WAIVER: <query> — <reason>"
        )
        return 1
    print(
        f"  ok — no unwaived regressions across "
        f"{len(set(new) & set(old))} paired queries"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
