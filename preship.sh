#!/usr/bin/env bash
# Pre-ship gate — run as the LAST step of every round, against the
# CURRENT /root/testdata (the generator's physical choices are not
# frozen between rounds; round 2 shipped green against stale data and
# lost 9 correctness rows + the whole bench to a parquet dtype flip).
#
#   1. full unit/parity suite at sf0.001 (fast)
#   2. oracle parity at sf0.01 — mirrors the driver's correctness gate
#   3. bench smoke at sf0.01 — proves bench.py exits 0 and emits JSON
#   4. scale-headroom smoke (10x data, sub-linear gate)
#   5. paired-regression gate over the two newest committed
#      BENCH_PAIRED artifacts (also enforced at merge_paired time,
#      where the pairing is current-round vs previous; waiver syntax
#      in scripts/regression_gate.py)
#   6. plan gate: the PLANS_r{N}.md reviewer checklist as a hard
#      signal — no CartesianProduct, no non-scalar BNLJ, selective
#      scans must push filters (waiver syntax in scripts/plan_gate.py)
#   7. notes-counts check: the round's NOTES numbers (test totals,
#      cohort sizes, bench totals) must equal the artifact-computed
#      block byte-for-byte (scripts/notes_counts.py)
#   8. work-tree hygiene: a dirty tree at round end means an artifact
#      was regenerated but not committed (the r08/r09 repeat nit)
#
# Usage: ./preship.sh          (all stages)
#        ./preship.sh quick    (stage 1 only)
set -euo pipefail
cd "$(dirname "$0")"

# the round being shipped = newest NOTES file (write NOTES_r{N}.md
# before running preship); plan_gate + the notes-counts check key off it
ROUND_TAG=$(ls NOTES_r*.md 2>/dev/null | sed -E 's/.*NOTES_r0*([0-9]+)\.md/\1/' | sort -n | tail -1)
export SPARK_GRAFT_ROUND_TAG="r${ROUND_TAG:-1}"

echo "== stage 1/8: full suite @ sf0.001 =="
python -m pytest tests/ -q

if [[ "${1:-}" == "quick" ]]; then exit 0; fi

echo "== stage 2/8: oracle parity @ sf0.01 (driver mirror) =="
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
  python -m pytest tests/test_oracle_parity.py tests/test_schema_contract.py -q

echo "== stage 3/8: bench smoke @ sf0.01 =="
# summary detail goes to /tmp: a gate SMOKE must not dirty the
# committed BENCH_SUMMARY artifact (stage 7 enforces a clean tree)
out=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
      SPARK_GRAFT_SUMMARY_DIR=/tmp python bench.py)
echo "$out" | python -c '
import json, sys
d = json.loads(sys.stdin.readline())
nq, tot, sf = len(d["queries"]), d["value"], d["sf"]
assert nq > 0, "bench emitted no per-query timings"
print(f"bench ok: {nq} queries, total {tot}s @ sf={sf}")
'
echo "== stage 4/8: scale-headroom smoke (10x data, sub-linear gate) =="
python scripts/scale_smoke.py

echo "== stage 5/8: paired-regression gate (newest two committed artifacts) =="
python scripts/regression_gate.py

echo "== stage 6/8: plan gate (bench-dominant set) =="
python scripts/plan_gate.py

echo "== stage 7/8: notes-counts check (NOTES numbers computed, not hand-copied) =="
notes_file="NOTES_r$(printf '%02d' "${ROUND_TAG:-1}").md"
if [[ -f "$notes_file" ]]; then
  python scripts/notes_counts.py --check "$notes_file"
else
  echo "no $notes_file yet — skipped (write NOTES before the final preship)"
fi

echo "== stage 8/8: work-tree hygiene (everything committed?) =="
dirty=$(git status --porcelain)
if [[ -n "$dirty" ]]; then
  echo "FAILED — uncommitted changes at round end:"
  echo "$dirty"
  exit 1
fi

echo "== preship: ALL GREEN =="
