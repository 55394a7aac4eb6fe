#!/usr/bin/env python
"""Automated plan-audit gate (round-9 verdict ask #3): the reviewer
checklist at the top of every PLANS_r{N}.md becomes a hard preship
signal instead of an eyeball pass.

Over the bench-dominant query set (the top-cost names from the
committed ``BENCH_SUMMARY_sf0.1.json`` plus an always-on list of
scale-critical shapes), build each query's DataFrame and parse its
``explain('formatted')`` text. FAIL on:

1. ``CartesianProduct`` anywhere — an all-pairs shape is never
   acceptable at scale;
2. a ``BroadcastNestedLoopJoin`` without a matching
   ``IdentityBroadcastMode`` build side — the only sanctioned BNLJ is
   the one-row scalar attach (count heuristic: every Identity
   broadcast in our plans feeds exactly one BNLJ, so #BNLJ must not
   exceed #IdentityBroadcastMode);
3. a query on the SELECTIVE list (declares a selective scan predicate)
   none of whose scans carries a non-empty ``PushedFilters`` — a
   filter that misses the parquet scan re-reads the whole table.

Streaming/foreachBatch surfaces and execute-on-build probes (their
returned frame is a materialized audit envelope whose explain is a
bare RDD scan) are gated through a SECOND pass (r10 verdict ask #5):
the gate runs each such query and pulls every SQL execution it
produced — micro-batch sink interiors included — from the session's
SQL status store (``sharedState().statusStore().executionsList()``,
each entry carrying the executed ``physicalPlanDescription``), then
applies the same CartesianProduct and non-Identity-BNLJ checks to
every interior plan. (The PushedFilters check stays per-declared-name
via SELECTIVE; none of the streaming probes declares a selective
plain-column scan — their interior scans read per-call scratch
tables.)

Waiver path (same shape as the regression gate): a line in the
round's ``NOTES_r{N}.md``:

    PLAN-WAIVER: <query_name> — <one-line reason>

Usage:
    python scripts/plan_gate.py [round_tag]    # e.g. r10; default:
                                               # newest CORRECTNESS+1
Exit 0 = all gated plans clean; exit 1 = gate failed.
"""

from __future__ import annotations

import glob
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOP_N = 15

# scale-critical shapes gated every round regardless of bench rank
ALWAYS = [
    "supplier_pagerank",
    "ngram_jaccard_dedup",
    "simhash_near_duplicates",
    "minhash_near_duplicates",
    "semantic_dedup_embeddings",
    "dedup_family_agreement",
    "lsh_band_calibration",
    "corpus_build_funnel",
    "multimodal_decode",
    "bloom_ingest_dedup",
    "incremental_neardup_probe",
    "pricing_summary",
    "jcap_pa_extract",
]

# declares a selective PLAIN-COLUMN predicate -> a scan MUST carry
# PushedFilters (expression predicates like UPPER(col) IN (...) are
# inherently not parquet-pushable and don't belong here)
SELECTIVE = {
    "pricing_summary",      # l_shipdate <= bound
    "jcap_pa_extract",      # date-range + equality-flag filters
    "forecast_revenue",     # date-range + discount band
}

# foreachBatch surfaces and execute-on-build probes returning
# materialized audit frames (explain = bare RDD scan, so the returned
# frame is ungateable) — gated through the status-store INTERIORS pass
# below instead
EXCLUDE_TAGS = {"streaming"}
EXCLUDE_NAMES = {
    "corpus_release_e2e",
    "cdc_apply_orders",
    "partition_pruning_probe",
    "compact_small_files_audit",
    "ingest_compaction_probe",
    "indexed_ingest_probe",
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _current_tag() -> str:
    """The round whose NOTES file scopes PLAN-WAIVER lines.

    Derived from the newest existing NOTES_r*.md — NOT from the newest
    CORRECTNESS artifact + 1: preship stage 7 requires a clean tree,
    so once a round's CORRECTNESS_r{N}.json is committed the +1 rule
    would jump to r{N+1} and silently ignore the CURRENT round's
    waivers (the gate would fail a shape its own NOTES waived). An
    explicit SPARK_GRAFT_ROUND_TAG env var overrides (preship may pin
    the round it is shipping)."""
    env = os.environ.get("SPARK_GRAFT_ROUND_TAG")
    if env:
        if not re.fullmatch(r"r\d+", env):
            raise SystemExit(
                f"SPARK_GRAFT_ROUND_TAG must look like r11, got {env!r}"
            )
        return f"r{int(env[1:]):02d}"
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(_repo_root(), "NOTES_r*.md"))
        if (m := re.search(r"r(\d+)\.md$", p))
    ]
    return f"r{(max(rounds) if rounds else 1):02d}"


def _waivers(tag: str) -> dict:
    out = {}
    notes = os.path.join(_repo_root(), f"NOTES_{tag}.md")
    if not os.path.exists(notes):
        return out
    with open(notes) as f:
        for line in f:
            m = re.match(r"\s*PLAN-WAIVER:\s*(\S+)\s*(.*)", line)
            if m:
                out[m.group(1)] = line.strip()
    return out


def _gate_set(registry) -> list:
    names = list(ALWAYS) + sorted(SELECTIVE)
    summary = os.path.join(_repo_root(), "BENCH_SUMMARY_sf0.1.json")
    if os.path.exists(summary):
        ranked = sorted(
            json.load(open(summary))["queries"].items(),
            key=lambda kv: -kv[1],
        )
        names += [n for n, _ in ranked[:TOP_N]]
    seen, out = set(), []
    for n in names:
        spec = registry.get(n)
        if n in seen or spec is None or n in EXCLUDE_NAMES:
            continue
        if EXCLUDE_TAGS & set(spec.tags):
            continue
        seen.add(n)
        out.append(n)
    return out


def _plan_texts(df) -> tuple:
    """(tree, formatted): the executed-plan TREE (AQE initial plan —
    every broadcast exchange literal with its mode, no static reuse
    collapsing, so #BNLJ vs #IdentityBroadcastMode counts pair up) and
    the FORMATTED explain (scan details print PushedFilters in full;
    the tree's FileScan one-liner truncates long metadata)."""
    tree = df._jdf.queryExecution().executedPlan().toString()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return tree, buf.getvalue()


def _check(name: str, tree: str, formatted: str) -> list:
    problems = []
    if "CartesianProduct" in tree:
        problems.append("CartesianProduct in plan")
    n_bnlj = tree.count("BroadcastNestedLoopJoin")
    n_identity = tree.count("IdentityBroadcastMode")
    if n_bnlj > n_identity:
        problems.append(
            f"{n_bnlj} BroadcastNestedLoopJoin vs {n_identity} "
            "IdentityBroadcastMode build(s) — a non-scalar BNLJ"
        )
    if name in SELECTIVE:
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
        if not any(p.strip() for p in pushed):
            problems.append(
                "declares a selective predicate but no scan carries a "
                "non-empty PushedFilters"
            )
    return problems


def _check_interior(desc: str) -> list:
    """The CartesianProduct / non-Identity-BNLJ checks over one
    executed plan description from the SQL status store. Under AQE the
    description prints both the initial and final plans — presence
    checks are unaffected, and the BNLJ-vs-Identity count inequality is
    preserved section-by-section (an Identity scalar attach is never
    replanned into anything else)."""
    problems = []
    if "CartesianProduct" in desc:
        problems.append("CartesianProduct in executed plan")
    n_bnlj = desc.count("BroadcastNestedLoopJoin")
    n_identity = desc.count("IdentityBroadcastMode")
    if n_bnlj > n_identity:
        problems.append(
            f"{n_bnlj} BroadcastNestedLoopJoin vs {n_identity} "
            "IdentityBroadcastMode build(s) — a non-scalar BNLJ"
        )
    return problems


def _interior_names(registry) -> list:
    names = {n for n, s in registry.items() if EXCLUDE_TAGS & set(s.tags)}
    names |= {n for n in EXCLUDE_NAMES if n in registry}
    return sorted(names)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else _current_tag()
    from spark_etl_agent_spark.core.session import SparkManager
    from spark_etl_agent_spark.core.ship import ship_package
    from spark_etl_agent_spark.queries import registry

    sf_dir = os.environ.get(
        "SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.01"
    )
    reg = registry()
    names = _gate_set(reg)
    waivers = _waivers(tag)

    m = SparkManager(
        app_name="plan-gate",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark = m.spark
    ship_package(spark)
    flagged, waived = [], []
    n_interior_plans = 0
    stream_names = _interior_names(reg)
    try:
        for name in names:
            df = reg[name].spark(spark, sf_dir)
            tree, formatted = _plan_texts(df)
            for p in _check(name, tree, formatted):
                row = f"{name}: {p}"
                (waived if name in waivers else flagged).append(row)
            spark.catalog.clearCache()

        # INTERIORS pass: run each streaming/execute-on-build probe and
        # gate every SQL execution it produced (micro-batch foreachBatch
        # bodies, maintenance rewrites, staging writes) via the status
        # store's executed plan descriptions.
        store = spark._jsparkSession.sharedState().statusStore()
        for name in stream_names:
            base_n = store.executionsList().size()
            df = reg[name].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            lst = store.executionsList()
            for i in range(base_n, lst.size()):
                ex = lst.apply(i)
                n_interior_plans += 1
                for p in _check_interior(ex.physicalPlanDescription()):
                    row = f"{name} [interior execution {i - base_n}]: {p}"
                    (waived if name in waivers else flagged).append(row)
            spark.catalog.clearCache()
    finally:
        m.stop()

    print(
        f"plan gate ({tag}, {sf_dir}): {len(names)} plans audited; "
        f"{len(stream_names)} streaming/execute-on-build probes gated "
        f"over {n_interior_plans} interior executions"
    )
    for row in waived:
        print(f"  WAIVED  {row}")
    if flagged:
        print(f"  FAILED — {len(flagged)} plan defect(s):")
        for row in flagged:
            print(f"  DEFECT  {row}")
        print(
            "  waive an adjudicated shape with a line in the round's "
            "NOTES_r{N}.md:  PLAN-WAIVER: <query> — <reason>"
        )
        return 1
    print("  ok — no cartesian products, no non-scalar BNLJs, "
          "selective scans all push filters")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
