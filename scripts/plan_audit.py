#!/usr/bin/env python
"""Plan-audit artifact generator: dump ``explain('formatted')`` for a
named set of queries (default: the bench's most expensive + the
round's new shapes) into ``PLANS_r{N}.md`` so the per-round plan
review starts from committed evidence instead of re-deriving it.

Usage: python scripts/plan_audit.py [round_tag] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from spark_etl_agent_spark.core.session import SparkManager  # noqa: E402
from spark_etl_agent_spark.core.ship import ship_package  # noqa: E402
from spark_etl_agent_spark.queries import registry  # noqa: E402

def _default_queries() -> list:
    """Single source of truth: the plan GATE's bench-dominant selection
    (top-cost bench names + always-on scale-critical shapes, streaming
    / execute-on-build surfaces excluded) — the committed PLANS_r{N}.md
    is exactly the set scripts/plan_gate.py adjudicates."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from plan_gate import _gate_set

    return _gate_set(registry())


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    names = sys.argv[2:] or _default_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = SparkManager(
        app_name="plan-audit",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark = m.spark
    ship_package(spark)
    specs = registry()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, f"PLANS_{tag}.md")
    with open(out_path, "w") as out:
        out.write(
            f"# Plan audit ({tag}, {sf_dir}, shuffle=32)\n\n"
            "`explain('formatted')` of the bench-dominant and"
            " newly-added queries — regenerate with"
            " `python scripts/plan_audit.py`.\n"
            "Reviewer checklist per plan: scans carry PushedFilters +"
            " pruned ReadSchema; joins are broadcast or equi"
            " (no CartesianProduct); Exchanges only on intended keys;"
            " WholeStageCodegen spans cover the hot projections.\n"
        )
        for name in names:
            spec = specs.get(name)
            if spec is None:
                continue
            df = spec.spark(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out.write(f"\n## {name}\n\n```\n{buf.getvalue()}\n```\n")
            print(f"{name}: done")
    print(f"wrote {out_path}")
    m.stop()


if __name__ == "__main__":
    main()
