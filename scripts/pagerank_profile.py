#!/usr/bin/env python
"""Per-round wall profile of supplier_pagerank — the evidence for the
round-10 adjudication of the one remaining `weak` flag.

Method: in ONE warm session (bench posture: SparkManager, shuffle=32,
sf0.1), run the full query at ``iters = 0..6`` and report each marginal
round cost ``wall(k) − wall(k−1)``. If the marginals for rounds 2..6
cluster at a near-constant floor that is scheduling-dominated (the
per-round compute at sf0.1 is ~24k nodes / ~330k symmetric edges —
sub-millisecond of actual arithmetic), the residual paired gap vs the
in-process DuckDB oracle is the sequential-job floor of launching
~5 dependent Spark jobs, not a plan defect.

Also sweeps the two candidate knobs the round-9 verdict named:
``checkpoint_every`` (compile-vs-job-count trade) and AQE on/off for
the loop, so the committed profile shows the knobs were MEASURED, not
assumed.

Usage: python scripts/pagerank_profile.py [sf_dir]
Prints one JSON object; paste the numbers into NOTES_r{N}.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_etl_agent_spark.core.session import SparkManager  # noqa: E402
from spark_etl_agent_spark.operators.pagerank import pagerank  # noqa: E402
from spark_etl_agent_spark.queries.base import load  # noqa: E402


def _edges(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def _run(spark, sf_dir, iters, checkpoint_every=2, aqe=None):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    if aqe is not None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    try:
        t0 = time.time()
        pr = pagerank(
            _edges(spark, sf_dir),
            iters=iters,
            symmetric=True,
            checkpoint_every=checkpoint_every,
        )
        rows = (
            pr.orderBy(F.desc("rank_micro"), "node").limit(20).collect()
        )
        wall = time.time() - t0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    spark.catalog.clearCache()
    return wall, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = SparkManager(
        app_name="pagerank-profile",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark = m.spark
    out = {"sf_dir": sf_dir, "n_rounds_headline": 6}

    _run(spark, sf_dir, 6)  # JVM/codegen warmup, discarded

    walls = {}
    for k in range(0, 7):
        walls[k] = round(_run(spark, sf_dir, k)[0], 3)
    out["wall_by_iters"] = walls
    out["marginal_round_s"] = {
        k: round(walls[k] - walls[k - 1], 3) for k in range(1, 7)
    }

    out["knob_sweep_iters6"] = {}
    for label, kwargs in [
        ("ckpt2_aqe_on", dict(checkpoint_every=2)),
        ("ckpt3_aqe_on", dict(checkpoint_every=3)),
        ("ckpt6_aqe_on", dict(checkpoint_every=6)),
        ("ckpt2_aqe_off", dict(checkpoint_every=2, aqe=False)),
        ("ckpt3_aqe_off", dict(checkpoint_every=3, aqe=False)),
        ("ckpt6_aqe_off", dict(checkpoint_every=6, aqe=False)),
    ]:
        ws = [
            round(_run(spark, sf_dir, 6, **kwargs)[0], 3) for _ in range(3)
        ]
        out["knob_sweep_iters6"][label] = ws

    # value-stability pin across knobs (determinism claim)
    base = _run(spark, sf_dir, 6)[1]
    for kwargs in (dict(checkpoint_every=3), dict(checkpoint_every=6, aqe=False)):
        alt = _run(spark, sf_dir, 6, **kwargs)[1]
        assert [r.asDict() for r in alt] == [r.asDict() for r in base]
    out["values_invariant_across_knobs"] = True

    print(json.dumps(out))
    m.stop()


if __name__ == "__main__":
    main()
