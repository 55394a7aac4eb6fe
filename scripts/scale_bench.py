#!/usr/bin/env python
"""10x scale A/B bench: the top-cost inventory queries run end-to-end
— Spark AND the DuckDB oracle — against a 10x blow-up of the bench SF,
committed as SCALE_BENCH.json.

scripts/scale_smoke.py gates per-shape sub-linearity; this script
answers the next question the 100 TB story needs: does the ≤2x-vs-
oracle bar (BASELINE.md) HOLD one order of magnitude above the bench
SF, per query, on the same host at the same moment? Both engines read
the identical blown-up parquet, so the comparison is apples-to-apples.

The blow-up reuses scale_smoke's generators (re-keyed joins, bijective
char rotations, sign-flip embeddings — fan-out stays 1:N and LSH
candidate growth stays linear; see their docstrings) and adds events
(user/event ids shifted per replica: 10x state keys, constant per-key
stream — the realistic growth direction for the streaming sinks) plus
pass-through copies of the dimension tables.

Oracle timeout: LSH-family oracles are quadratic-ish in DuckDB at 10x;
a query whose oracle exceeds ORACLE_TIMEOUT_S is recorded with
``duck: null, note: oracle_timeout`` and the ratio reported as an
upper bound — that IS a result (the Spark plan scales; the single-node
oracle does not).

Writes nothing outside /tmp except SCALE_BENCH.json in the repo root.
Usage: python scripts/scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_smoke import blow_up, blow_up_llm  # noqa: E402
from spark_etl_agent_spark.core.session import SparkManager  # noqa: E402
from spark_etl_agent_spark.core.ship import ship_package  # noqa: E402
from spark_etl_agent_spark.queries import registry  # noqa: E402
from spark_etl_agent_spark.queries.base import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOWUP = int(os.environ.get("SPARK_GRAFT_BLOWUP", "10"))
WORK = "/tmp/spark_graft_scale_bench"
ORACLE_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "600"))

# Shapes that must be in every scale gate regardless of their current
# bench rank: each is the canonical representative of a distinct
# scaling risk (iterative loop, banded LSH self-join, keyed streaming
# state, composed multi-stage pipeline, seed-pruned ladder).
ALWAYS_QUERIES = [
    "supplier_pagerank",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "ngram_jaccard_dedup",
    "lsh_band_calibration",
    "streaming_ingest_dedup_audit",
    "streaming_user_ewma",
    "corpus_build_funnel",
    "exactsubstr_spans",
    # stored-artifact index probe: cost must stay ∝ batch, not corpus
    "indexed_ingest_probe",
    # Arrow-batched python decode path: embarrassingly parallel scan,
    # the canonical mapInPandas scaling representative
    "multimodal_decode",
]

TOP_N = int(os.environ.get("SPARK_GRAFT_SCALE_TOP_N", "22"))


def top_queries() -> list:
    """The scale-gate query set, derived from the LATEST committed
    sf0.1 bench summary instead of a hand-maintained list (a static
    list silently under-covers as soon as a new query tops the cost
    table — the round-7 failure mode this replaces): the top
    ``TOP_N``-cost registry names from BENCH_SUMMARY_sf0.1.json,
    unioned with :data:`ALWAYS_QUERIES` (one canonical representative
    per distinct scaling risk), bench order preserved. Names that left
    the registry since the summary was committed are dropped loudly."""
    summary = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SUMMARY_sf0.1.json",
    )
    specs = registry()
    with open(summary) as f:
        walls = json.load(f)["queries"]
    stale = sorted(n for n in walls if n not in specs)
    if stale:
        print(f"  (bench summary names no longer in registry: {stale})",
              flush=True)
    ranked = [
        n for n, _ in sorted(walls.items(), key=lambda kv: -kv[1])
        if n in specs
    ]
    names = ranked[:TOP_N]
    names += [n for n in ALWAYS_QUERIES if n not in names]
    missing = sorted(n for n in ALWAYS_QUERIES if n not in specs)
    if missing:
        raise SystemExit(f"ALWAYS_QUERIES not in registry: {missing}")
    return names


def blow_up_events(spark, out_dir: str) -> None:
    """events replicas: per replica shift event_id and user_id, keep
    (ts, type, value) — key cardinality grows 10x while each keyed
    stream stays identical, so watermark/state-store load scales in the
    dimension real traffic grows."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    maxe = ev.agg(F.max("event_id")).collect()[0][0] + 1
    maxu = ev.agg(F.max("user_id")).collect()[0][0] + 1
    reps = spark.range(BLOWUP).select(F.col("id").alias("_rep"))
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("_rep") * maxe)
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * maxu)
        .drop("_rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )


def copy_dims(spark, out_dir: str) -> None:
    """Dimension tables pass through unchanged (dims grow slower than
    facts; the blown-up facts keep their original dim keys)."""
    done = {"lineitem", "orders", "events", "documents", "embeddings"}
    for t in TABLES:
        if t in done:
            continue
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def run_spark(spark, names) -> dict:
    out = {}
    specs = registry()
    for name in names:
        t0 = time.perf_counter()
        specs[name].spark(spark, WORK).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"  spark {name}: {out[name]:.1f}s", flush=True)
    return out


def _duck_connect():
    con = duckdb.connect()
    con.execute(
        f"SET threads={os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}"
    )
    # explicit ceiling so an oracle that cannot run at this scale fails
    # with a clean OOM record instead of taking the host down
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '100GB')}'"
    )
    for t in TABLES:
        # the blow-up writes Spark-style parquet DIRECTORIES
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{WORK}/{t}.parquet/*.parquet')"
        )
    return con


def duck_one(name: str) -> None:
    """Child-process entry: ONE oracle. An OOM at this scale poisons
    the whole process (even a fresh connection cannot allocate until
    the dying one unwinds), so each oracle gets its own process and a
    failure is a recorded result, not a crashed artifact."""
    con = _duck_connect()
    timer = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        con.execute(registry()[name].oracle).fetchall()
        print(f"DUCK_RESULT {round(time.perf_counter() - t0, 3)}",
              flush=True)
    except duckdb.InterruptException:
        print("DUCK_RESULT timeout", flush=True)
    except duckdb.Error as e:
        print(f"DUCK_RESULT error {type(e).__name__}", flush=True)
    finally:
        timer.cancel()


def run_duck(names) -> "tuple[dict, dict]":
    """Returns (walls, causes): ``walls[name]`` is the oracle wall or
    None; for None rows ``causes[name]`` records WHY (timeout vs engine
    error vs crash) so the artifact never mislabels an OOM as a
    timeout."""
    import subprocess

    out, causes = {}, {}
    for name in names:
        env = dict(os.environ, SPARK_GRAFT_SCALE_DUCK_ONE=name)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=ORACLE_TIMEOUT_S + 120,
            )
        except subprocess.TimeoutExpired:
            out[name] = None
            causes[name] = f"oracle_killed>{ORACLE_TIMEOUT_S}s"
            print(f"  duck  {name}: KILLED >{ORACLE_TIMEOUT_S}s", flush=True)
            continue
        token = None
        for line in proc.stdout.splitlines():
            if line.startswith("DUCK_RESULT "):
                token = line.split(" ", 2)[1]
        if token is None:  # crashed before reporting (e.g. hard OOM)
            out[name] = None
            causes[name] = f"oracle_crashed rc={proc.returncode}"
            print(f"  duck  {name}: CRASHED (rc={proc.returncode})",
                  flush=True)
        elif token in ("timeout",):
            out[name] = None
            causes[name] = f"oracle_timeout>{ORACLE_TIMEOUT_S}s"
            print(f"  duck  {name}: TIMEOUT >{ORACLE_TIMEOUT_S}s", flush=True)
        elif token == "error":
            out[name] = None
            causes[name] = "oracle_engine_error"
            print(f"  duck  {name}: FAILED (engine error — see child)",
                  flush=True)
        else:
            out[name] = float(token)
            print(f"  duck  {name}: {out[name]:.1f}s", flush=True)
    return out, causes


def main() -> None:
    one = os.environ.get("SPARK_GRAFT_SCALE_DUCK_ONE")
    if one:
        duck_one(one)
        return
    names = [
        n
        for n in (
            os.environ.get("SPARK_GRAFT_SCALE_QUERIES", "").split(",")
            if os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
            else top_queries()
        )
        if n
    ]
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    m = SparkManager(
        app_name="scale-bench",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_SMOKE_DRIVER_MEM", "12g"
            )
        },
    )
    spark = m.spark
    ship_package(spark)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    print(f"building {BLOWUP}x blow-up of {SF_DIR} …", flush=True)
    blow_up(spark, WORK)
    blow_up_llm(spark, WORK)
    blow_up_events(spark, WORK)
    copy_dims(spark, WORK)

    # two passes: the first absorbs JVM/codegen/page-cache warmup that
    # bench.py's 145-query pipelined loop amortizes naturally; the warm
    # pass is the comparable per-query figure (DuckDB has no JVM floor
    # and reads the same now-cached files once)
    print("spark cold pass:", flush=True)
    t0 = time.perf_counter()
    sp_cold = run_spark(spark, names)
    spark_cold_wall = round(time.perf_counter() - t0, 3)
    print("spark warm pass:", flush=True)
    t0 = time.perf_counter()
    sp = run_spark(spark, names)
    spark_wall = round(time.perf_counter() - t0, 3)
    print("duckdb pass:", flush=True)
    t0 = time.perf_counter()
    du, causes = run_duck(names)
    duck_wall = round(time.perf_counter() - t0, 3)

    queries = {}
    for n in names:
        d = du[n]
        entry = {"spark_s": sp[n], "spark_cold_s": sp_cold[n], "duck_s": d}
        if d is None:
            entry["note"] = causes[n]
            # an upper bound on the ratio is only sound for timeouts
            # (the oracle provably ran >= the timeout); an engine
            # error/crash says nothing about the oracle's wall
            if "timeout" in causes[n] or "killed" in causes[n]:
                entry["ratio_upper_bound"] = round(
                    sp[n] / ORACLE_TIMEOUT_S, 3
                )
        else:
            entry["ratio"] = round(sp[n] / d, 3) if d > 0 else None
        queries[n] = entry

    paired = [n for n in names if du[n] is not None]
    result = {
        "metric": "scale_ab_topcost",
        "sf_base": SF_DIR,
        "blowup": BLOWUP,
        "oracle_timeout_s": ORACLE_TIMEOUT_S,
        "n_queries": len(names),
        "spark_total_s": spark_wall,
        "spark_cold_total_s": spark_cold_wall,
        "duck_total_s": duck_wall,
        "paired_spark_s": round(sum(sp[n] for n in paired), 3),
        "paired_duck_s": round(sum(du[n] for n in paired), 3),
        "paired_ratio": round(
            sum(sp[n] for n in paired) / max(sum(du[n] for n in paired), 1e-9),
            3,
        ),
        "queries": queries,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_BENCH.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    m.stop()


if __name__ == "__main__":
    main()
