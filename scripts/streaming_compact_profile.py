#!/usr/bin/env python
"""Floor decomposition for ``streaming_compaction_probe`` (r10 verdict
ask #3: the most expensive bench query at 8.47 s driver / 5.94 s
paired). Splits the probe's wall into:

- ``stage_s``      — writing the 3 single-file source micro-batches
- ``machinery_s``  — Structured Streaming overhead (offset/commit log,
                     micro-batch planning): stream wall minus the time
                     spent inside the foreachBatch sink bodies
- per batch:
  - ``probe_s``     — artifact derivation + exact/LSH dedup probe +
                      audit counts (sink body minus write and maint)
  - ``write_s``     — the 6-way fan-out append of novel rows
  - ``maint_s``     — the threshold-gated mid-stream compaction rewrite

Run on an idle host:  python scripts/streaming_compact_profile.py
Prints one JSON line; repeat runs show the warm floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_etl_agent_spark.core.session import SparkManager
    from spark_etl_agent_spark.core.ship import ship_package

    manager = SparkManager(
        app_name="streaming-compact-profile",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE", "8")
        ),
    )
    spark = manager.spark
    ship_package(spark)
    # warm the JVM/codegen/worker fleet the same way bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").write.format(
        "noop"
    ).mode("overwrite").save()

    from spark_etl_agent_spark.core.scratch import scratch_dir
    from spark_etl_agent_spark.jobs.ingest import CorpusIngestService
    from spark_etl_agent_spark.queries.base import load
    from spark_etl_agent_spark.queries.streaming_sinks import _stage_batches
    from spark_etl_agent_spark.sources.catalog import Catalog
    from spark_etl_agent_spark.streaming.pipeline import (
        run_available_now,
        streaming_dedup_ingest_sink_indexed,
    )

    runs = []
    for run_i in range(int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))):
        t_all0 = time.perf_counter()
        docs = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 4 == 1)
            .select("doc_id", "text")
        )
        work = scratch_dir("spark_graft_stream_compact_prof_")
        t0 = time.perf_counter()
        src = _stage_batches(
            [
                docs.filter(F.expr("(doc_id div 4) % 3") == i)
                for i in range(3)
            ],
            work,
        )
        stage_s = time.perf_counter() - t0
        cat = Catalog(spark, work)
        svc = CorpusIngestService(
            cat,
            accepted_table="accepted",
            compact_threshold_files=4,
            compact_target_file_mb=128,
        )
        body: list = []  # (batch_id, enter, exit)
        writes: list = []
        maints: list = []

        def novel_writer(df, batch_id):
            w0 = time.perf_counter()
            cat.write_table(df.repartition(6), "accepted", mode="append")
            writes.append(time.perf_counter() - w0)

        def batch_maintenance(batch_id):
            if batch_id >= 2:  # mirror the query: final epilogue is
                maints.append(0.0)  # not mid-stream, nothing probes it
                return
            m0 = time.perf_counter()
            svc.run_index_maintenance()
            maints.append(time.perf_counter() - m0)

        audit: list = []
        inner = streaming_dedup_ingest_sink_indexed(
            svc._index_provider,
            novel_writer,
            audit=audit,
            min_jaccard=0.6,
            maintenance=batch_maintenance,
        )

        def timed_sink(df, batch_id):
            b0 = time.perf_counter()
            inner(df, batch_id)
            body.append((batch_id, b0, time.perf_counter()))

        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        s0 = time.perf_counter()
        run_available_now(
            stream, output_mode="append", foreach_batch=timed_sink
        )
        stream_s = time.perf_counter() - s0
        total_s = time.perf_counter() - t_all0
        body_s = sum(e - b for _, b, e in body)
        probe_s = [
            round(e - b - w - m, 3)
            for (_, b, e), w, m in zip(body, writes, maints)
        ]
        runs.append(
            {
                "total_s": round(total_s, 3),
                "stage_s": round(stage_s, 3),
                "stream_s": round(stream_s, 3),
                "machinery_s": round(stream_s - body_s, 3),
                "probe_s": probe_s,
                "write_s": [round(w, 3) for w in writes],
                "maint_s": [round(m, 3) for m in maints],
                "n_batches": len(body),
                "audit": audit,
            }
        )
    print(json.dumps({"runs": runs}, separators=(",", ":")))
    manager.stop()


if __name__ == "__main__":
    main()
