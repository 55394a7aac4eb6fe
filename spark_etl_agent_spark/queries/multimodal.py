"""Multimodal binary-column inventory (north-star extension). The
payload is a real BinaryType column (utf-8 bytes standing in for
image/audio — codecs aren't in this container, SURVEY.md §7.2 M5); the
Arrow-batched ``mapInPandas`` decode plumbing is real and oracled on
its deterministic stub output."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import multimodal as M
from .base import QuerySpec, fan_out, load


def multimodal_decode(spark, sf_dir):
    """Binary payload → mapInPandas decode (deterministic stub
    dimensions) — exercises schema, Arrow batching, partition
    parallelism end-to-end."""
    return M.decode_metadata(M.attach_payload(fan_out(load(spark, sf_dir, "documents"))))


MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_hash,
  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
  CAST(octet_length(encode(text)) % 16 AS INT) AS n_frames
FROM documents
"""


def multimodal_source_stats(spark, sf_dir):
    """Per-source byte accounting over the binary column (the
    partition-planning query you run before a 100 TB decode pass)."""
    df = M.attach_payload(load(spark, sf_dir, "documents"))
    return df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


MULTIMODAL_SOURCE_STATS_SQL = """
SELECT source, count(*) AS n_docs,
  CAST(sum(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
  max(CAST(octet_length(encode(text)) AS BIGINT)) AS max_bytes
FROM documents GROUP BY source
"""


QUERIES = {
    "multimodal_decode": QuerySpec(
        "multimodal_decode", multimodal_decode, MULTIMODAL_DECODE_SQL,
        "Binary payload + Arrow-batched mapInPandas decode (stub codec)",
        ("multimodal", "llm", "pandas-udf"),
    ),
    "multimodal_source_stats": QuerySpec(
        "multimodal_source_stats", multimodal_source_stats,
        MULTIMODAL_SOURCE_STATS_SQL,
        "Per-source byte accounting over the binary column",
        ("multimodal", "llm", "agg"),
    ),
}
