"""Multimodal binary-column inventory (north-star extension). The
payload is a real BinaryType column holding REAL binary formats —
stdlib-encoded PNG and RIFF/WAVE files — and the decode queries
genuinely parse them back (signature, CRC, IDAT inflate, chunk walk;
``llm/multimodal.py``). Payload dimensions derive from doc-id
arithmetic so the DuckDB oracle predicts the decoded values without a
codec: a broken encoder or parser fails CRC/inflate checks or
mismatches the oracle, not just an echo comparison."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm import multimodal as M
from .base import QuerySpec, fan_out, load


def multimodal_decode(spark, sf_dir):
    """Real PNG round-trip: synthesize a valid PNG per document →
    Arrow-batched parse (signature + IHDR + CRCs + full IDAT inflate)."""
    return M.decode_png_metadata(
        M.attach_png_payload(fan_out(load(spark, sf_dir, "documents")))
    )


MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
  CAST(1 + doc_id % 64 AS INT) AS width,
  CAST(1 + (doc_id * 7) % 48 AS INT) AS height,
  CAST(8 AS INT) AS bit_depth,
  CAST(0 AS INT) AS color_type,
  TRUE AS pixels_ok
FROM documents
"""


def multimodal_wav_decode(spark, sf_dir):
    """Real WAV round-trip: synthesize a valid RIFF/WAVE PCM file per
    document → Arrow-batched chunk-walk parse (rate/channels/bits/
    samples/duration)."""
    return M.decode_wav_metadata(
        M.attach_wav_payload(fan_out(load(spark, sf_dir, "documents")))
    )


MULTIMODAL_WAV_DECODE_SQL = """
SELECT doc_id,
  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
  CAST(1 + doc_id % 2 AS INT) AS n_channels,
  CAST(16 AS INT) AS bits_per_sample,
  CAST(100 + doc_id % 50 AS INT) AS n_samples,
  (100 + doc_id % 50) * 1000.0 / (8000 + (doc_id % 8) * 1000) AS duration_ms
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
        "Real PNG encode/parse round-trip via Arrow-batched mapInPandas",
        ("multimodal", "llm", "pandas-udf"),
    ),
    "multimodal_wav_decode": QuerySpec(
        "multimodal_wav_decode", multimodal_wav_decode,
        MULTIMODAL_WAV_DECODE_SQL,
        "Real RIFF/WAVE encode/parse round-trip (rate/channels/duration)",
        ("multimodal", "llm", "pandas-udf"),
    ),
    "multimodal_source_stats": QuerySpec(
        "multimodal_source_stats", multimodal_source_stats,
        MULTIMODAL_SOURCE_STATS_SQL,
        "Per-source byte accounting over the binary column",
        ("multimodal", "llm", "agg"),
    ),
}
