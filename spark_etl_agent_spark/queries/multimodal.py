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


def image_ahash_report(spark, sf_dir):
    """Perceptual image hashing over REAL decoded pixels: synthesize a
    valid PNG per document, genuinely decode it (CRC walk + inflate +
    filter strip), and compute the 8×8 integer average-hash. The
    oracle reproduces the 64-bit string analytically from the
    synthetic pixel generator (digest-tiled pixels)."""
    return M.perceptual_ahash(
        M.attach_png_payload(fan_out(load(spark, sf_dir, "documents")))
    )


IMAGE_AHASH_REPORT_SQL = """
WITH dims AS (
  SELECT doc_id, md5(text) AS hx,
    CAST(1 + doc_id % 64 AS INT) AS w,
    CAST(1 + (doc_id * 7) % 48 AS INT) AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, t.p,
    (strpos('0123456789abcdef',
            substring(hx, CAST(1 + 2 * (t.p % 16) AS INT), 1)) - 1) * 16
    + (strpos('0123456789abcdef',
              substring(hx, CAST(2 + 2 * (t.p % 16) AS INT), 1)) - 1) AS v,
    ((t.p // w) * 8 // h) * 8 + ((t.p % w) * 8 // w) AS cell
  FROM dims, range(0, 3072) t(p)
  WHERE t.p < CAST(w AS BIGINT) * h
),
cells AS (
  SELECT doc_id, cell, CAST(sum(v) AS BIGINT) // count(*) AS cv
  FROM px GROUP BY doc_id, cell
),
th AS (
  SELECT doc_id, CAST(sum(cv) AS BIGINT) // count(*) AS t
  FROM cells GROUP BY doc_id
),
grid AS (
  SELECT d.doc_id, d.w, d.h, CAST(g.i AS INT) AS i
  FROM dims d, range(0, 64) g(i)
),
bitrows AS (
  SELECT grid.doc_id, grid.w, grid.h, grid.i,
    CASE WHEN c.cv IS NOT NULL AND c.cv > th.t THEN '1' ELSE '0' END AS b
  FROM grid
  LEFT JOIN cells c ON c.doc_id = grid.doc_id AND c.cell = grid.i
  JOIN th ON th.doc_id = grid.doc_id
)
SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
  string_agg(b, '' ORDER BY i) AS ahash_bits,
  CAST(sum(CASE WHEN b = '1' THEN 1 ELSE 0 END) AS INT) AS n_set_bits
FROM bitrows GROUP BY doc_id
"""


QUERIES["image_ahash_report"] = QuerySpec(
    "image_ahash_report",
    image_ahash_report,
    IMAGE_AHASH_REPORT_SQL,
    "Perceptual 8×8 average-hash over genuinely decoded PNG pixels",
    ("multimodal", "dedup", "llm", "pandas-udf"),
)
