"""Multimodal column handling: opaque binary payloads + typed metadata.

Testdata has no true image/audio bytes and the decode libraries are not
in this container, so the *decode* step is stubbed (deterministic fake
dimensions, or ``NotImplementedError`` when a real decode is requested —
clearly marked). Everything Spark-side is real and tested: the binary
column, the Arrow-batched ``mapInPandas`` operator shape, its output
schema, and the partition-parallel execution.

At 100 TB: payloads stay in executor-local Arrow batches end-to-end
(never on the driver); batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``; per-row cost is
embarrassingly parallel."""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, width int, height int, n_frames int"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (utf-8 payload standing in
    for image/audio bytes) + byte length, as a real BinaryType column."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "n_bytes", F.octet_length("payload").cast("long")
    )


def decode_metadata(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode operator over the binary column.

    ``real_decode=True`` is the integration point for an actual
    image/audio decoder; it raises ``NotImplementedError`` here because
    the codec libraries are not available in this environment (STUB).
    The default path derives deterministic fake dimensions from the
    payload so the full Spark plumbing (schema, batching, partitioning)
    executes and is testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "real image/audio decode requires codec libs not present "
                    "in this environment; deterministic stub is the default"
                )
            payload = pdf["payload"]
            n_bytes = payload.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "content_hash": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": (n_bytes % 640).astype("int32"),
                    "height": ((n_bytes * 7) % 480).astype("int32"),
                    "n_frames": (n_bytes % 16).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, DECODE_SCHEMA)
