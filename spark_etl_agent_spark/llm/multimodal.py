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


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id long, features array<double>"
RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes long"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def extract_features(df: DataFrame, real_extract: bool = False) -> DataFrame:
    """Feature-extraction operator shape: binary payload → fixed-length
    embedding (``array<double>``). The real extractor (image/audio
    model) is the ``real_extract=True`` integration point — STUB
    (``NotImplementedError``) since no model runtime is present; the
    deterministic default derives features from byte statistics so the
    Arrow plumbing and output schema are real and testable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_extract:
                raise NotImplementedError(
                    "real feature extraction requires a model runtime not "
                    "present in this environment (STUB)"
                )
            feats = [
                [
                    float(int(hashlib.md5(bytes(b) + bytes([i])).hexdigest()[:8], 16))
                    / 16**8
                    for i in range(FEATURE_DIM)
                ]
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURES_SCHEMA)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224,
                real_resize: bool = False) -> DataFrame:
    """Resize operator shape: new target dims + untouched byte length
    (a real implementation re-encodes the payload — STUB, codec libs
    absent)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_resize:
                raise NotImplementedError("real resize requires codec libs (STUB)")
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_bytes": n,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling operator shape for video-like payloads: one output
    row per sampled frame (byte-stride stand-in for time-stride),
    frame id = hash of the sampled slice — shows the 1→N mapInPandas
    row-expansion pattern with bounded memory per batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for k, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(k)
                    hashes.append(hashlib.md5(raw[off:off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)
