"""Multimodal operator tests: the Arrow/mapInPandas plumbing is real
(schemas, batching, 1→N expansion); decode/extract/resize are
deterministic stubs with clearly-marked real-codec integration points
that raise NotImplementedError."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_metadata,
    extract_features,
    resize_stub,
    sample_frames,
)
from spark_etl_agent_spark.queries.base import load


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return attach_payload(load(spark, sf_dir, "documents").limit(50)).cache()


def test_feature_extraction_shape_and_determinism(payloads):
    feats = extract_features(payloads)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r.features)
    # deterministic: re-run produces identical vectors
    again = {r.doc_id: r.features for r in extract_features(payloads).collect()}
    assert all(again[r.doc_id] == r.features for r in rows)


def test_resize_stub_dims(payloads):
    out = resize_stub(payloads, width=64, height=48).collect()
    assert all(r.width == 64 and r.height == 48 and r.n_bytes > 0 for r in out)


def test_sample_frames_expansion(payloads):
    frames = sample_frames(payloads, every_n_bytes=1000)
    pdf = frames.toPandas()
    # 1→N expansion: every doc yields ceil(n_bytes/1000) frames
    n_bytes = {r.doc_id: r.n_bytes for r in payloads.select("doc_id", "n_bytes").collect()}
    per_doc = pdf.groupby("doc_id").size().to_dict()
    assert all(per_doc[d] == -(-n // 1000) for d, n in n_bytes.items())
    # frame hash matches an independent computation for one spot-checked doc
    doc = payloads.filter(F.col("doc_id") == pdf.doc_id.iloc[0]).collect()[0]
    raw = bytes(doc.payload)
    expected0 = hashlib.md5(raw[:1000]).hexdigest()
    got0 = pdf[(pdf.doc_id == doc.doc_id) & (pdf.frame_idx == 0)].frame_hash.iloc[0]
    assert got0 == expected0


def test_real_codec_paths_are_marked_stubs(payloads):
    with pytest.raises(Exception, match="NotImplementedError|STUB|real"):
        decode_metadata(payloads, real_decode=True).collect()
    with pytest.raises(Exception, match="NotImplementedError|STUB|real"):
        extract_features(payloads, real_extract=True).collect()
