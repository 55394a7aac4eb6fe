"""Round-12 optimization pins.

Numeric MinHash family (llm.dedup): the signature value is pinned
against a plain-Python md5 reference (the documented
``h_i(s) = (A_i * base(s) + B_i) mod P`` with ``base`` = first 60 bits
of md5), and the aggregation must compile to HashAggregate — the
whole point of the redesign (min over int64 instead of min over
md5-hex strings, which is SortAggregate-only).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.dedup import (
    BAND_SIZE,
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    N_MINHASHES,
    _banded,
    minhash_signatures,
)


def _ref_base(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_PRIME


def _ref_shingles(text: str, k: int = 3):
    words = [w for w in text.lower().split() if w]
    return [
        " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
    ]


def _ref_signature(text: str):
    sh = _ref_shingles(text)
    if not sh:
        return tuple(None for _ in range(N_MINHASHES))
    bases = [_ref_base(s) for s in sh]
    return tuple(
        min((MINHASH_A[i] * x + MINHASH_B[i]) % MINHASH_PRIME for x in bases)
        for i in range(N_MINHASHES)
    )


def test_minhash_signature_matches_python_reference(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "a completely different document with other words here"),
        (4, "too short"),  # < k words -> NULL signature
        (5, "x y z x y z x y z"),  # repeated shingles (multiset == set min)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r[f"mh{i}"] for i in range(N_MINHASHES))
        for r in minhash_signatures(df).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _ref_signature(text), doc_id
    # signature values live in [0, P)
    for sig in got.values():
        for v in sig:
            assert v is None or 0 <= v < MINHASH_PRIME


def test_minhash_signature_aggregates_with_hash_aggregate(spark):
    """The redesign's plan claim: int64 min-agg buffers are fixed-width,
    so the signature aggregation is a HashAggregate — the old
    min-over-md5-hex form compiled to SortAggregate (plans/r12/
    minhash_signatures_before.txt)."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    plan = (
        minhash_signatures(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_band_key_is_injective_encoding_for_band_size_2(spark):
    """band_key = mh_a * 2147483647 + mh_b exactly (base-P positional
    encoding, collision-free for band_size 2)."""
    rows = [
        (7, 0, 0),
        (8, MINHASH_PRIME - 1, MINHASH_PRIME - 1),
        (9, 123456789, 987654321),
    ]
    sig = spark.createDataFrame(
        [
            (i, a, b, a, b, a, b, a, b)
            for (i, a, b) in rows
        ],
        "doc_id long, mh0 long, mh1 long, mh2 long, mh3 long, "
        "mh4 long, mh5 long, mh6 long, mh7 long",
    )
    got = {
        (r["doc_id"], r["band_idx"]): r["band_key"]
        for r in _banded(sig, "doc_id", N_MINHASHES, BAND_SIZE).collect()
    }
    for i, a, b in rows:
        for band in range(N_MINHASHES // BAND_SIZE):
            assert got[(i, band)] == a * 2147483647 + b
