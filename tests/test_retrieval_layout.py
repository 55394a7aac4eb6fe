"""Rendezvous sharding (`operators/layout.py`) and BM25 retrieval
(`llm/text.py::bm25_topk`): pure-Python differentials plus the
semantic properties each operator exists to guarantee."""

import hashlib
import math
from collections import Counter

import pytest


def _hrw(key, n):
    return max(
        range(n),
        key=lambda s: (hashlib.md5(f"{s}|{key}".encode()).hexdigest(), -s),
    )


def test_rendezvous_matches_pure_python(spark):
    from pyspark.sql import functions as F

    from spark_etl_agent_spark.operators.layout import rendezvous_shard

    df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    got = {
        r["k"]: r["s"]
        for r in df.select("k", rendezvous_shard(F.col("k"), 8).alias("s")).collect()
    }
    assert got == {i: _hrw(i, 8) for i in range(300)}


def test_reshard_moves_only_to_new_shard(spark):
    """The HRW property: growing 8 -> 9 shards, every moved key lands
    on shard 8 — nothing migrates between surviving shards."""
    from spark_etl_agent_spark.operators.layout import shard_movement_report

    df = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    rows = shard_movement_report(df, "k", 8, 9).collect()
    moved = sum(r["n_keys"] for r in rows if r["is_move"])
    for r in rows:
        if r["is_move"]:
            assert r["shard_after"] == 8
    # expected ~1/9 of keys move; allow generous slack on 500 keys
    assert 0.04 < moved / 500 < 0.25
    assert sum(r["n_keys"] for r in rows) == 500


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    n = len(docs)
    dls = {i: len(t.lower().split()) for i, t in docs}
    avgdl = sum(dls.values()) / n
    tfs = {i: Counter(w for w in t.lower().split() if w in terms)
           for i, t in docs}
    dfreq = Counter(term for tf in tfs.values() for term in tf)
    out = {}
    for i, _ in docs:
        score, hits = 0, 0
        for term, tf in tfs[i].items():
            idf_micro = math.floor(
                math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                * 1e6
            )
            score += math.floor(
                idf_micro * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * dls[i] / avgdl))
            )
            hits += 1
        if hits:
            out[i] = (score, hits)
    return out


DOCS = [
    (1, "filter merge slow vector filter merge"),
    (2, "filter filter filter filter filter filter filter filter"),
    (3, "merge of a very long document " + "pad " * 40 + "merge"),
    (4, "nothing relevant here at all"),
    (5, "vector slow"),
]


def test_bm25_matches_pure_python(spark):
    from spark_etl_agent_spark.llm.text import bm25_topk

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    terms = ("filter", "merge", "slow", "vector")
    got = {
        r["doc_id"]: (r["bm25_micro"], r["n_terms_hit"])
        for r in bm25_topk(df, terms, topk=10).collect()
    }
    assert got == _bm25_reference(DOCS, set(terms))


def test_bm25_semantics(spark):
    from spark_etl_agent_spark.llm.text import bm25_topk

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ("filter", "merge", "slow", "vector"), topk=10).collect()
    ranks = {r["doc_id"]: i for i, r in enumerate(rows)}
    # doc 4 has no query term: not retrieved at all
    assert 4 not in ranks
    # doc 1 hits all four terms and outranks the one-term spam doc 2
    # (tf saturation) and the long doc 3 (length normalization)
    assert ranks[1] < ranks[2] and ranks[1] < ranks[3]


# --- semantic decontamination (llm/decontam.py::semantic_contamination) ---


def test_semantic_contamination_planted(spark):
    """A paraphrase-level near-copy of a benchmark vector is flagged
    with the right probe; an orthogonal vector is not."""
    from spark_etl_agent_spark.llm.decontam import semantic_contamination

    dim = 8
    def unit(i):
        v = [0.0] * dim
        v[i] = 1.0
        return v

    rows = [
        (0, unit(0)),  # benchmark probes: axes 0 and 1
        (1, unit(1)),
        (10, [0.98, 0.02] + [0.0] * 6),  # near-copy of probe 0
        (11, unit(5)),  # orthogonal: clean
        (12, [0.5, 0.6] + [0.0] * 6),  # closest to probe 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r.asDict()
        for r in semantic_contamination(df, probe_ids_below=2).collect()
    }
    assert 10 in got and got[10]["bench_id"] == 0
    assert got[10]["max_cosine"] > 0.95
    assert 11 not in got
    assert 12 in got and got[12]["bench_id"] == 1


def test_semantic_contamination_broadcast_plan(spark, sf_dir):
    """The probe side must broadcast — a corpus-side shuffle for the
    membership probe would be wrong at any scale."""
    from spark_etl_agent_spark.queries import registry

    df = registry()["semantic_decontaminate"].spark(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree
    assert "Broadcast" in tree
