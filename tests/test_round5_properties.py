"""Property-based invariants (hypothesis) for the round-5 operators —
small randomized inputs, Spark-checked against mathematical or
brute-force ground truth."""

import datetime
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from spark_etl_agent_spark.operators.graph import triangle_counts
from spark_etl_agent_spark.operators.pagerank import pagerank
from spark_etl_agent_spark.operators.quality import drift_psi

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(edges=edges_strategy)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Distributed oriented-wedge counting equals the O(n³) itertools
    enumeration on arbitrary small graphs (dups/reversed edges
    included)."""
    undirected = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in undirected for n in e})
    expected = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            (a, b) in undirected
            and (b, c) in undirected
            and (a, c) in undirected
        ):
            for n in (a, b, c):
                expected[n] += 1
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == expected


@settings(**_SETTINGS)
@given(edges=edges_strategy)
def test_pagerank_mass_and_floor_invariants(spark, edges):
    """After any number of integer rounds: every node's rank is at
    least the teleport floor, and total mass never exceeds the initial
    endowment (integer truncation only loses mass)."""
    rows = [Row(src=a, dst=b) for a, b in edges] + [
        Row(src=b, dst=a) for a, b in edges
    ]
    out = pagerank(spark.createDataFrame(rows), iters=3).collect()
    n = len(out)
    assert n == len({r["node"] for r in out})
    for r in out:
        assert r["rank_micro"] >= 150_000
    assert sum(r["rank_micro"] for r in out) <= n * 1_000_000


hist_strategy = st.lists(st.integers(0, 9), min_size=1, max_size=30)


@settings(**_SETTINGS)
@given(ref=hist_strategy, cur=hist_strategy)
def test_psi_nonnegative_and_zero_iff_identical(spark, ref, cur):
    """PSI is a sum of terms (p−q)·ln(p/q) whose factors share sign —
    every integer term is ≥ 0, so psi_micro ≥ 0; identical bucket
    multisets score exactly 0."""
    ref_ts = datetime.datetime(2024, 1, 2)
    cur_ts = datetime.datetime(2024, 1, 20)
    rows = [
        Row(ts=ref_ts, event_type="g", value=b * 25.0 + 1) for b in ref
    ] + [Row(ts=cur_ts, event_type="g", value=b * 25.0 + 1) for b in cur]
    r = drift_psi(spark.createDataFrame(rows)).collect()[0]
    assert r["psi_micro"] >= 0
    if sorted(ref) == sorted(cur):
        assert r["psi_micro"] == 0


def _scrub_reference(docs: dict, k: int) -> dict:
    """Pure-python ExactSubstr scrub mirror: same canonical-occurrence
    and coverage semantics as llm.spans.scrub_duplicate_spans."""
    spans = {}  # text -> list[(doc_id, pos)]
    words = {d: t.lower().split() for d, t in docs.items()}
    words = {d: [w for w in ws if w] for d, ws in words.items()}
    for d in sorted(words):
        ws = words[d]
        for i in range(len(ws) - k + 1):
            spans.setdefault(" ".join(ws[i : i + k]), []).append((d, i))
    covered = {d: set() for d in words}
    for occs in spans.values():
        if len(occs) < 2:
            continue
        for d, p in sorted(occs)[1:]:  # canonical = global min survives
            covered[d].update(range(p, p + k))
    out = {}
    for d, ws in words.items():
        kept = [w for i, w in enumerate(ws) if i not in covered[d]]
        out[d] = (len(ws), len(kept), len(ws) - len(kept), " ".join(kept))
    return out


word_strategy = st.text(alphabet="abc", min_size=1, max_size=2)
doc_strategy = st.lists(word_strategy, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(doc_strategy, min_size=1, max_size=6))
def test_scrub_duplicate_spans_matches_reference(spark, texts):
    """Random tiny-alphabet corpora (duplication-dense by construction):
    the distributed scrub must agree exactly with the brute-force
    single-process reference on counts AND reassembled text."""
    from spark_etl_agent_spark.llm.spans import scrub_duplicate_spans

    k = 3
    docs = {i: t for i, t in enumerate(texts)}
    expect = _scrub_reference(docs, k)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_kept"], r["n_removed"], r["scrubbed_text"]
        )
        for r in scrub_duplicate_spans(df, k=k).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# salted_topk (round-6f): property — equals the brute-force per-group
# top-k for ANY multiset of (group, score) rows, any k, any bucketing

topk_rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-50, 50)),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(
    rows=topk_rows_strategy,
    k=st.integers(1, 6),
    buckets=st.integers(1, 8),
)
def test_salted_topk_matches_bruteforce(spark, rows, k, buckets):
    from pyspark.sql import functions as F

    from spark_etl_agent_spark.operators.skew import salted_topk

    data = [(g, i, s) for i, (g, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "grp int, rid long, score long")
    got = sorted(
        (r.grp, r.rid, r.rank_in_group)
        for r in salted_topk(
            df,
            ["grp"],
            [F.col("score").desc(), F.col("rid")],
            k,
            salt_buckets=buckets,
        ).collect()
    )
    want = []
    for g in {g for g, _, _ in data}:
        members = sorted(
            ((s, rid) for gg, rid, s in data if gg == g),
            key=lambda t: (-t[0], t[1]),
        )
        want.extend((g, rid, rank + 1) for rank, (_, rid) in
                    enumerate(members[:k]))
    assert got == sorted(want)
