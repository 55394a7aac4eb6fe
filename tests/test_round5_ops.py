"""Operator-level edge cases for the round-5 second-half additions
(PageRank, SemDeDup, PSI drift, PQ encode) — the oracle-parity suite
covers cross-engine correctness; these pin hand-computed values,
guards, and plan shapes."""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.quantize import pq_encode_stats
from spark_etl_agent_spark.llm.similarity import semantic_dedup
from spark_etl_agent_spark.operators.pagerank import pagerank
from spark_etl_agent_spark.operators.quality import drift_psi


def _sym(spark, pairs):
    rows = [Row(src=a, dst=b) for a, b in pairs] + [
        Row(src=b, dst=a) for a, b in pairs
    ]
    return spark.createDataFrame(rows)


def test_pagerank_path_graph_hand_values(spark):
    """Path 1–2–3, one round: contributions 1e6, 5e5, 1e6; inbound sums
    (5e5, 2e6, 5e5); damped update = 150000 + 850·acc div 1000."""
    out = {
        r["node"]: (r["degree"], r["rank_micro"])
        for r in pagerank(_sym(spark, [(1, 2), (2, 3)]), iters=1).collect()
    }
    assert out == {1: (1, 575000), 2: (2, 1850000), 3: (1, 575000)}


def test_pagerank_mass_bounded_and_deterministic_any_npart(spark):
    """Integer truncation only loses mass (never creates it), and the
    result is partitioning-independent."""
    edges = _sym(spark, [(i, (i * 7) % 23) for i in range(1, 23)])
    a = pagerank(edges, iters=4)
    total = a.agg(F.sum("rank_micro")).collect()[0][0]
    n = a.count()
    assert total <= n * 1_000_000
    b = pagerank(edges.repartition(13), iters=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_symmetric_path_matches_directed_path(spark):
    """symmetric=True (degree rebuilt inside the round aggregation, no
    per-round deg join) must be value-identical to the generic path on
    a symmetric edge list — same int64 algebra, one join fewer."""
    edges = _sym(spark, [(i, (i * 7) % 23) for i in range(1, 23)])
    a = sorted(map(tuple, pagerank(edges, iters=4).collect()))
    b = sorted(map(tuple, pagerank(edges, iters=4, symmetric=True).collect()))
    assert a == b


def test_pagerank_broadcast_gate_sides_agree(spark):
    """The node-count broadcast gate is a physical-plan choice only:
    forcing the big-graph sort-merge path (max_broadcast_nodes=0) must
    be value-identical to the broadcast fast path, on both the
    symmetric and the directed round shapes."""
    edges = _sym(spark, [(i, (i * 7) % 23) for i in range(1, 23)])
    for sym in (False, True):
        fast = sorted(
            map(tuple, pagerank(edges, iters=4, symmetric=sym).collect())
        )
        big = sorted(
            map(
                tuple,
                pagerank(
                    edges, iters=4, symmetric=sym, max_broadcast_nodes=0
                ).collect(),
            )
        )
        assert fast == big, f"symmetric={sym}"


def test_pagerank_hinted_gate_is_lazy_and_value_identical(spark):
    """The r10 hinted gate: values are identical to the counted gate
    whichever path the hint selects. The gate is
    ``n_nodes <= max_broadcast_nodes`` (default 4M), so hint=23 and a
    1000x OVER-estimate both keep the broadcast path (over-estimating
    is the safe direction of the upper-bound contract); the sort-merge
    branch is exercised by a hint ABOVE the default gate and by an
    explicit tiny ``max_broadcast_nodes`` — all four must agree with
    the unhinted run. (A tiny hint does NOT force SMJ: an
    under-estimate keeps the broadcast path, which is why the hint
    contract requires a bound that cannot under-count.)"""
    edges = _sym(spark, [(i, (i * 7) % 23) for i in range(1, 23)])
    base = sorted(
        map(tuple, pagerank(edges, iters=4, symmetric=True).collect())
    )
    cases = (
        (23, 4_000_000),  # broadcast: exact-ish hint
        (23_000, 4_000_000),  # broadcast: 1000x over-bound, still safe
        (10_000_000, 4_000_000),  # hinted sort-merge: hint above gate
        (23, 1),  # hinted sort-merge: tiny explicit gate
    )
    for hint, gate in cases:
        hinted = sorted(
            map(
                tuple,
                pagerank(
                    edges,
                    iters=4,
                    symmetric=True,
                    n_nodes_hint=hint,
                    max_broadcast_nodes=gate,
                ).collect(),
            )
        )
        assert hinted == base, f"hint={hint} gate={gate}"
    # directed path accepts the hint too
    d_base = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    d_hint = sorted(
        map(tuple, pagerank(edges, iters=3, n_nodes_hint=50).collect())
    )
    assert d_hint == d_base


def test_semantic_dedup_cell_width_guard(spark):
    """k=1 puts every vector in one cell — the guard must refuse the
    quadratic compare, naming the width."""
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3 + 1)] * 64) for i in range(40)]
    )
    with pytest.raises(ValueError, match="widest cell"):
        semantic_dedup(df, k=1, iters=1, max_cell_width=10)


def test_semantic_dedup_drops_exact_copy_keeps_lowest_id(spark):
    vec = [1.0, -2.0] * 32
    other = [5.0, 0.25] * 32
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=vec),
            Row(vec_id=2, embedding=vec),
            Row(vec_id=3, embedding=other),
        ]
    )
    rows = semantic_dedup(df, k=1, iters=1, min_cosine=0.99).collect()
    assert len(rows) == 1
    assert rows[0]["vec_id"] == 2 and rows[0]["keeper_id"] == 1
    assert rows[0]["cosine_sim"] == pytest.approx(1.0)


def test_drift_psi_identical_windows_score_zero(spark):
    """Same value multiset on both sides of the boundary → every
    p_ppm == q_ppm → PSI exactly 0, not drifted."""
    ref_ts = datetime.datetime(2024, 1, 2)
    cur_ts = datetime.datetime(2024, 1, 20)
    rows = [
        Row(ts=ts, event_type="t", value=v)
        for ts in (ref_ts, cur_ts)
        for v in (10.0, 40.0, 40.0, 260.0, -5.0)
    ]
    out = drift_psi(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["psi_micro"] == 0 and r["drifted"] is False
    assert r["n_ref"] == 5 and r["n_cur"] == 5


def test_drift_psi_clamps_out_of_range_values(spark):
    """value −5 → bucket 0; value 260 → bucket 9 (clamped, not
    dropped): total counts must equal input rows."""
    rows = [
        Row(ts=datetime.datetime(2024, 1, 2), event_type="t", value=-5.0),
        Row(ts=datetime.datetime(2024, 1, 20), event_type="t", value=260.0),
    ]
    r = drift_psi(spark.createDataFrame(rows)).collect()[0]
    assert r["n_ref"] == 1 and r["n_cur"] == 1


def test_pq_encode_zero_residual_on_seed_vectors(spark):
    """A corpus consisting only of the seed vectors reconstructs
    exactly: every residual is 0 and membership covers all vectors in
    each subspace."""
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i)] * 64) for i in range(8)]
    )
    out = pq_encode_stats(df, m=4, k=8).collect()
    by_sub = {}
    for r in out:
        assert r["err_sum"] == 0 and r["err_mean"] == 0
        by_sub[r["subspace"]] = by_sub.get(r["subspace"], 0) + r["n_members"]
    assert by_sub == {0: 8, 1: 8, 2: 8, 3: 8}


def test_pq_encode_assignment_is_zero_shuffle(spark, sf_dir):
    """The code-assignment projection must not shuffle or fan out the
    corpus: no cartesian/nested-loop join anywhere in the plan."""
    from spark_etl_agent_spark.queries.base import load

    df = pq_encode_stats(load(spark, sf_dir, "embeddings"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_pairs_join_is_equi_join(spark, sf_dir):
    """The within-cell compare must be an equi-join on the cell key —
    all-pairs would defeat the SemDeDup blocking design."""
    from spark_etl_agent_spark.queries.base import load

    df = semantic_dedup(load(spark, sf_dir, "embeddings"), k=4, iters=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_whiten_identity_covariance(spark, sf_dir):
    """Whitened embeddings must have ≈identity covariance (the whole
    point of the transform), zero mean, and preserve row count/ids."""
    import numpy as np

    from spark_etl_agent_spark.llm.whiten import pca_whiten
    from spark_etl_agent_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")
    out = pca_whiten(emb).toPandas()
    assert len(out) == emb.count()
    Y = np.stack(out["whitened"].to_numpy())
    assert Y.shape[1] == 64
    # centering uses the floor(x·1e6)-quantized exact marginals, so the
    # residual mean is the 1e-6 quantization amplified by W's 1/√λ
    assert np.abs(Y.mean(axis=0)).max() < 1e-3
    C = np.cov(Y, rowvar=False, bias=True)
    assert np.abs(C - np.eye(64)).max() < 0.05


def test_pca_whiten_empty_input(spark, sf_dir):
    """An empty frame must come back as an empty frame with the
    contract schema — not a KeyError on the missing (0,0) gram cell."""
    from spark_etl_agent_spark.llm.whiten import pca_whiten
    from spark_etl_agent_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings").filter("vec_id < 0")
    out = pca_whiten(emb)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "whitened"]


def test_gram_partials_match_numpy_direct(spark):
    """The distributed exact Gram must equal a single-process numpy
    computation on the same scaled integers."""
    import numpy as np
    from pyspark.sql import Row

    from spark_etl_agent_spark.llm.whiten import covariance_grid

    rng = [[((i * 7 + j * 13) % 29 - 14) / 10.0 for j in range(64)] for i in range(50)]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(rng)]
    ).repartition(7)
    grid = {
        (r["dim_i"], r["dim_j"]): int(r["s_ij_str"])
        for r in covariance_grid(df).collect()
    }
    X = np.floor(np.array(rng) * 1_000_000).astype(np.int64)
    G = X.T @ X
    for i in range(64):
        for j in range(64):
            assert grid[(i + 1, j + 1)] == int(G[i, j]), (i, j)


def test_triangle_counts_all_equi_joins(spark, sf_dir):
    """Wedge enumeration and the closing join must be equi-joins — a
    nested-loop anywhere turns triangle counting quadratic+."""
    from spark_etl_agent_spark.queries import registry

    df = registry()["neardup_triangles"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_counts_hand_graph(spark):
    """K4 minus one edge: nodes {1,2,3,4}, edges all pairs except
    (1,4) → triangles {1,2,3} and {2,3,4}; per-node counts 1,2,2,1."""
    from pyspark.sql import Row

    from spark_etl_agent_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]]
    )
    out = {r["node"]: (r["degree"], r["n_triangles"]) for r in triangle_counts(edges).collect()}
    assert out == {1: (2, 1), 2: (3, 2), 3: (3, 2), 4: (2, 1)}


def test_ewma_state_threads_across_batches(spark):
    """The streamed EWMA must equal the single-pass recursion — pinned
    directly in Python over a 2-user, order-sensitive sequence."""
    import datetime as _dt

    from spark_etl_agent_spark.streaming.stateful import user_value_ewma
    from spark_etl_agent_spark.streaming.pipeline import run_available_now
    import tempfile

    rows = []
    base = _dt.datetime(2024, 1, 1)
    vals = {7: [1.0, 3.0, 5.0, 100.0], 8: [10.0, 0.0]}
    eid = 0
    for uid, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((eid, base + _dt.timedelta(hours=i), uid, v))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    work = tempfile.mkdtemp(prefix="ewma_unit_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{work}/src")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/src")
    )
    out = run_available_now(user_value_ewma(stream), output_mode="update")
    got = {r["user_id"]: r["ewma_micros"] for r in out.collect()}

    def ref(vs):
        e = None
        for v in vs:
            x = round(v * 10_000)
            e = x if e is None else (e + x) // 2
        return e

    assert got == {u: ref(vs) for u, vs in vals.items()}
