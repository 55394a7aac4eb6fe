"""Round-6 fixes: ADVICE items (PMI int64 overflow, half-away-from-zero
streaming quantization) plus new round-6 operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_lift_ppm_survives_int64_overflow(spark):
    """c12·N·1e6 beyond int64: the decimal(38,0) path must give the
    exact quotient where the old raw-int64 multiply silently wraps.
    c12=1e7, n=1e6 → product 1e19 > 2⁶³-1 ≈ 9.22e18."""
    from spark_etl_agent_spark.llm.text import LIFT_PPM_EXPR

    df = spark.createDataFrame(
        [(10_000_000, 20_000_000, 30_000_000, 1_000_000)],
        "c12 long, c1 long, c2 long, _n long",
    )
    got = df.select(
        F.expr(LIFT_PPM_EXPR).cast("long").alias("lift_ppm")
    ).collect()[0]["lift_ppm"]
    exact = (10_000_000 * 1_000_000 * 1_000_000) // (
        20_000_000 * 30_000_000
    )
    assert got == exact == 16_666
    # the raw int64 expression the old code used either wraps
    # (non-ANSI) or dies with ARITHMETIC_OVERFLOW (ANSI, Spark 4
    # default) — pin that it cannot produce the exact quotient
    from pyspark.errors import ArithmeticException

    with pytest.raises(ArithmeticException):
        df.select(
            F.expr("(c12 * _n * 1000000) div (c1 * c2)").alias("x")
        ).collect()


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.union(df.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))


def test_pagerank_reliable_requires_checkpoint_dir(spark):
    """Cluster posture must refuse to run on executor-local state: no
    checkpoint dir → a clear error, not a silent localCheckpoint."""
    from spark_etl_agent_spark.operators.pagerank import pagerank

    edges = _sym_edges(spark, [(1, 2), (2, 3)])
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        with pytest.raises(ValueError, match="checkpoint"):
            pagerank(edges, iters=1, checkpoint_mode="reliable")


def test_pagerank_reliable_checkpoint_matches_local(spark, tmp_path):
    """Reliable (FS) checkpointing: bit-identical ranks to the local
    fast path, with the round state written to the checkpoint dir —
    i.e. lineage truncation holds WITHOUT executor-local blocks, the
    survive-executor-death posture for 1000-executor runs."""
    import glob

    from spark_etl_agent_spark.operators.pagerank import pagerank

    pairs = [(i, (i * 7 + 1) % 50) for i in range(200)]
    edges = _sym_edges(spark, [(a, b) for a, b in pairs if a != b])
    local = {
        (r["node"]): (r["degree"], r["rank_micro"])
        for r in pagerank(edges, iters=4, checkpoint_mode="local").collect()
    }
    ckdir = str(tmp_path / "pr_ck")
    rel = pagerank(
        edges, iters=4, checkpoint_mode="reliable", checkpoint_dir=ckdir
    )
    got = {
        (r["node"]): (r["degree"], r["rank_micro"]) for r in rel.collect()
    }
    assert got == local
    # the truncated lineage is backed by warehouse-FS files, not
    # executor block storage
    files = glob.glob(f"{ckdir}/**/rdd-*", recursive=True)
    assert files, "no reliable checkpoint RDDs written under checkpoint_dir"


def test_pagerank_auto_mode_is_local_on_local_master(spark):
    """auto → localCheckpoint on local[*]: runs without any checkpoint
    dir and matches the explicit local mode."""
    from spark_etl_agent_spark.operators.pagerank import pagerank

    edges = _sym_edges(spark, [(1, 2), (2, 3), (3, 1)])
    a = sorted(map(tuple, pagerank(edges, iters=2).collect()))
    b = sorted(map(tuple, pagerank(
        edges, iters=2, checkpoint_mode="local").collect()))
    assert a == b


def test_ordered_budget_prefix_exact_and_partition_independent(spark):
    """Greedy prefix under a token budget: exact cumulative sums in
    score-desc order, boundary-crossing doc excluded, bit-identical at
    any partition count (the range-partition skeleton contract)."""
    from spark_etl_agent_spark.llm.packing import ordered_budget_prefix

    rows = [(i, (i * 37) % 100, 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score long, tok long")
    order = [F.col("score").desc(), F.col("doc_id")]

    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in ordered_budget_prefix(df, "tok", 500, order).collect()
    }
    # driver-side replay of the greedy walk
    expect, cum = {}, 0
    for d, s, t in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + t > 500:
            break
        cum += t
        expect[d] = cum
    assert got == expect and expect  # non-trivial selection

    for npart in (1, 3, 17):
        alt = {
            r["doc_id"]: r["cum_tokens"]
            for r in ordered_budget_prefix(
                df.repartition(5), "tok", 500, order, npart=npart
            ).collect()
        }
        assert alt == expect

    assert ordered_budget_prefix(df, "tok", 0, order).count() == 0
    with pytest.raises(ValueError):
        ordered_budget_prefix(df, "tok", -1, order)


def test_to_micros_half_away_from_zero():
    """Quantization rule must be half-away-from-zero (DuckDB round()),
    not pandas banker's rounding: 0.00005 → 1 micro-unit, 0.00015 → 2,
    -0.00005 → -1."""
    from spark_etl_agent_spark.streaming.stateful import _to_micros

    # 0.00005/0.00025 multiply to exactly 0.5/2.5 in float64 — true
    # half cases where the two rounding rules disagree
    s = pd.Series([0.00005, 0.00025, -0.00005, 1.0, 0.0])
    got = _to_micros(s).tolist()
    assert got == [1, 3, -1, 10_000, 0]
    # banker's rounding gives [0, 2, 0, ...] — the divergence the fix
    # removes
    bankers = (s * 10_000).round().astype("int64").tolist()
    assert bankers[:3] == [0, 2, 0]


def test_scrub_duplicate_spans_removes_non_canonical(spark):
    """k=3 worked example: 'a b c' appears in docs 1 and 2 — the
    canonical (globally first) occurrence survives, the other loses
    its covered tokens; intra-doc repetition collapses to one copy;
    sub-k docs pass through untouched."""
    from spark_etl_agent_spark.llm.spans import scrub_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c z"),
            (3, "p q r p q r p q"),
            (4, "u v"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in scrub_duplicate_spans(docs, k=3).collect()
    }
    assert got[1]["scrubbed_text"] == "a b c d e f"
    assert got[1]["n_removed"] == 0
    # doc 2: removable occurrence at pos 2 covers tokens 2..4
    assert got[2]["scrubbed_text"] == "x y z"
    assert (got[2]["n_tokens"], got[2]["n_kept"], got[2]["n_removed"]) == (
        6, 3, 3,
    )
    # doc 3 'p q r p q r p q': every span repeats; non-canonical
    # occurrences cover positions 3..7 → one period survives
    assert got[3]["scrubbed_text"] == "p q r"
    assert got[3]["n_removed"] == 5
    # shorter than k: no spans, nothing to scrub
    assert got[4]["scrubbed_text"] == "u v"
    assert got[4]["n_removed"] == 0


def test_scrub_partition_count_independent(spark):
    """Canonical-occurrence choice is a global min, not a partition
    accident — 1-partition and 13-partition runs must agree exactly."""
    from spark_etl_agent_spark.llm.spans import scrub_duplicate_spans

    rows = [(i, f"w{i} common run of words here tail{i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    one = sorted(
        map(tuple, scrub_duplicate_spans(docs.coalesce(1), k=4).collect())
    )
    many = sorted(
        map(tuple, scrub_duplicate_spans(docs.repartition(13), k=4).collect())
    )
    assert one == many


def test_vocab_coverage_curve_exact_ppm(spark):
    """a=4 b=3 c=1 over 8 corpus tokens: exact integer ppm shares."""
    from spark_etl_agent_spark.llm.text import vocab_coverage_curve

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a a")], "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in vocab_coverage_curve(docs, top_n=2)
        .orderBy("tok_rank")
        .collect()
    ]
    assert got == [
        (1, "a", 4, 4, 500000),
        (2, "b", 3, 7, 875000),
    ]


def _winnow_reference(texts, k, w):
    """Brute-force winnowing mirror: a span is selected iff its hash is
    the minimum of some valid window covering it (ties select all)."""
    import hashlib

    out = set()
    for doc_id, text in texts:
        ws = [x for x in text.lower().split() if x]
        hs = [
            int(hashlib.md5(" ".join(ws[i : i + k]).encode()).hexdigest()[:8], 16)
            for i in range(len(ws) - k + 1)
        ]
        n = len(hs)
        if n == 0:
            continue
        for s in range(max(n - w, 0) + 1):
            win = hs[s : s + w]
            lo = min(win)
            for j, h in enumerate(win):
                if h == lo:
                    out.add((doc_id, s + j, h))
    return out


def test_winnowing_matches_bruteforce(spark):
    """Fixed corpus incl. short docs, ties, and shared substrings:
    the distributed selection must equal the brute-force set."""
    from spark_etl_agent_spark.llm.winnow import winnowing_fingerprints

    texts = [
        (1, "a b c d e f g h i j"),
        (2, "x y z a b c d e f q"),
        (3, "p q"),                      # shorter than k: no spans
        (4, "m m m m m m"),              # all-tie hashes
        (5, "u v w x y"),                # fewer spans than w
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnowing_fingerprints(df, k=3, w=3).collect()
    }
    assert got == _winnow_reference(texts, 3, 3)
    # the paper's local-match guarantee: docs 1 and 2 share the 7-token
    # substring 'a b c d e f' (≥ w + k - 1 = 5), so they must share at
    # least one selected fingerprint VALUE
    fp1 = {fp for d, _, fp in got if d == 1}
    fp2 = {fp for d, _, fp in got if d == 2}
    assert fp1 & fp2


def test_winnowing_random_corpora(spark):
    """Randomized differential vs the brute-force reference (seeded,
    tiny alphabet so windows are tie-dense)."""
    import random

    from spark_etl_agent_spark.llm.winnow import winnowing_fingerprints

    rng = random.Random(42)
    texts = [
        (i, " ".join(rng.choice("ab cd ef".split()) for _ in range(rng.randint(0, 12))))
        for i in range(12)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnowing_fingerprints(df, k=2, w=3).collect()
    }
    assert got == _winnow_reference(texts, 2, 3)


def test_winnowing_overlap_pairs_semantics(spark):
    """Two docs sharing a long substring must pair with an exact
    integer-ppm score; an unrelated doc pairs with nobody; a
    corpus-wide boilerplate fingerprint (df > max_df) is excluded
    from pairing evidence."""
    from spark_etl_agent_spark.llm.winnow import winnowing_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [(1, shared + " one two"), (2, "x y " + shared)]
    texts += [(i, "common boiler plate text here " + f"u{i} v{i} w{i}")
              for i in range(3, 10)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in winnowing_overlap_pairs(
            df, k=3, w=3, max_df=3, min_shared=2
        ).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["shared_fp"] >= 2
    assert r["overlap_ppm"] == r["shared_fp"] * 1_000_000 // min(
        r["n_fp_a"], r["n_fp_b"]
    )
    # the boilerplate block shares a prefix across 7 docs: its
    # fingerprints have df=7 > max_df=3, so no pair may rest on them
    assert not any(a >= 3 and b >= 3 for a, b in got)
