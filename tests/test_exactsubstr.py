"""True ExactSubstr (``llm/spans.py::exactsubstr_dup_lens`` /
``exactsubstr_spans``) vs a brute-force reference.

The brute force computes, for every position, the longest substring
starting there that occurs ≥ 2 times corpus-wide (capped), by direct
O(N² · cap) comparison — the definition, with none of the pruning or
hashing the operator uses.
"""

import random

import pytest
from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.spans import (
    exactsubstr_dup_lens,
    exactsubstr_spans,
)


def _tokenize(text):
    return [w for w in text.lower().split() if w]


def _brute_dup_lens(texts, min_len, cap):
    toks = {i: _tokenize(t) for i, t in enumerate(texts)}
    occ = {}
    for d, ws in toks.items():
        for p in range(len(ws)):
            for l in range(min_len, min(cap, len(ws) - p) + 1):
                key = (l, tuple(ws[p : p + l]))
                occ.setdefault(key, []).append((d, p))
    out = {}
    for (l, _), positions in occ.items():
        if len(positions) < 2:
            continue
        for d, p in positions:
            out[(d, p)] = max(out.get((d, p), 0), l)
    return out  # {(doc, pos): dup_len} for dup_len >= min_len


def _brute_spans(texts, min_len, cap):
    lens = _brute_dup_lens(texts, min_len, cap)
    by_doc = {}
    for (d, p), l in lens.items():
        by_doc.setdefault(d, []).append((p, l))
    spans = []
    for d, pl in by_doc.items():
        pl.sort()
        cur = None
        for p, l in pl:
            if cur is None or p > cur[1]:
                if cur is not None:
                    spans.append((d, *cur))
                cur = [p, p + l, l, 1]
            else:
                cur[1] = max(cur[1], p + l)
                cur[2] = max(cur[2], l)
                cur[3] += 1
        if cur is not None:
            spans.append((d, *cur))
    return sorted(
        (d, s, e, e - s, ml, n) for d, (s, e, ml, n) in
        ((d, tuple(rest)) for d, *rest in spans)
    )


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _run_spans(spark, texts, min_len, cap):
    df = exactsubstr_spans(_spark_docs(spark, texts), min_len=min_len, cap=cap)
    return sorted(tuple(r) for r in df.collect())


def test_chimera_region_reports_true_max_duplen(spark):
    """doc0 = A+B, doc1 = A+C, doc2 = D+B: the merged region in doc0
    covers A and B, but NO length-|A|+|B| duplicate exists — true
    ExactSubstr shows max_duplen = 5 < span_tokens = 10, which a
    fixed-shingle island cannot."""
    A = "alpha beta gamma delta epsilon"
    B = "zeta eta theta iota kappa"
    texts = [f"{A} {B}", f"{A} lambda mu nu xi omicron", f"pi rho sigma tau upsilon {B}"]
    got = _run_spans(spark, texts, min_len=5, cap=24)
    assert got == _brute_spans(texts, min_len=5, cap=24)
    doc0 = [r for r in got if r[0] == 0]
    # anchors: pos 0 (A, matches doc1) and pos 5 (B, matches doc2) only —
    # interior 5-grams cross the A/B boundary and are unique
    assert doc0 == [(0, 0, 10, 10, 5, 2)]  # full cover, but max match = 5


def test_below_eight_gram_floor_is_found(spark):
    """A duplicated 5-token run — invisible to the k=8 shingle family —
    is reported with its exact length."""
    run = "one two three four five"
    texts = [f"{run} aaa bbb ccc ddd eee", f"fff ggg hhh iii jjj {run}"]
    got = _run_spans(spark, texts, min_len=5, cap=24)
    assert got == _brute_spans(texts, min_len=5, cap=24)
    assert [r for r in got if r[0] == 0] == [(0, 0, 5, 5, 5, 1)]
    assert [r for r in got if r[0] == 1] == [(1, 5, 10, 5, 5, 1)]


def test_cap_truncates_long_exact_duplicates(spark):
    texts = ["x" + str(0), "y"]
    long = " ".join(f"w{i}" for i in range(40))
    texts = [long, long + " tail0", "unrelated words here entirely distinct"]
    got = _run_spans(spark, texts, min_len=5, cap=12)
    assert got == _brute_spans(texts, min_len=5, cap=12)
    assert max(r[4] for r in got) == 12  # capped


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_random_corpora_match_brute_force(spark, seed):
    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for _ in range(12)
    ]
    for min_len, cap in [(2, 6), (3, 40), (5, 8)]:
        got = _run_spans(spark, texts, min_len=min_len, cap=cap)
        want = _brute_spans(texts, min_len=min_len, cap=cap)
        assert got == want, (min_len, cap)


def test_dup_lens_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        exactsubstr_dup_lens(_spark_docs(spark, ["a"]), min_len=0)
    with pytest.raises(ValueError):
        exactsubstr_dup_lens(_spark_docs(spark, ["a"]), min_len=5, cap=4)


def test_no_cartesian_in_plan(spark, sf_dir):
    from spark_etl_agent_spark.queries.base import load

    df = exactsubstr_spans(load(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
