"""Round-6 late additions: DSIR importance weights, bigram Markov-LM
doc scoring, LSH band-configuration calibration — each pinned against
a pure-Python brute-force reference plus a semantic property."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F


def _md5_bucket(w: str, n_buckets: int = 256) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets


def _dsir_reference(docs, target_ids, n_buckets=256):
    """Pure-Python DSIR: hashed-unigram add-one LLR, micro-quantized
    per bucket exactly like the Spark/DuckDB pair."""
    raw = Counter()
    tgt = Counter()
    for doc_id, text in docs:
        for w in text.lower().split():
            b = _md5_bucket(w, n_buckets)
            raw[b] += 1
            if doc_id in target_ids:
                tgt[b] += 1
    rtot, ttot = sum(raw.values()), sum(tgt.values())
    lw = {
        b: math.floor(math.log((tgt[b] + 1) / (ttot + n_buckets)) * 1e6)
        - math.floor(math.log((raw[b] + 1) / (rtot + n_buckets)) * 1e6)
        for b in raw
    }
    out = {}
    for doc_id, text in docs:
        words = text.lower().split()
        score = sum(lw[_md5_bucket(w, n_buckets)] for w in words)
        out[doc_id] = (len(words), score)
    return out


def test_dsir_matches_pure_python(spark):
    from spark_etl_agent_spark.llm.text import dsir_importance

    docs = [
        (1, "alpha beta gamma alpha", "en"),
        (2, "alpha beta beta", "en"),
        (3, "delta epsilon zeta", "de"),
        (4, "delta delta epsilon", "de"),
        (5, "alpha delta beta epsilon", "fr"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["dsir_score_micro"])
        for r in dsir_importance(df, target=F.col("lang") == "en").collect()
    }
    ref = _dsir_reference([(i, t) for i, t, _ in docs], target_ids={1, 2})
    assert got == ref


def test_dsir_ranks_target_like_docs_higher(spark):
    """The semantic contract: a document whose vocabulary matches the
    target subset's must outscore one drawn from the out-of-target
    vocabulary — that ordering is what importance resampling selects
    on."""
    from spark_etl_agent_spark.llm.text import dsir_importance

    rows = [(i, "alpha beta gamma", "en") for i in range(10)]
    rows += [(100 + i, "delta epsilon zeta", "de") for i in range(10)]
    # two probe docs OUTSIDE the target subset
    rows += [(200, "alpha beta gamma", "fr"), (201, "delta epsilon zeta", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    scores = {
        r["doc_id"]: r["dsir_score_micro"]
        for r in dsir_importance(df, target=F.col("lang") == "en").collect()
    }
    assert scores[200] > scores[201]


def test_dsir_partition_count_independent(spark):
    from spark_etl_agent_spark.llm.text import dsir_importance

    rows = [
        (i, f"tok{i % 7} tok{i % 3} tok{i % 5} shared", "en" if i % 2 else "de")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    tgt = F.col("lang") == "en"
    one = sorted(
        map(tuple, dsir_importance(df.coalesce(1), target=tgt).collect())
    )
    many = sorted(
        map(tuple, dsir_importance(df.repartition(13), target=tgt).collect())
    )
    assert one == many


def _bigram_reference(docs):
    bigrams = []
    per_doc = {}
    for doc_id, text in docs:
        ws = text.lower().split()
        bg = list(zip(ws, ws[1:]))
        per_doc[doc_id] = bg
        bigrams.extend(bg)
    c2 = Counter(bigrams)
    c1 = Counter(w1 for w1, _ in bigrams)
    v = len(c1)
    out = {}
    for doc_id, bg in per_doc.items():
        if not bg:
            continue
        lps = [
            math.floor(math.log((c2[p] + 1) / (c1[p[0]] + v)) * 1e6)
            for p in bg
        ]
        out[doc_id] = (
            len(bg),
            sum(lps),
            math.floor(sum(lps) / len(bg)),
        )
    return out


def test_bigram_logprob_matches_pure_python(spark):
    from spark_etl_agent_spark.llm.text import bigram_doc_logprob

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "mat the on sat cat the"),
        (4, "solo"),  # < 2 tokens: no bigrams, excluded
        (5, "the cat sat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["logprob_micro_sum"],
            r["avg_logprob_micro"],
        )
        for r in bigram_doc_logprob(df).collect()
    }
    ref = _bigram_reference(docs)
    assert got == ref
    assert 4 not in got


def test_bigram_logprob_is_order_aware(spark):
    """Same unigram multiset, different order: the document made of the
    corpus's dominant bigram must outscore its reversal — exactly the
    signal unigram_doc_logprob cannot see."""
    from spark_etl_agent_spark.llm.text import bigram_doc_logprob

    rows = [(i, "x y x y x y") for i in range(10)]
    rows += [(100, "x y x y"), (101, "y y x x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r["doc_id"]: r["avg_logprob_micro"]
        for r in bigram_doc_logprob(df).collect()
    }
    assert scores[100] > scores[101]


def _band_key_reference(vals):
    """Plain-Python twin of llm.dedup._band_key / band_key_sql: the
    int64 polynomial fold over a band's mh values."""
    k = vals[0]
    for c in vals[1:]:
        k = (k % 2147483648) * 2147483647 + c
    return k


def _band_profile_reference(sigs, configs, max_width):
    """Brute-force band profile from collected signature rows."""
    out = {}
    for n_bands, band_size in configs:
        buckets = Counter()
        members = {}
        for row in sigs:
            if row["mh0"] is None:
                continue
            for b in range(n_bands):
                key = (
                    b,
                    _band_key_reference(
                        [
                            row[f"mh{b * band_size + j}"]
                            for j in range(band_size)
                        ]
                    ),
                )
                buckets[key] += 1
                members.setdefault(key, []).append(row["doc_id"])
        coll = {k: n for k, n in buckets.items() if n >= 2}
        pairs = set()
        for k, n in coll.items():
            if n > max_width:
                continue
            ms = sorted(members[k])
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    pairs.add((ms[i], ms[j]))
        out[(n_bands, band_size)] = (
            len(coll),
            sum(n * (n - 1) // 2 for n in coll.values()),
            len(pairs),
            max(coll.values()) if coll else 0,
        )
    return out


def test_lsh_band_profile_matches_bruteforce(spark):
    from spark_etl_agent_spark.llm.dedup import (
        lsh_band_profile,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base) for i in range(3)]  # exact clique
    docs += [(10, base + " extra tail tokens here"), (11, "zz")]  # near + short
    docs += [(20 + i, f"unique doc {i} with words w{i} v{i} u{i} t{i}")
             for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    configs = ((8, 1), (4, 2), (2, 4), (1, 8))
    got = {
        (r["n_bands"], r["band_size"]): (
            r["n_colliding_buckets"],
            r["candidate_multiplicity"],
            r["distinct_candidate_pairs"],
            r["max_bucket_width"],
        )
        for r in lsh_band_profile(df, configs=configs).collect()
    }
    sigs = [r.asDict() for r in minhash_signatures(df).collect()]
    ref = _band_profile_reference(sigs, configs, max_width=64)
    assert got == ref
    # wider bands = stricter collisions: distinct candidate pairs are
    # monotone non-increasing in band_size (a (4,2) collision implies
    # both (8,1) collisions)
    by_rows = [got[c][2] for c in configs]
    assert by_rows == sorted(by_rows, reverse=True)


def test_lsh_band_profile_rejects_bad_config(spark):
    from spark_etl_agent_spark.llm.dedup import lsh_band_profile

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="config"):
        lsh_band_profile(df, configs=((3, 2),)).collect()


def test_split_leakage_audit_flags_cross_split_neardups(spark):
    """Near-identical docs whose ids hash into different splits must
    surface with is_leak=true; a low-Jaccard candidate pair must be
    excluded by the integer 2·common ≥ union threshold."""
    from spark_etl_agent_spark.llm.dedup import split_leakage_audit
    from spark_etl_agent_spark.llm.sampling import hash_bucket, _HASH_SPACE

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # find two doc ids in different splits (stable md5 hash split)
    rows = [(i, base) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_audit(df).collect()
    assert len(out) > 0
    splits = {}
    from pyspark.sql import functions as F2
    for r in df.select(
        "doc_id",
        F2.when(
            hash_bucket(F2.col("doc_id"), "split1") < int(0.8 * _HASH_SPACE),
            "train",
        )
        .when(
            hash_bucket(F2.col("doc_id"), "split1") < int(0.9 * _HASH_SPACE),
            "val",
        )
        .otherwise("test")
        .alias("split"),
    ).collect():
        splits[r["doc_id"]] = r["split"]
    for r in out:
        assert r["split_a"] == splits[r["id_a"]]
        assert r["split_b"] == splits[r["id_b"]]
        assert r["is_leak"] == (r["split_a"] != r["split_b"])
        # identical docs: full overlap
        assert r["jaccard_ppm"] == 1_000_000
    assert any(r["is_leak"] for r in out)
    assert any(not r["is_leak"] for r in out)


def test_split_leakage_excludes_sub_half_jaccard(spark):
    """A candidate pair below Jaccard 0.5 (e.g. one doc a strict
    extension of the other beyond 2x) must not appear, even though LSH
    banding proposes it."""
    from spark_etl_agent_spark.llm.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        split_leakage_audit,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = a + " " + " ".join(f"extra{i} pad{i} fill{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    cands = jaccard_verify(
        df, lsh_candidate_pairs(minhash_signatures(df))
    ).collect()
    if cands:  # banding did propose the pair
        assert all(c["jaccard"] < 0.5 for c in cands)
        assert split_leakage_audit(df).count() == 0


def test_perplexity_prune_band_matches_numpy(spark):
    """Band membership vs a pure numpy/python reference: same unigram
    micro scores, same linear-interpolated per-lang percentiles."""
    import numpy as np

    from spark_etl_agent_spark.llm.text import perplexity_prune_band

    rows = []
    for i in range(30):
        rows.append((i, f"common common word{i % 5} tail{i}", "en"))
    for i in range(30, 45):
        rows.append((i, f"rare{i} rare{i} unique{i}", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r["avg_logprob_micro"]
        for r in perplexity_prune_band(df).collect()
    }
    # reference
    corpus = Counter()
    toks = {}
    for i, t, _ in rows:
        ws = t.lower().split()
        toks[i] = ws
        corpus.update(ws)
    tot = sum(corpus.values())
    scores = {}
    for i, t, lang in rows:
        lps = [
            math.floor(math.log(corpus[w] / tot) * 1e6) for w in toks[i]
        ]
        scores[i] = (lang, math.floor(sum(lps) / len(lps)))
    keep = {}
    for lang in {l for l, _ in scores.values()}:
        vals = np.array(
            sorted(s for l, s in scores.values() if l == lang), dtype=float
        )
        lo = np.percentile(vals, 10, method="linear")
        hi = np.percentile(vals, 90, method="linear")
        for i, (l, s) in scores.items():
            if l == lang and lo <= s <= hi:
                keep[i] = s
    assert got == keep


def test_dedup_family_agreement_buckets(spark):
    """Composition vs components: bucket counts must equal the
    families computed by running the three pipelines independently;
    a local-overlap-only pair (shared 7+-token run inside otherwise
    different docs) must land in a winnowing-only bucket."""
    from spark_etl_agent_spark.llm.dedup import (
        dedup_family_agreement,
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash_near_pairs,
    )
    from spark_etl_agent_spark.llm.winnow import winnowing_overlap_pairs

    shared_run = "one two three four five six seven eight"
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, shared_run + " " + " ".join(f"left{i} l{i} m{i}" for i in range(12))),
        (4, " ".join(f"right{i} r{i} s{i}" for i in range(12)) + " " + shared_run),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["families"]: r["n_pairs"]
        for r in dedup_family_agreement(df).collect()
    }
    # independent components
    fams = {}
    m = jaccard_verify(df, lsh_candidate_pairs(minhash_signatures(df)))
    for r in m.collect():
        if r["n_common"] * 2 >= (r["n_a"] + r["n_b"] - r["n_common"]):
            fams.setdefault((r["id_a"], r["id_b"]), set()).add("minhash")
    for r in simhash_near_pairs(df).collect():
        fams.setdefault((r["id_a"], r["id_b"]), set()).add("simhash")
    for r in winnowing_overlap_pairs(df).collect():
        fams.setdefault((r["doc_a"], r["doc_b"]), set()).add("winnowing")
    ref = Counter("+".join(sorted(s)) for s in fams.values())
    assert got == dict(ref)
    # the (3,4) local-overlap pair is invisible to the whole-document
    # families but found by winnowing's local-match guarantee
    assert fams[(3, 4)] == {"winnowing"}
    assert "winnowing" in got and got["winnowing"] >= 1


def test_bpe_fertility_exact_integer_math(spark):
    from pyspark.sql import functions as F2

    from spark_etl_agent_spark.llm.bpe import bpe_encode_stats, bpe_train

    rows = [
        (1, "banana band bandana", "en"),
        (2, "banana banana", "en"),
        (3, "ananas bananas", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    _, merges = bpe_train(df, n_merges=4)
    stats = {r["doc_id"]: r.asDict() for r in bpe_encode_stats(df, merges).collect()}
    by_lang = {}
    for i, _, lang in rows:
        d = by_lang.setdefault(lang, dict(n=0, w=0, c=0, t=0))
        d["n"] += 1
        d["w"] += stats[i]["n_words"]
        d["c"] += stats[i]["n_chars_m"]
        d["t"] += stats[i]["n_bpe_tokens"]
    from spark_etl_agent_spark.queries.text import bpe_fertility_by_lang  # noqa: F401

    got = (
        bpe_encode_stats(df, merges)
        .join(df.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F2.count(F2.lit(1)).alias("n_docs"),
            F2.sum("n_words").alias("w"),
            F2.sum("n_chars_m").alias("c"),
            F2.sum("n_bpe_tokens").alias("t"),
        )
        .collect()
    )
    for r in got:
        d = by_lang[r["lang"]]
        assert (r["n_docs"], r["w"], r["c"], r["t"]) == (
            d["n"], d["w"], d["c"], d["t"],
        )
        assert (d["t"] * 1_000_000) // d["w"] == (r["t"] * 1_000_000) // r["w"]


def test_minhash_estimate_error_exact_fields(spark):
    """Estimated vs exact Jaccard: identical docs estimate 1.0 with 0
    error; the estimate equals matching-signature-positions/8 in exact
    ppm, cross-checked against directly collected signatures."""
    from spark_etl_agent_spark.llm.dedup import (
        minhash_estimate_error,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(1, base), (2, base), (3, base + " with a different tail here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {(r["id_a"], r["id_b"]): r.asDict()
            for r in minhash_estimate_error(df).collect()}
    assert rows[(1, 2)]["est_jaccard_ppm"] == 1_000_000
    assert rows[(1, 2)]["exact_jaccard_ppm"] == 1_000_000
    assert rows[(1, 2)]["abs_err_ppm"] == 0
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)]
            for r in minhash_signatures(df).collect()}
    for (a, b), r in rows.items():
        matches = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        assert r["est_jaccard_ppm"] == matches * 1_000_000 // 8
        assert r["abs_err_ppm"] == abs(
            r["est_jaccard_ppm"] - r["exact_jaccard_ppm"]
        )


def test_pq_adc_topk_matches_numpy_reference(spark):
    """ADC ranking vs a numpy reference that re-implements the whole
    chain (scaled grid, per-subspace nearest-seed codes, floor-mean
    centroid refinement, exact integer ADC sums)."""
    import numpy as np

    from spark_etl_agent_spark.llm.quantize import pq_adc_topk

    rng = np.random.RandomState(7)
    n, dim, m, k, qib, topk = 30, 64, 4, 8, 4, 5
    vecs = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["qid"], r["vec_id"], r["adc_dist"], r["rnk"])
        for r in pq_adc_topk(df, query_ids_below=qib, topk=topk).collect()
    ]
    # numpy reference
    sv = np.floor(vecs.astype(np.float64) * 1_000_000)
    d_sub = dim // m
    ref_rows = []
    codes = np.zeros((n, m), dtype=int)
    cents = {}
    for j in range(m):
        sub = sv[:, j * d_sub : (j + 1) * d_sub]
        seeds = sub[:k]  # k lowest ids
        d2 = ((sub[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)  # ties -> lower cell (argmin)
        for cell in range(k):
            members = sub[codes[:, j] == cell]
            if len(members):
                cents[(j, cell)] = np.floor(
                    members.sum(axis=0) / len(members)
                )
    for q in range(qib):
        dists = {}
        for x in range(n):
            if x == q:
                continue
            s = 0
            for j in range(m):
                c = cents[(j, codes[x, j])]
                qs = sv[q, j * d_sub : (j + 1) * d_sub]
                s += int(((qs - c) ** 2).sum())
            dists[x] = s
        ranked = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:topk]
        for rnk, (x, s) in enumerate(ranked, 1):
            ref_rows.append((q, x, s, rnk))
    assert sorted(got) == sorted(ref_rows)


def test_source_overlap_matrix_finds_planted_copy(spark):
    """A 10-token run copied between feeds A and B must dominate the
    (A, B) cell; a feed with no shared runs must produce no pair row;
    a gram present in EVERY doc (over the df cap) must not count."""
    from spark_etl_agent_spark.llm.spans import source_overlap_matrix

    copied = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(5):
        rows.append((i, copied + f" filler{i} pad{i}", "feedA"))
    rows.append((10, copied + " other tail here now", "feedB"))
    rows.append((20, " ".join(f"solo{i} x{i} y{i}" for i in range(10)), "feedC"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["src_a"], r["src_b"]): r.asDict()
           for r in source_overlap_matrix(df, max_doc_df=20).collect()}
    assert ("feedA", "feedB") in out
    ab = out[("feedA", "feedB")]
    assert ab["shared_hashes"] >= 3  # the copied run's 8-gram windows
    assert ab["overlap_ppm"] > 0
    assert not any("feedC" in k for k in out)
    # df cap: with max_doc_df=1 nothing is shared evidence (the copied
    # grams appear in 6 docs)
    capped = source_overlap_matrix(df, max_doc_df=1).collect()
    assert capped == []


def test_pq_adc_recall_consistent_with_components(spark):
    """The recall report must equal the overlap of its two component
    rankings computed independently."""
    import numpy as np

    from spark_etl_agent_spark.llm.quantize import pq_adc_recall, pq_adc_topk

    rng = np.random.RandomState(3)
    n, dim = 40, 64
    vecs = rng.uniform(-1, 1, (n, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    report = {r["query_id"]: r.asDict() for r in pq_adc_recall(df).collect()}
    adc = {}
    for r in pq_adc_topk(df).collect():
        adc.setdefault(r["qid"], set()).add(r["vec_id"])
    sv = np.floor(vecs.astype(np.float64) * 1_000_000)
    for q in range(8):
        d = ((sv - sv[q]) ** 2).sum(axis=1)
        order = sorted((dist, i) for i, dist in enumerate(d) if i != q)
        exact = {i for _, i in order[:5]}
        rep = report[q]
        assert rep["n_exact"] == 5 and rep["n_pq"] == 5
        assert rep["n_common"] == len(exact & adc[q])
        assert rep["recall_ppm"] == rep["n_common"] * 1_000_000 // 5


# ---------------------------------------------------------------------------
# embedding_outlier_report


def _lloyd_reference(vecs, k=2, iters=2):
    """Pure-Python replay of the deterministic Lloyd trainer: scaled
    components, max-cosine assignment (tie -> lower cell), floor-mean
    centroid update, seeds = k smallest ids."""
    import math

    sv = {i: [math.floor(x * 1e6) for x in v] for i, v in vecs.items()}
    norm = {i: sum(x * x for x in v) for i, v in sv.items()}
    cents = {
        i: (sv[i], norm[i]) for i in sorted(sv)[:k]
    }
    assign = {}
    for _ in range(iters):
        for i, v in sv.items():
            best = max(
                (
                    (
                        sum(a * b for a, b in zip(v, cv))
                        / (math.sqrt(norm[i]) * math.sqrt(cn)),
                        -cell,
                    )
                    for cell, (cv, cn) in cents.items()
                ),
            )
            assign[i] = -best[1]
        cents = {}
        for cell in set(assign.values()):
            members = [i for i in sv if assign[i] == cell]
            dim = len(next(iter(sv.values())))
            cv = [
                float(
                    math.floor(
                        sum(sv[i][d] for i in members) / len(members)
                    )
                )
                for d in range(dim)
            ]
            cents[cell] = (cv, sum(x * x for x in cv))
    return assign, cents


def test_embedding_outlier_report_matches_python_reference(spark):
    import math
    import random

    from spark_etl_agent_spark.llm.kmeans import outlier_report

    rng = random.Random(13)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(20)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # replay with the same float32-rounded inputs Spark reads
    import struct

    f32 = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    assign, cents = _lloyd_reference(f32, k=2, iters=2)
    sv = {i: [math.floor(x * 1e6) for x in v] for i, v in f32.items()}
    norm = {i: sum(x * x for x in v) for i, v in sv.items()}
    want = []
    for cell, (cv, cn) in cents.items():
        members = sorted(i for i in sv if assign[i] == cell)
        scored = sorted(
            (
                sum(a * b for a, b in zip(sv[i], cv))
                / (math.sqrt(norm[i]) * math.sqrt(cn)),
                i,
            )
            for i in members
        )
        for r, (cos, i) in enumerate(scored[:3], start=1):
            want.append((cell, i, r, cos, len(members)))

    got = sorted(
        tuple(r)
        for r in outlier_report(df, k=2, iters=2, bottom_n=3).collect()
    )
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# histogram_quantile_report


def test_histogram_quantile_report_matches_python_reference(spark):
    import math
    import random

    from spark_etl_agent_spark.operators.sketches import (
        histogram_quantile_report,
    )

    rng = random.Random(29)
    rows = [
        ("a", rng.randrange(0, 10_000)) for _ in range(400)
    ] + [("b", rng.randrange(5_000, 50_000)) for _ in range(250)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r.grp, r.q_pct): r
        for r in histogram_quantile_report(df, "grp", "v", nbuckets=16).collect()
    }

    nb = 16
    allv = [v for _, v in rows]
    vmin, vmax = min(allv), max(allv)
    R = vmax - vmin + 1
    for grp in ("a", "b"):
        vs = sorted(v for g, v in rows if g == grp)
        n = len(vs)
        hist = {}
        for v in vs:
            b = (v - vmin) * nb // R
            hist[b] = hist.get(b, 0) + 1
        for q_pct, q in ((50, 0.5), (90, 0.9), (99, 0.99)):
            # exact: (n-1)q interpolation
            h = (n - 1) * q
            lo, hi = vs[math.floor(h)], vs[min(math.floor(h) + 1, n - 1)]
            exact = lo + (h - math.floor(h)) * (hi - lo)
            # sketch: cumulate to rank t, interpolate in the bucket
            t = math.floor(h) + 1
            cum = 0
            for b in sorted(hist):
                if cum + hist[b] >= t:
                    bw = R / nb
                    est = vmin + b * bw + ((t - cum) / hist[b]) * bw
                    break
                cum += hist[b]
            r = got[(grp, q_pct)]
            assert r.n_values == n
            assert r.est_cents == pytest.approx(est, abs=1e-9)
            assert r.exact_cents == pytest.approx(exact, abs=1e-9)
            assert r.err_cents == pytest.approx(est - exact, abs=1e-9)
            # a 16-bucket sketch over a ~10k-wide range lands within
            # one bucket width of the exact value
            assert abs(r.err_cents) <= R / nb
