"""Gopher rule battery (Rae et al. 2021 Tables A1/A2): the corpus
fixture has no newlines or punctuation, so the line/symbol rules are
pinned here against multi-line handcrafted documents plus a pure-Python
reference for every repetition signal."""

import pytest
from pyspark.sql import functions as F


def _quality(spark, rows):
    from spark_etl_agent_spark.llm.text import gopher_quality_rules

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in gopher_quality_rules(df).collect()}


def _repetition(spark, rows):
    from spark_etl_agent_spark.llm.text import gopher_repetition_rules

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r.asDict() for r in gopher_repetition_rules(df).collect()
    }


GOOD = (
    "the quick brown fox jumps over a lazy dog and that old cat have "
    "been with us for many long years while they watch birds from the "
    "garden wall and wonder about the wide world beyond the fence that "
    "keeps them safe from harm every single day of their quiet lives "
    "together in peace"
)


def test_passing_document(spark):
    out = _quality(spark, [(1, GOOD)])[1]
    assert out["n_words"] >= 50
    assert out["ok_word_count"] and out["ok_mean_word_len"]
    assert out["ok_symbol_ratio"] and out["ok_alpha_words"]
    assert out["ok_stopwords"] and out["passes_gopher"]


def test_word_count_and_stopword_gates(spark):
    out = _quality(spark, [(1, "tiny doc"), (2, "zzz qqq xxx " * 20)])
    assert not out[1]["ok_word_count"] and not out[1]["passes_gopher"]
    # 60 words but none of the 8 Gopher stop words
    assert out[2]["ok_word_count"] and not out[2]["ok_stopwords"]


def test_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(["- item %d" % i for i in range(10)])
    dots = "first line ends...\nplain line"
    out = _quality(spark, [(1, bullets), (2, dots)])
    assert out[1]["bullet_line_ppm"] == 1_000_000
    assert not out[1]["ok_bullet_lines"]
    assert out[2]["ellipsis_line_ppm"] == 500_000
    assert not out[2]["ok_ellipsis_lines"]


def test_symbol_and_alpha_rules(spark):
    out = _quality(spark, [(1, "# # # tag"), (2, "123 456 789 abc")])
    # 3 '#' over 4 words = 750000 ppm
    assert out[1]["symbol_ratio_ppm"] == 750_000
    assert not out[1]["ok_symbol_ratio"]
    # 1 of 4 words contains a letter
    assert out[2]["alpha_word_ppm"] == 250_000
    assert not out[2]["ok_alpha_words"]


def test_ellipsis_counted_non_overlapping(spark):
    # 'a...... b' = 6 dots = two non-overlapping '...' over 2 words
    out = _quality(spark, [(1, "a...... b")])[1]
    assert out["symbol_ratio_ppm"] == 1_000_000


def _rep_reference(text):
    """Pure-Python mirror of every repetition signal."""
    from collections import Counter

    n_chars = len(text)
    lines = text.split("\n")
    lc = Counter(lines)
    l_items, l_distinct = len(lines), len(lc)
    l_dup = sum(c * len(v) for v, c in lc.items() if c >= 2)
    l_tot = sum(c * len(v) for v, c in lc.items())
    words = text.lower().split()
    out = {
        "n_chars": n_chars,
        "n_lines": l_items,
        "dup_line_ppm": (l_items - l_distinct) * 1_000_000 // l_items,
        "dup_line_char_ppm": l_dup * 1_000_000 // max(l_tot, 1),
    }
    for n, key, mode in (
        (2, "top2gram_char_ppm", "top"),
        (3, "top3gram_char_ppm", "top"),
        (4, "top4gram_char_ppm", "top"),
        (5, "dup5gram_char_ppm", "dup"),
        (10, "dup10gram_char_ppm", "dup"),
    ):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        if mode == "top":
            top = max((c * len(g) for g, c in grams.items()), default=0)
            out[key] = top * 1_000_000 // max(n_chars, 1)
        else:
            dup = sum(c * len(g) for g, c in grams.items() if c >= 2)
            out[key] = min(dup * 1_000_000 // max(n_chars, 1), 1_000_000)
    return out


REP_DOCS = [
    (1, "a b a b a b"),
    (2, "x\nx\ny"),
    (3, GOOD),
    (4, "one two three four five one two three four five six seven"),
    (5, "w " * 30 + "w"),
]


def test_repetition_matches_pure_python(spark):
    got = _repetition(spark, REP_DOCS)
    for doc_id, text in REP_DOCS:
        ref = _rep_reference(text)
        for k, v in ref.items():
            assert got[doc_id][k] == v, (doc_id, k, got[doc_id][k], v)


def test_repetition_flags(spark):
    got = _repetition(spark, REP_DOCS)
    # 'a b a b a b': top 2-gram 'a b' covers 9/11 chars
    assert got[1]["top2gram_char_ppm"] == 818_181
    assert not got[1]["ok_top2gram"] and not got[1]["passes_repetition"]
    # duplicate line 'x' twice over three lines
    assert got[2]["dup_line_ppm"] == 333_333
    assert not got[2]["ok_dup_lines"]
    # natural prose passes everything
    assert got[3]["passes_repetition"]
    # degenerate single-word loop: dup coverage caps at 100%
    assert got[5]["dup10gram_char_ppm"] == 1_000_000
    assert not got[5]["passes_repetition"]


# --- Count-Min sketch (operators/sketches.py::countmin_sketch_report) ---


def _cms_reference(tokens, depth=4, width=256, topn=20):
    import hashlib
    from collections import Counter

    def bucket(r, w):
        return int(hashlib.md5(f"{r}|{w}".encode()).hexdigest()[:8], 16) % width

    counts = Counter(tokens)
    cells = Counter()
    for w, c in counts.items():
        for r in range(depth):
            cells[(r, bucket(r, w))] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]
    return {
        w: (c, min(cells[(r, bucket(r, w))] for r in range(depth)))
        for w, c in top
    }


def test_countmin_matches_pure_python(spark):
    from spark_etl_agent_spark.operators.sketches import countmin_sketch_report

    import random

    rng = random.Random(5)
    vocab = [f"tok{i}" for i in range(40)]
    tokens = [rng.choice(vocab) for _ in range(3000)]
    df = spark.createDataFrame([(t,) for t in tokens], ["w"])
    got = {
        r["token"]: (r["exact_count"], r["cms_estimate"])
        for r in countmin_sketch_report(df, "w").collect()
    }
    assert got == _cms_reference(tokens)


def test_countmin_one_sided_error(spark):
    """CMS guarantees estimate >= exact; a lone value in a tiny grid
    still reads exact when nothing collides with all 4 of its rows."""
    from spark_etl_agent_spark.operators.sketches import countmin_sketch_report

    df = spark.createDataFrame([("only",)] * 7, ["w"])
    rows = countmin_sketch_report(df, "w").collect()
    assert len(rows) == 1
    assert rows[0]["exact_count"] == rows[0]["cms_estimate"] == 7
    assert rows[0]["overestimate"] == 0

    import random

    rng = random.Random(9)
    many = [(f"v{rng.randrange(500)}",) for _ in range(5000)]
    out = countmin_sketch_report(spark.createDataFrame(many, ["w"]),
                                 "w", width=64).collect()
    assert all(r["overestimate"] >= 0 for r in out)
