"""Iterative BPE tokenizer training over a distributed corpus.

``llm.text.bpe_pair_counts`` is one counting round; this module runs
the real loop: count adjacent symbol pairs over the weighted
vocabulary, merge the globally most frequent pair, re-segment, repeat.
The output is the ordered merge table — exactly what a BPE tokenizer
ships as its ``merges.txt``.

Scale shape per round (same physics as ``llm.kmeans`` Lloyd rounds):

- pair counting: one bounded shuffle (pair keys ≤ |alphabet ∪ merges|²)
  over the *vocabulary* (distinct words × frequency), not the corpus —
  the corpus is scanned exactly once, at vocabulary build.
- the winning pair is a **one-row collect** (a scalar envelope, like
  the k-means convergence check — never data rows).
- re-segmentation is a native ``regexp_replace`` over the vocabulary;
  ``localCheckpoint`` per round truncates the growing lineage.

Determinism: ties on pair count break on the pair string, so the merge
sequence is reproducible at any partition count. Verified against a
pure-Python reference implementation in ``tests/test_operators.py``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words_of


def build_symbol_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols, wfreq): each distinct word as space-separated initial
    symbols (characters), weighted by corpus frequency."""
    return (
        df.select(F.explode(words_of(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wfreq"))
        .select(
            # split between characters only: not at start (?!^) and not
            # at end (?=.) — Spark's split keeps trailing empties, so a
            # bare (?!^) would leave a phantom empty symbol per word
            F.array_join(F.split(F.col("word"), "(?!^)(?=.)"), " ").alias(
                "symbols"
            ),
            "wfreq",
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    # single-symbol (fully merged) words contribute no pairs — and
    # sequence(1, 0) counts DOWN in Spark, so they must not reach the
    # transform at all
    toks = vocab.select(F.split("symbols", " ").alias("t"), "wfreq").filter(
        F.size("t") >= 2
    )
    return (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(t[i-1], ' ', t[i]))"
                )
            ).alias("pair"),
            "wfreq",
        )
        .groupBy("pair")
        .agg(F.sum("wfreq").alias("n"))
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> Tuple[DataFrame, List[Tuple[str, str, int]]]:
    """Train ``n_merges`` BPE merges; returns (merge table DataFrame,
    the same merges as a Python list). Stops early if no pair occurs
    more than once."""
    spark = df.sparkSession
    vocab = build_symbol_vocab(df, text_col).localCheckpoint()
    merges: List[Tuple[str, str, int]] = []
    for round_no in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()  # one row — the round's winner, a scalar envelope
        )
        if not top or top[0]["n"] < 2:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        left, right = pair.split(" ")
        merges.append((left, right, n))
        # whole-token replace: "left right" bounded by start/space/end;
        # Java regex replaces left-to-right non-overlapping — the same
        # greedy order reference BPE implementations use
        pattern = f"(^|(?<= )){re.escape(left)} {re.escape(right)}((?= )|$)"
        vocab = vocab.select(
            F.regexp_replace("symbols", pattern, left + right).alias("symbols"),
            "wfreq",
        )
        # each round adds ONE cheap projection to the lineage, so a
        # checkpoint every few rounds bounds plan growth without paying
        # a vocabulary materialization per round
        if (round_no + 1) % 3 == 0:
            vocab = vocab.localCheckpoint()
    table = spark.createDataFrame(
        [
            (i + 1, left, right, left + right, n)
            for i, (left, right, n) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, merged string, n_occurrences long",
    )
    return table, merges


def bpe_encode_stats(
    df: DataFrame,
    merges: List[Tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to every document and report per-doc
    tokenization stats: ``(id, n_words, n_chars, n_bpe_tokens,
    compression_ratio)``.

    The encode is ONE codegen'd projection — per word, char-split into
    symbols then the merges replayed in rank order with the same
    anchored whole-token ``regexp_replace`` the trainer uses (greedy
    left-to-right non-overlapping, the reference BPE order). Zero
    shuffle: at 100 TB this is scan-bound, embarrassingly parallel —
    exactly how a tokenizer pass over a corpus must behave. The merge
    list is a bounded artifact (vocab-sized), embedded as literals the
    same way the k-means codebook assignment is."""
    words = F.filter(words_of(F.col(text_col)), lambda w: F.length(w) >= 1)
    sym = F.transform(
        words, lambda w: F.array_join(F.split(w, "(?!^)(?=.)"), " ")
    )
    # factory binds each round's pattern (PySpark introspects lambda
    # arity, so default-arg binding would read as a 3-arg lambda)
    def _apply_merge(p: str, m: str):
        return lambda s: F.regexp_replace(s, p, m)

    for left, right, _n in merges:
        pat = f"(^|(?<= )){re.escape(left)} {re.escape(right)}((?= )|$)"
        sym = F.transform(sym, _apply_merge(pat, left + right))
    tok_counts = F.transform(sym, lambda s: F.size(F.split(s, " ")))
    n_words = F.size(words).cast("long")
    n_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_bpe = F.aggregate(
        tok_counts, F.lit(0).cast("long"), lambda acc, c: acc + c
    )
    # docs with zero length>=1 words emit NO row (mirrors the oracle's
    # unnest-then-group shape and avoids a 0/0 chars_per_token)
    return (
        df.select(
            F.col(id_col),
            n_words.alias("n_words"),
            n_chars.alias("n_chars_m"),
            n_bpe.alias("n_bpe_tokens"),
            (n_chars.cast("double") / n_bpe).alias("chars_per_token"),
        )
        .filter(F.col("n_words") > 0)
    )
