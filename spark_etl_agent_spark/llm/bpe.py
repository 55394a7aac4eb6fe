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
    # The vocabulary build (corpus-wide explode + word groupBy) is the
    # distributed part and keeps the session's full shuffle width. The
    # ITERATIVE part then runs on the aggregated vocabulary — a
    # frequency table that is KB-MB even for a 100 TB corpus — so it is
    # repartitioned to ONE partition first: every training round
    # becomes a single-task job instead of paying scheduler+shuffle
    # latency per round on sketch-sized data (measured ~2x on the
    # 6-round loop; any real BPE trainer is single-node at this stage).
    vocab = (
        build_symbol_vocab(df, text_col).repartition(1).localCheckpoint()
    )
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
        # sparse checkpoint bounds plan growth for deep trainings
        # without paying a vocabulary-materialization job per few
        # rounds (each localCheckpoint is its own Spark job — at small
        # n_merges that job latency dominated the whole training loop)
        if (round_no + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
    table = spark.createDataFrame(
        [
            (i + 1, left, right, left + right, n)
            for i, (left, right, n) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, merged string, n_occurrences long",
    )
    return table, merges


# Each merge adds one nested higher-order-function layer to the encode
# expression; past a few dozen layers the Catalyst tree (analysis /
# codegen) grows beyond what a projection should carry, so larger merge
# tables route to the Arrow path automatically.
MAX_EXPR_MERGES = 64


def _merge_pass(arr, left: str, right: str):
    """One full left-to-right non-overlapping pass of a single merge
    over a symbol array — the exact greedy order of the trainer's
    anchored ``regexp_replace``, expressed as an array fold with plain
    string equality (no per-word regex scan). After a merge fires the
    accumulated tail is the merged token, which can never equal
    ``left`` again (it is strictly longer), so overlap is impossible —
    same non-overlap guarantee the regex continuation gives."""
    merged = left + right
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (→ branch not taken) on the empty
            # accumulator instead of ANSI-mode's index error
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode_stats(
    df: DataFrame,
    merges: List[Tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to every document and report per-doc
    tokenization stats: ``(id, n_words, n_chars, n_bpe_tokens,
    compression_ratio)``.

    Two engines, one contract (equality pinned in
    ``tests/test_operators.py``):

    - ``len(merges) <= MAX_EXPR_MERGES``: the merge replay (char-split
      then each merge in rank order as an array fold, ``_merge_pass``)
      runs once per DISTINCT word, not once per occurrence — a
      tokenizer's per-word encode depends only on the word, and a
      corpus repeats its vocabulary relentlessly, so the fold's cost
      is vocabulary-sized while the corpus side is a plain
      explode → broadcast-join → per-doc aggregate (two bounded uniform
      shuffles: the distinct and the doc-key agg; the join itself is
      broadcast, vocabularies are the canonical broadcast dim). At
      sf0.1 this cut the encode 3.2 s → ~0.9 s with identical output;
      at 100 TB it replaces O(corpus) fold work with O(vocab).
    - larger merge tables (a real 30k+ BPE vocab): an Arrow-batched
      ``mapInPandas`` encode with the merge ranks as a broadcast-sized
      Python dict and per-batch word memoization — a vocab-deep
      Catalyst expression tree would blow up analysis/codegen, so the
      mechanism switches rather than the contract."""
    if len(merges) > MAX_EXPR_MERGES:
        return _bpe_encode_stats_arrow(df, merges, text_col, id_col)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(words_of(F.col(text_col)), lambda w: F.length(w) >= 1)
        ).alias("__w"),
    )
    sym = F.split(F.col("__w"), "(?!^)(?=.)")
    for left, right, _n in merges:
        sym = _merge_pass(sym, left, right)
    wcounts = (
        toks.select("__w")
        .distinct()
        .select(
            "__w",
            F.length("__w").cast("long").alias("__wlen"),
            F.size(sym).cast("long").alias("__wtoks"),
        )
    )
    # docs with zero length>=1 words emit NO row (mirrors the oracle's
    # unnest-then-group shape and avoids a 0/0 chars_per_token)
    return (
        toks.join(F.broadcast(wcounts), "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__wlen").alias("n_chars_m"),
            F.sum("__wtoks").alias("n_bpe_tokens"),
        )
        .select(
            F.col(id_col),
            "n_words",
            "n_chars_m",
            "n_bpe_tokens",
            (
                F.col("n_chars_m").cast("double") / F.col("n_bpe_tokens")
            ).alias("chars_per_token"),
        )
    )


def _encode_token_count(word: str, ranks: dict) -> int:
    """Token count for one word under rank-priority BPE (GPT-2 encode
    shape: repeatedly merge every occurrence of the lowest-ranked pair
    present). For a merge list produced by BPE *training* this is
    equivalent to replaying the merges as sequential full passes —
    merge k's constituents can only be produced by merges < k — which
    is the order the expression engine and the DuckDB oracle use;
    equality is pinned by test at the trained-merges case."""
    symbols = list(word)
    while len(symbols) >= 2:
        best = None
        best_rank = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (symbols[i], symbols[i + 1])
        if best is None:
            break
        left, right = best
        out = []
        i = 0
        while i < len(symbols):
            if (
                i + 1 < len(symbols)
                and symbols[i] == left
                and symbols[i + 1] == right
            ):
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return len(symbols)


def _bpe_encode_stats_arrow(
    df: DataFrame,
    merges: List[Tuple[str, str, int]],
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Arrow-batched encode for vocab-scale merge tables. The ranks
    dict is bounded (the shipped tokenizer artifact, ~MBs) and rides
    task serialization; distinct words repeat heavily in natural text,
    so a per-batch memo makes the encode ~O(distinct words)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ranks = {(l, r): i for i, (l, r, *_rest) in enumerate(merges)}
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("n_words", LongType()),
            StructField("n_chars_m", LongType()),
            StructField("n_bpe_tokens", LongType()),
            StructField("chars_per_token", DoubleType()),
        ]
    )
    ws_re = re.compile(r"\s+")

    def encode_batches(batches):
        import pandas as pd

        memo: dict = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in ws_re.split((text or "").lower()) if w]
                if not ws:
                    continue
                n_chars = sum(len(w) for w in ws)
                n_bpe = 0
                for w in ws:
                    c = memo.get(w)
                    if c is None:
                        c = _encode_token_count(w, ranks)
                        memo[w] = c
                    n_bpe += c
                rows.append(
                    (doc_id, len(ws), n_chars, n_bpe, n_chars / n_bpe)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_words",
                    "n_chars_m",
                    "n_bpe_tokens",
                    "chars_per_token",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(encode_batches, out_schema)
