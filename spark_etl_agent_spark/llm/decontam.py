"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

Standard pretraining hygiene (the GPT-3/PaLM "13-gram overlap" check):
any training document containing an n-gram that also appears in an eval
benchmark is contaminated — evaluating on that benchmark would measure
memorization, not generalization. The reference engine has no analogue;
this is part of the LLM-pipeline extension surface (SURVEY.md §7).

Scale shape (the reason this is written the way it is):

- the benchmark side is small by construction (eval sets are KB-MB
  against a 100 TB corpus), so its distinct n-gram set is **broadcast**
  — the corpus side streams through a broadcast hash join and never
  shuffles for the membership probe;
- per-document totals/matches are ONE aggregation keyed by the document
  id (uniform key, map-side partial) — the only shuffle in the plan;
- n-gram construction is a pure JVM-side array expression
  (``transform(sequence(...))``), whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_of


def doc_ngrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, ngram) rows. ``array_distinct`` before the explode
    makes the output globally distinct per document with zero shuffle
    (same trick as ``dedup.shingle_table``)."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_of(F.col(text_col), k=n))
        ).alias("ngram"),
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    train_ngrams: DataFrame = None,
) -> DataFrame:
    """Per-training-document contamination report against a benchmark.

    Returns one row per training document that has at least one n-gram:
    ``(id, n_total_m, n_matched_m, contamination_ratio)`` where
    ``n_matched_m`` counts distinct n-grams also present anywhere in
    ``bench``. The ratio is one IEEE division of two exact longs —
    bit-deterministic across engines and partitionings.

    The benchmark n-gram set is deduplicated and broadcast; documents
    with fewer than ``n`` words produce no row (no n-grams → nothing to
    check — callers wanting them report ``n_total_m = 0`` via a left
    join from the corpus).

    Pass ``train_ngrams`` (a distinct ``(id, ngram)`` frame for exactly
    the ``train`` documents — e.g. a persisted ``dedup.shingle_table``
    restricted to the training ids, renamed to ``ngram``) to skip the
    train-side tokenize + explode entirely; only the column contract is
    the caller's responsibility, the probe/aggregate shape is unchanged.
    """
    t = (
        train_ngrams
        if train_ngrams is not None
        else doc_ngrams(train, text_col, id_col, n)
    )
    b = doc_ngrams(bench, text_col, id_col, n).select("ngram").distinct()
    # LEFT broadcast join + conditional count: one pass, one shuffle
    # (the per-doc agg). A left_semi would need a second join for the
    # totals.
    hits = t.join(
        F.broadcast(b.withColumn("__hit", F.lit(1))), "ngram", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_total_m"),
            F.count("__hit").alias("n_matched_m"),
        )
        .select(
            F.col(id_col),
            "n_total_m",
            "n_matched_m",
            (
                F.col("n_matched_m").cast("double") / F.col("n_total_m")
            ).alias("contamination_ratio"),
        )
    )


def semantic_contamination(
    emb: DataFrame,
    probe_ids_below: int = 8,
    min_cosine: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space decontamination — the contamination the n-gram
    check CANNOT see: a paraphrased or translated benchmark item
    shares no 13-gram with its source but sits next to it in embedding
    space. Every corpus vector whose cosine to ANY benchmark probe
    (``vec_id < probe_ids_below``) reaches ``min_cosine`` is flagged
    with its nearest probe and the exact similarity.

    Shape: the benchmark side is broadcast by construction (eval sets
    are KB–MB against a 100 TB corpus) — one scan of the corpus
    against the broadcast probe set, argmax via a per-vector struct
    max (no window shuffle), threshold filter last so the plan is
    scan-bound. Same scaled-integer cosine contract as
    ``llm.similarity`` (bit-identical to the SQL oracle).
    """
    from .similarity import cosine, dot, with_scaled_and_norm

    base = with_scaled_and_norm(emb, vec_col, id_col)
    probes = F.broadcast(
        base.filter(F.col(id_col) < probe_ids_below).select(
            F.col(id_col).alias("bench_id"),
            F.col("svec").alias("b_svec"),
            F.col("norm_sq").alias("b_norm"),
        )
    )
    pairs = (
        base.filter(F.col(id_col) >= probe_ids_below)
        .join(probes)
        .select(
            F.col(id_col),
            F.col("bench_id"),
            cosine(
                dot(F.col("svec"), F.col("b_svec")),
                F.col("norm_sq"),
                F.col("b_norm"),
            ).alias("cos"),
        )
    )
    best = pairs.groupBy(id_col).agg(
        F.max(F.struct(F.col("cos"), (-F.col("bench_id")).alias("negb"))).alias(
            "_best"
        )
    )
    return (
        best.select(
            id_col,
            (-F.col("_best.negb")).cast("long").alias("bench_id"),
            F.col("_best.cos").alias("max_cosine"),
        )
        .filter(F.col("max_cosine") >= min_cosine)
    )
