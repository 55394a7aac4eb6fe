"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03
— the MOSS algorithm).

Third fingerprinting family next to MinHash (``llm.dedup``) and
SimHash: winnowing selects, from every window of ``w`` consecutive
``k``-gram hashes, the window's minimum hash — guaranteeing that any
shared substring of length ``w + k - 1`` tokens contributes at least
one IDENTICAL selected fingerprint in both documents (the paper's
local-match guarantee, which MinHash's whole-document sketches cannot
give). Downstream, fingerprint equality joins find local overlap.

Scale shape: ``k``-gram hashing is a per-row projection; the window
minima partition by document (no partition ever exceeds one document's
span count); selection is decided by a SECOND window pass over the
same per-document sort — one exchange total, no join, no explode —
see ``winnowing_fingerprints`` for the equivalence argument. Selected
density is ~2/(w+1) of spans, so the fingerprint table SHRINKS
relative to the corpus as w grows.

Hashes are the first 8 md5 hex digits as int64 — the repo's standard
cross-engine integer-hash idiom (``llm.text.linear_quality_score``),
bit-identical in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 4  # tokens per gram
DEFAULT_W = 4  # grams per winnowing window


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Selected fingerprints per document: ``(id_col, pos, fp)``.

    A span position ``p`` is selected iff its hash equals the minimum
    of SOME valid window covering it (valid starts: ``s ∈ [0,
    max(n_spans - w, 0)]`` — a document with fewer than ``w`` spans
    gets one truncated window over all of them). Hash ties select
    every tied position in the window — a pure set definition with no
    order-of-evaluation dependence, so Spark and the SQL oracle agree
    exactly.

    Selection is computed join-free (guide §2.4 — remove shuffles
    outright): since every covering window contains ``p``, its minimum
    is ≤ ``h[p]``, so "∃ a valid covering start ``s`` with
    ``win_min(s) = h[p]``" is equivalent to "MAX of ``win_min`` over
    the valid covering starts ``s ∈ [p-w+1, p] ∩ [0, S]`` equals
    ``h[p]``" — a second window pass (backward frame, invalid starts
    masked to NULL which MAX skips) over the SAME per-document sort.
    Every position has ≥ 1 valid covering start (``p-w+1 ≤ S`` always
    holds for ``p ≤ n_spans-1``), so the mask never empties a frame.
    The previous shape re-derived the span table on both sides of a
    (doc, pos, hash) semi-join and paid an explode(×w) + DISTINCT in
    between — two tokenize passes and three exchanges where one
    exchange suffices.
    """
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), x -> length(x) >= 1)"
    )
    spans = (
        docs.select(F.col(id_col), words.alias("__words"))
        .filter(F.size("__words") >= k)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(__words) - {k}), "
                    f"i -> array_join(slice(__words, i + 1, {k}), ' '))"
                )
            ).alias("pos", "gram"),
        )
        .select(
            id_col,
            "pos",
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    w_doc = Window.partitionBy(id_col)
    w_fwd = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    w_bwd = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    annotated = (
        spans.withColumn("win_min", F.min("h").over(w_fwd))
        .withColumn("n_spans", F.count(F.lit(1)).over(w_doc))
        .withColumn(
            "_valid_min",
            F.when(
                F.col("pos") <= F.greatest(F.col("n_spans") - w, F.lit(0)),
                F.col("win_min"),
            ),
        )
    )
    return (
        annotated.withColumn("_cover_max", F.max("_valid_min").over(w_bwd))
        .filter(F.col("_cover_max") == F.col("h"))
        .select(id_col, "pos", F.col("h").alias("fp"))
    )


def winnowing_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    max_df: int = 20,
    min_shared: int = 2,
) -> DataFrame:
    """Local-overlap detection on winnowing fingerprints: pairs of
    documents sharing ``min_shared``+ selected fingerprints, scored by
    ``overlap_ppm = shared_fp·1e6 / min(n_fp_a, n_fp_b)`` (exact
    integer ppm). The local-match guarantee makes shared fingerprints
    EVIDENCE of a shared ≥ ``w + k - 1``-token substring — plagiarism /
    boilerplate-overlap semantics, not whole-document similarity.

    Scale shape (the inverted-index blocking of ``ngram_jaccard``):
    pairing joins only on fingerprints with ``2 ≤ df ≤ max_df`` — the
    df cap is part of the operator contract (a fingerprint shared by
    half the corpus is boilerplate, not overlap evidence) and bounds
    the self-join fan-out at ``max_df²`` per fingerprint. Per-doc
    fingerprint sets and df counts are one uniform shuffle each.
    """
    fps = (
        winnowing_fingerprints(docs, text_col, id_col, k=k, w=w)
        .select(id_col, "fp")
        .distinct()
    )
    doc_sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fp"))
    pairable = fps.join(
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("fp"),
        "fp",
    )
    a = pairable.select(F.col(id_col).alias("doc_a"), "fp")
    b = pairable.select(F.col(id_col).alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )
    return (
        pairs.join(
            doc_sizes.select(
                F.col(id_col).alias("doc_a"), F.col("n_fp").alias("n_fp_a")
            ),
            "doc_a",
        )
        .join(
            doc_sizes.select(
                F.col(id_col).alias("doc_b"), F.col("n_fp").alias("n_fp_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            F.expr("(shared_fp * 1000000) div least(n_fp_a, n_fp_b)")
            .cast("long")
            .alias("overlap_ppm"),
        )
    )
