"""Substring-level duplication analysis (ExactSubstr-lite).

Document-level dedup (``llm.dedup``) misses the dominant failure mode
of web corpora: *spans* repeated across otherwise-distinct documents
(boilerplate, licenses, templated paragraphs).  The canonical fix —
suffix-array exact-substring dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better") — needs a corpus-global
suffix array; this module computes the same signal with shuffle-bounded
DataFrame ops: every token ``k``-gram is content-hashed, globally
counted, and per-document runs of duplicated spans are measured with
gaps-and-islands.

Scale shape (the whole point):

- span extraction is a per-row projection (``transform`` over the
  token array) — no shuffle, corpus scanned once;
- the global count is ONE uniform groupBy on the span hash (map-side
  partial counts; the reduce key space is the distinct-span set);
- only *duplicated* hashes (a small fraction of a healthy corpus)
  re-join the position table — the join's build side shrinks with
  corpus quality, and the equi-join is AQE/skew-join eligible for the
  boilerplate-hash hot keys;
- run detection windows partition by document, so no partition
  exceeds one document's span count.

Hashes default to md5 (128-bit) so cross-engine counts are
collision-free in both Spark and the DuckDB oracle; the module-level
``HASH_FN`` knob switches every seed/ladder expression to
``xxhash64`` — the 100 TB posture (8-byte bigint shuffle keys instead
of 32-char hex strings; 64-bit collisions only perturb *counts* of
near-identical spans, not the dedup decision shape).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 8

# Gram-hash function used in every seed/ladder expression below. md5
# (128-bit) is the DEFAULT so cross-engine counts are collision-free
# against the DuckDB oracle at test scale; the Spark-only scale
# harness runs the documented 100 TB posture instead —
# ``xxhash64`` — which shuffles 8-byte bigint keys in place of
# 32-char hex strings (~4x narrower rows through every groupBy/join
# on the hash). A 64-bit collision can only merge two unrelated
# grams' occurrence lists, perturbing counts of near-identical
# spans, never the operator's decision shape; at ~1e9 grams the
# expected number of colliding pairs is ~0.03. Read at call time so
# callers can set ``spans.HASH_FN = "xxhash64"`` per run.
HASH_FN = "md5"


def scrub_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """ExactSubstr-style corpus rewrite: REMOVE duplicated ``k``-gram
    spans, keeping one canonical occurrence (the fix counterpart to
    :func:`duplicate_span_stats`, which only measures).

    Semantics (deterministic in both engines):

    - a span *occurrence* ``(doc, pos)`` is removable iff its text
      occurs at more than one position corpus-wide AND it is not the
      canonical occurrence — the globally first by ``(doc_id, pos)``;
    - every token position covered by ANY removable occurrence is
      dropped (overlap with a canonical span does not protect a token —
      the rule is coverage, not ownership, so the output is independent
      of evaluation order);
    - surviving tokens are re-joined in document order.

    Output: ``(id_col, n_tokens, n_kept, n_removed, scrubbed_text)``.

    Scale shape mirrors the stats operator: one uniform groupBy on the
    span hash (map-side partial ``min(struct(doc, pos))`` picks the
    canonical without a second pass), only duplicated hashes re-join
    the position table, and the reassembly groupBy is document-bounded
    (``collect_list`` holds at most one document's tokens — the same
    bound a parquet row already has).
    """
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), w -> length(w) >= 1)"
    )
    base = docs.select(F.col(id_col), words.alias("__words"))
    toks = base.select(
        id_col, F.posexplode("__words").alias("tpos", "w")
    )
    spans = base.filter(F.size("__words") >= k).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__words) - {k}), "
                f"i -> {HASH_FN}(array_join(slice(__words, i + 1, {k}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    dup = (
        spans.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("canon"),
        )
        .filter(F.col("n_occ") > 1)
        .select("h", "canon")
    )
    removable = (
        spans.join(dup, "h", "inner")
        .filter(
            ~(
                (F.col(id_col) == F.col("canon.d"))
                & (F.col("pos") == F.col("canon.p"))
            )
        )
        .select(id_col, "pos")
    )
    # no distinct: left_anti is set semantics, so the result is
    # identical either way. The trade (r11 advice): the anti-join runs
    # as a BroadcastHashJoin with covered as the BUILD side, so
    # skipping the DISTINCT saves a full hash aggregation but lets
    # overlapping removable spans duplicate covered positions up to k×
    # in the broadcast relation — measured 2.32 → 1.68 s warm at sf0.1
    # in the distinct-free shape. If the covered table ever stops
    # broadcasting at scale (k× growth crossing the threshold),
    # re-adding the DISTINCT to shrink the build side is the fix.
    covered = removable.select(
        id_col,
        F.explode(F.expr(f"sequence(pos, pos + {k - 1})")).alias("tpos"),
    )
    kept = toks.join(covered, [id_col, "tpos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(tpos, w))), "
                "x -> x.w)"
            ),
            " ",
        ).alias("__scrubbed"),
    )
    return (
        base.select(id_col, F.size("__words").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("__scrubbed", F.lit("")).alias("scrubbed_text"),
        )
    )


def exactsubstr_dup_lens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 5,
    cap: int = 24,
) -> DataFrame:
    """TRUE ExactSubstr duplication lengths (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): for
    every token position ``p``, the length of the LONGEST substring
    starting at ``p`` that occurs at ≥ 2 positions corpus-wide —
    ``dup_len(p)`` — reported for positions with ``dup_len ≥ min_len``
    and capped at ``cap`` tokens.

    This removes the fixed ``k``-gram floor of
    :func:`duplicate_span_stats`: duplicated substrings of ANY length in
    ``[min_len, cap]`` are found, and the per-position maximum is the
    exact suffix-array answer (``min(max LCP with any other suffix,
    cap)``) — so a merged region whose parts match *different* partners
    (the chimera case) is visible as ``max_duplen < span width``.

    Shape — a pruned length-ladder, NOT a corpus-global suffix sort:

    1. seed pass: hash every ``min_len``-gram, ONE uniform groupBy for
       global counts; by monotonicity ``dup_len(p) ≥ min_len`` iff the
       seed gram is duplicated, so unique positions (the bulk of a
       healthy corpus) are dropped before any longer gram exists;
    2. every occurrence of a longer duplicated gram starts at a seed
       survivor (its ``min_len``-prefix shares the witnesses), so the
       ladder over the survivors loses no counts;
    3. survivors regain token context via ONE doc-grouped join (each
       duplicated document's array ships once, not once per position),
       then project all ``(pos, ℓ)`` gram hashes for
       ``ℓ ∈ [min_len, cap]`` — compact hash rows, ≤ ``cap - min_len
       + 1`` per surviving position;
    4. one uniform groupBy on ``(ℓ, hash)`` finds duplicated grams;
       an equi-join back + max(ℓ) per position is the answer.

    A greedy per-position binary search over doubled gram ranks is
    tempting but WRONG here: an occurrence can extend further with a
    *different* partner and leave its twin's count at 1 mid-descent
    (found by the sf0.001 oracle during development), so the ladder
    enumerates lengths exhaustively — exact by construction, and the
    blow-up is bounded by (duplicated-region size) × (cap - min_len
    + 1) compact hash rows. Output: ``(id_col, pos, dup_len)``.
    """
    if min_len < 1 or cap < min_len:
        raise ValueError(f"need 1 <= min_len <= cap, got {min_len}..{cap}")
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), w -> length(w) >= 1)"
    )
    base = docs.select(F.col(id_col), words.alias("__words"))
    seeds = base.filter(F.size("__words") >= min_len).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__words) - {min_len}), "
                f"i -> {HASH_FN}(array_join(slice(__words, i + 1, {min_len}), ' ')))"
            )
        ).alias("pos", "K"),
    )
    dup_seeds = (
        seeds.groupBy("K")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("K")
    )
    surv = seeds.join(dup_seeds, "K").select(id_col, "pos")
    # one array shipment per duplicated DOC (not per position): group the
    # surviving positions, join the doc's token array once, then slice a
    # ≤cap-token context per position
    # persisted at the CONTEXT granularity, not the ladder: ctx is one
    # row per surviving position (a ≤cap-token slice), while the ladder
    # below is (cap - min_len + 1)× that — at the 100x bench scale the
    # ladder persist spilled to disk and its round-trip cost more than
    # recomputing the gram-hash projection from the cached ctx (the ladder's
    # two consumers re-derive it with zero shuffles above ctx)
    ctx = (
        surv.groupBy(id_col)
        .agg(F.collect_list("pos").alias("__plist"))
        .join(base, id_col)
        .select(
            id_col,
            F.explode("__plist").alias("pos"),
            F.col("__words"),
        )
        .select(
            id_col,
            "pos",
            F.expr(f"slice(__words, pos + 1, {cap})").alias("__ctx"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ladder = ctx.select(
        id_col,
        "pos",
        F.posexplode(
            F.expr(
                f"transform(sequence({min_len}, "
                f"least({cap}, size(__ctx))), "
                f"l -> {HASH_FN}(array_join(slice(__ctx, 1, l), ' ')))"
            )
        ).alias("__li", "h"),
    ).select(
        id_col,
        "pos",
        (F.col("__li") + min_len).alias("glen"),
        "h",
    )
    dup_grams = (
        ladder.groupBy("glen", "h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("glen", "h")
    )
    return (
        ladder.join(dup_grams, ["glen", "h"])
        .groupBy(id_col, "pos")
        .agg(F.max("glen").cast("long").alias("dup_len"))
        .select(
            id_col,
            F.col("pos").cast("long").alias("pos"),
            "dup_len",
        )
    )


def exactsubstr_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 5,
    cap: int = 24,
) -> DataFrame:
    """Merged per-document duplicated regions from
    :func:`exactsubstr_dup_lens`: overlapping extents
    ``[pos, pos + dup_len)`` are unioned per document (interval
    gaps-and-islands — document-bounded windows only). ``max_duplen``
    is the longest single exact match inside the region: a region wider
    than its ``max_duplen`` is a CHIMERA (parts matched different
    partners), which fixed-shingle islands cannot distinguish.

    Output: ``(id_col, span_start, span_end, span_tokens, max_duplen,
    n_anchors)``.
    """
    lens = exactsubstr_dup_lens(docs, text_col, id_col, min_len, cap)
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = lens.withColumn(
        "__prev_max", F.max(F.col("pos") + F.col("dup_len")).over(w_prev)
    ).withColumn(
        "__is_new",
        (F.col("__prev_max").isNull() | (F.col("pos") > F.col("__prev_max")))
        .cast("int"),
    )
    islands = marked.withColumn("__isl", F.sum("__is_new").over(w_run))
    return islands.groupBy(id_col, "__isl").agg(
        F.min("pos").cast("long").alias("span_start"),
        F.max(F.col("pos") + F.col("dup_len")).cast("long").alias("span_end"),
        (F.max(F.col("pos") + F.col("dup_len")) - F.min("pos"))
        .cast("long")
        .alias("span_tokens"),
        F.max("dup_len").cast("long").alias("max_duplen"),
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
    ).drop("__isl")


def duplicate_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-document duplicated-span profile over token ``k``-grams.

    Output: ``(id_col, n_spans, n_dup_spans, longest_dup_run,
    dup_span_ratio)`` where ``longest_dup_run`` is in TOKENS (a run of
    ``r`` consecutive duplicated spans covers ``r + k - 1`` tokens) and
    a span is "duplicated" iff its text occurs at more than one
    position corpus-wide (cross-document or repeated within one).
    """
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), w -> length(w) >= 1)"
    )
    base = docs.select(
        F.col(id_col), words.alias("__words")
    ).withColumn("n_spans", F.greatest(F.size("__words") - (k - 1), F.lit(0)))
    spans = base.filter(F.col("n_spans") > 0).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(__words) - {k}), "
                f"i -> {HASH_FN}(array_join(slice(__words, i + 1, {k}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    # global occurrence counts: one uniform shuffle on the span hash;
    # only hashes seen twice+ survive to the join (small for a healthy
    # corpus — duplication is the exception the operator hunts)
    dup_hashes = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") > 1)
        .select("h")
    )
    dup_pos = spans.join(dup_hashes, "h", "inner").select(id_col, "pos")
    # gaps-and-islands per document: consecutive duplicated positions
    # share (pos - row_number) — window partitions are document-bounded
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    runs = (
        dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w_doc))
        .groupBy(id_col, "grp")
        .agg(F.count(F.lit(1)).alias("run_spans"))
    )
    per_doc = runs.groupBy(id_col).agg(
        F.sum("run_spans").alias("__n_dup"),
        (F.max("run_spans") + F.lit(k - 1)).alias("__longest"),
    )
    return (
        base.select(id_col, "n_spans")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("__n_dup", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("__longest", F.lit(0)).alias("longest_dup_run"),
            F.when(
                F.col("n_spans") > 0,
                F.coalesce("__n_dup", F.lit(0)).cast("double")
                / F.col("n_spans"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_span_ratio"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = DEFAULT_K,
    max_doc_df: int = 20,
) -> DataFrame:
    """Source-level copy forensics: for every pair of sources, how many
    DISTINCT ``k``-gram span hashes appear in BOTH — the provenance
    matrix that shows which feeds copy from (or share a common
    upstream with) which, before any doc-level dedup decision.

    A span hash only counts as overlap evidence when it occurs in at
    most ``max_doc_df`` documents corpus-wide — the module's standard
    df cap: a gram present in half the corpus is language, not
    copying, and the cap also bounds the per-hash source fan-out. The
    overlap score is exact integer ppm vs the smaller side's capped
    hash vocabulary.

    Shape: span extraction is the per-row projection above; one
    uniform groupBy on the span hash for the doc-df; the pairing joins
    on ``(source, hash)`` DISTINCT rows — per hash at most
    ``min(max_doc_df, n_sources)²`` pair rows. Sources are a bounded
    dimension, so the result is a ≤ n_sources² matrix.
    """
    words = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), w -> length(w) >= 1)"
    )
    spans = (
        docs.select(
            F.col(id_col), F.col(source_col).alias("__src"), words.alias("__words")
        )
        .filter(F.size("__words") >= k)
        .select(
            id_col,
            "__src",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(__words) - {k}), "
                    f"i -> {HASH_FN}(array_join(slice(__words, i + 1, {k}), ' ')))"
                )
            ).alias("h"),
        )
    )
    doc_df = (
        spans.select(id_col, "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("ddf"))
        .filter(F.col("ddf") <= max_doc_df)
        .select("h")
    )
    sh = spans.join(doc_df, "h").select("__src", "h").distinct()
    sizes = sh.groupBy("__src").agg(F.count(F.lit(1)).alias("n_hashes"))
    a = sh.select(F.col("__src").alias("src_a"), "h")
    b = sh.select(F.col("__src").alias("src_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_hashes"))
    )
    return (
        pairs.join(
            sizes.select(
                F.col("__src").alias("src_a"), F.col("n_hashes").alias("n_a")
            ),
            "src_a",
        )
        .join(
            sizes.select(
                F.col("__src").alias("src_b"), F.col("n_hashes").alias("n_b")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "shared_hashes",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("(shared_hashes * 1000000) div least(n_a, n_b)")
            .cast("long")
            .alias("overlap_ppm"),
        )
    )
