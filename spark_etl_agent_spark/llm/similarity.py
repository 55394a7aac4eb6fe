"""Embedding similarity search over ``array<float>`` columns.

The reference has no vector operations (SURVEY.md §2.10 — no UDFs at
all); these are the BASELINE.json north-star extensions. Two paths:

- **Brute-force top-k** — the exactness baseline: broadcast the (small)
  query set against every candidate vector; per-pair cosine; window
  top-k. One broadcast join + one shuffle on query_id. At 100 TB the
  candidate side streams through executors unchanged — the plan is the
  classic "scan × tiny broadcast" shape that scales linearly.
- **Sign-bucket ANN** — the scale path: coarse quantization on the sign
  pattern of the leading components (axis-aligned random-hyperplane
  LSH). Vectors shuffle once on a bounded-width bucket key; the
  quadratic compare runs only within buckets. More buckets → smaller
  partitions; skew is bounded because the bucket key has ≤ 2^b values
  of roughly uniform occupancy for centered data.

Cross-engine determinism (the reason for the scaled-integer trick):
float addition is order-dependent, and Spark/DuckDB fold in different
orders. Each component is mapped to ``floor(x * 1e6)`` — an
integer-valued DOUBLE. Products (≤ 1e12) and their 64-element sums
(≤ 6.4e13) stay below 2^53, so every intermediate is exactly
representable and the dot product is *order-independent and exact* in
both engines. The final ``dot / (sqrt(na) * sqrt(nb))`` is then a fixed
sequence of correctly-rounded IEEE ops on identical inputs — bitwise
reproducible. Quantization error (1e-6 per component) is far below any
meaningful similarity difference; ties are broken by vector id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
N_SIGN_BITS = 8  # sign-bucket ANN: leading components used for the bucket key


def scaled(col: Column) -> Column:
    """array<float> → array<double> of floor(x * 1e6) (integer-valued)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE).cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two scaled vectors (see module docstring)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_scaled_and_norm(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Attach the scaled vector and its exact squared norm — computed
    once per vector, reused across all pair comparisons."""
    s = scaled(F.col(vec_col))
    return df.select(F.col(id_col), s.alias("svec")).withColumn(
        "norm_sq", dot(F.col("svec"), F.col("svec"))
    )


def cosine(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot_col / (F.sqrt(norm_a) * F.sqrt(norm_b))


def brute_force_topk(
    df: DataFrame,
    query_ids_below: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: tiny query set (vec_id < query_ids_below)
    broadcast against every candidate; deterministic rank (cosine desc,
    id asc)."""
    base = with_scaled_and_norm(df, vec_col, id_col)
    q = F.broadcast(
        base.filter(F.col(id_col) < query_ids_below).select(
            F.col(id_col).alias("query_id"),
            F.col("svec").alias("q_svec"),
            F.col("norm_sq").alias("q_norm"),
        )
    )
    cand = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("svec").alias("c_svec"),
        F.col("norm_sq").alias("c_norm"),
    )
    pairs = q.join(cand, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(
            dot(F.col("q_svec"), F.col("c_svec")), F.col("q_norm"), F.col("c_norm")
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine_sim")
    )


def sign_bucket(vec: Column, n_bits: int = N_SIGN_BITS) -> Column:
    """Axis-aligned hyperplane-LSH bucket: concatenated sign bits of the
    leading components (bounded-width key → bounded shuffle)."""
    return F.concat(
        *[
            F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )


def ann_bucketed_pairs(
    df: DataFrame,
    min_cosine: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate near-neighbor pairs: compare only within sign
    buckets. One shuffle on the bucket key; quadratic work is per-bucket
    (≈ n²/2^b for centered data) instead of global."""
    base = with_scaled_and_norm(df, vec_col, id_col).withColumn(
        "bucket", sign_bucket(F.col("svec"))
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("svec").alias("svec_a"),
        F.col("norm_sq").alias("norm_a"),
        "bucket",
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("svec").alias("svec_b"),
        F.col("norm_sq").alias("norm_b"),
        "bucket",
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "bucket",
            cosine(
                dot(F.col("svec_a"), F.col("svec_b")),
                F.col("norm_a"),
                F.col("norm_b"),
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )


def cosine_near_duplicates(
    df: DataFrame,
    min_cosine: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: a vector is a
    duplicate if any smaller-id vector in its sign bucket has cosine ≥
    the threshold (the standard drop-if-any-smaller-neighbor LSH dedup
    pragma — survivors are every id that never appears as ``vec_id``
    here). Returns one row per dropped vector: its canonical keeper
    (smallest qualifying neighbor), how many qualifying neighbors it
    had, and the strongest similarity. Work and shuffle are identical to
    :func:`ann_bucketed_pairs` plus one bounded groupBy on the dropped
    id."""
    pairs = ann_bucketed_pairs(df, min_cosine, vec_col, id_col)
    return pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("kept_id"),
        F.count(F.lit(1)).alias("n_dup_neighbors"),
        F.max("cosine_sim").alias("max_cosine"),
    )


CENTROID_SHIFT = 10  # centroid sums right-shifted 2^10 to keep dots exact


def ivf_topk(
    df: DataFrame,
    query_ids_below: int = 8,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse codebook of cell centroids, each
    query probes its ``nprobe`` nearest cells and ranks only those
    cells' vectors — the classic two-level index. The codebook here is
    the per-cell vector SUM (same direction as the mean — the count
    divides out of cosine), built from the labeled partition; a k-means
    trainer plugs in by replacing the cell assignment column.

    Exactness bookkeeping: cell sums of scaled components are exact
    integers; they are floor-divided by 2^CENTROID_SHIFT so
    query·centroid products stay below 2^53 at any realistic cell size
    — every similarity is bit-reproducible (the DuckDB oracle checks
    row-for-row). At 100 TB: centroids are a broadcast table; the
    candidate join shuffles once on the cell id."""
    base = df.select(
        F.col(id_col), F.col(cell_col), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))

    # codebook: per-cell exact component sums, shifted
    cent = (
        base.select(F.col(cell_col), F.posexplode("svec").alias("dim", "sval"))
        .groupBy(cell_col, "dim")
        .agg(F.sum("sval").alias("s"))
        .withColumn("c", F.floor(F.col("s") / (2 ** CENTROID_SHIFT)))
        .groupBy(cell_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("_dc")
        )
        .select(
            F.col(cell_col).alias("cent_cell"),
            F.transform("_dc", lambda s: s["c"].cast("double")).alias("cvec"),
        )
        .withColumn("cnorm", dot(F.col("cvec"), F.col("cvec")))
    )

    q = base.filter(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"),
        F.col("svec").alias("q_svec"),
        F.col("norm_sq").alias("q_norm"),
    )
    # probe: nprobe nearest cells per query (tie-break on cell id)
    qc = q.crossJoin(F.broadcast(cent)).withColumn(
        "cell_sim",
        cosine(dot(F.col("q_svec"), F.col("cvec")), F.col("q_norm"), F.col("cnorm")),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cell_sim").desc(), F.col("cent_cell")
    )
    probes = (
        qc.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "q_svec", "q_norm", F.col("cent_cell").alias(cell_col))
    )
    # rank only vectors inside the probed cells
    cand = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("svec").alias("c_svec"),
        F.col("norm_sq").alias("c_norm"),
        cell_col,
    )
    pairs = probes.join(cand, cell_col).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            "neighbor_id",
            cosine(
                dot(F.col("q_svec"), F.col("c_svec")), F.col("q_norm"), F.col("c_norm")
            ).alias("cosine_sim"),
        )
        .withColumn("rnk", F.row_number().over(wk))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine_sim")
    )


def gemm_topk(
    df: DataFrame,
    query_ids_below: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_driver_queries: int = 1024,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy GEMM — the vectorized
    execution of the same logical plan as :func:`brute_force_topk`.

    The element-wise ``F.aggregate(zip_with(...))`` dot product is exact
    and oracle-reproducible but evaluates one JVM expression tree per
    vector pair; at billions of candidates the arithmetic itself
    dominates. This path computes each Arrow batch's query·candidate
    similarities as ONE ``C @ Q.T`` matrix multiply (BLAS, float64) and
    emits only the per-batch top-k — so the shuffle that follows carries
    ``n_batches × |Q| × k`` rows, never the full pair matrix. The global
    window then refines the per-batch winners: the classic local-top-k /
    global-refine reduction, exact because a global top-k row is
    necessarily a top-k row of its own batch.

    Query vectors are collected to the driver ONLY while the query set
    is genuinely small; the bound is enforced, not assumed — by the
    collect itself (``limit(N+1)``, one action, driver memory capped
    at N+1 rows). Above ``max_driver_queries`` the operator delegates to
    :func:`brute_force_topk` — the same exact logical result computed as
    a fully distributed broadcast join with ZERO data rows on the driver
    (and, for query sets too large even to broadcast, AQE converts that
    join to a shuffle join on its own). Below the bound the collected
    matrix ships to workers inside the closure.
    Worker memory per batch is ``maxRecordsPerBatch × dim × 8`` bytes
    (the float64 candidate matrix): at the 10k-row Arrow default that is
    ~5 MB for dim 64 but ~330 MB for dim 4096 — lower
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` for high-dim
    embedding tables.
    Float64 summation differs from the scaled-integer path in the last
    bits, so this variant is pinned against ``brute_force_topk`` for
    identical neighbor SETS (``tests/test_operators.py``) rather than
    hashed as an oracle query."""
    import numpy as np

    qset = df.filter(F.col(id_col) < query_ids_below).select(id_col, vec_col)
    # bound enforced by the collect itself (limit N+1): one action and
    # driver memory capped at N+1 rows — a separate count() would add a
    # full extra scan just to learn a number the collect reveals anyway
    qrows = qset.limit(max_driver_queries + 1).collect()
    if len(qrows) > max_driver_queries:
        # Too many queries for a driver round-trip: same exact answer
        # via the distributed join path (scaled-int dot → identical
        # neighbor sets; see module docstring on determinism).
        return brute_force_topk(df, query_ids_below, k, vec_col, id_col)
    out_schema = "query_id long, neighbor_id long, cosine_sim double"
    if not qrows:
        empty = df.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rnk", F.lit(1)).select(
            "query_id", "neighbor_id", "rnk", "cosine_sim"
        )
    q_ids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    def batch_topk(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(list(pdf[vec_col]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm.T  # (batch, |Q|) — one BLAS call
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                take = min(k, len(cand_idx))
                # argpartition: O(batch) selection, then exact ordering
                part = cand_idx[
                    np.argpartition(-col[cand_idx], take - 1)[:take]
                ]
                order = part[np.lexsort((ids[part], -col[part]))]
                yield pd.DataFrame(
                    {
                        "query_id": qid,
                        "neighbor_id": ids[order],
                        "cosine_sim": col[order],
                    }
                )

    local = df.select(id_col, vec_col).mapInPandas(batch_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine_sim")
    )


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-label centroid components in long form (label, dim,
    centroid): posexplode → groupBy(label, dim). The sum of scaled
    integer components is exact, so the final two divisions are
    deterministic. At 100 TB this is a single shuffle on (label, dim) —
    a bounded key space — with map-side partial aggregation."""
    exploded = df.select(
        "label", F.posexplode(scaled(F.col(vec_col))).alias("pos", "sval")
    )
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            F.sum("sval").alias("ssum"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            "label",
            "dim",
            (
                F.col("ssum") / F.col("n_vecs").cast("double") / F.lit(float(SCALE))
            ).alias("centroid"),
            "n_vecs",
        )
    )


def label_medoids(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-label representative vector ("medoid-to-centroid"): the
    member with the highest cosine similarity to its label's centroid,
    ties broken by the smaller id. The corpus-curation op behind
    "pick one exemplar per cluster".

    The centroid reference is the per-dim ``floor(sum/ n)`` of the
    scaled components — integer-valued, so member·centroid products
    stay within exact-double range and the ranking is deterministic
    across engines/partitionings (same quantization idiom as the IVF
    trainer). Plan: one bounded (label, dim) shuffle for centroids, a
    broadcast join of the (tiny) centroid table back to the vectors,
    and a per-label window — nothing scales with vectors² at 100 TB.
    """
    with_vecs = df.select(
        F.col(id_col), "label", scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))
    cent_long = (
        with_vecs.select("label", F.posexplode("svec").alias("pos", "sval"))
        .groupBy("label", "pos")
        .agg(
            F.floor(
                F.sum("sval") / F.count(F.lit(1)).cast("double")
            ).cast("double").alias("cq")
        )
    )
    cent = cent_long.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cq"))),
            lambda s: s["cq"],
        ).alias("cvec"),
    ).withColumn("cnorm_sq", dot(F.col("cvec"), F.col("cvec")))
    scored = with_vecs.join(F.broadcast(cent), "label").select(
        "label",
        F.col(id_col),
        cosine(
            dot(F.col("svec"), F.col("cvec")),
            F.col("norm_sq"),
            F.col("cnorm_sq"),
        ).alias("centroid_sim"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("centroid_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("label", F.col(id_col).alias("medoid_id"), "centroid_sim")
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    min_cosine: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell_width: int = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embeddings
    with deterministic k-means (:func:`..kmeans.train_cells`), then
    compare vectors pairwise only WITHIN a cell and drop every vector
    that has a higher-priority (lower-id) cell-mate above the cosine
    threshold. Returns one row per dropped vector:
    ``(vec_id, cell, keeper_id, cosine_sim)`` where ``keeper_id`` is
    the most-similar lower-id cell-mate (ties → smaller keeper id).

    This is the embedding-space analogue of MinHash near-dup removal:
    the cluster assignment plays the role of the LSH band — it bounds
    the quadratic compare to within-cell pairs, which is the entire
    SemDeDup scale story. At 100 TB, ``k`` must grow with the corpus
    (k ≈ N / target_cell_width) so cells stay bounded; the pairwise
    join is an equi-join on ``cell`` that AQE splits on skew.

    ``max_cell_width`` (optional) enforces that contract in-operator —
    the same posture as the SimHash hot-bucket guard: the assignment is
    k rows of counts (collecting it is broadcast-equivalent), and a
    cell wider than the cap raises with guidance instead of silently
    going quadratic.

    Determinism: cosine over scaled integer vectors is exact/ordered
    identically in both engines (module docstring); the keeper choice
    is a window with a total order; the pairwise drop rule (ANY
    lower-id similar cell-mate drops you) is set-algebraic, not
    iteration-order-dependent.
    """
    from . import kmeans

    cells = kmeans.train_cells(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    if max_cell_width is not None:
        widths = cells.groupBy("cell").count()
        worst = widths.agg(F.max("count").alias("m")).collect()[0]["m"]
        if worst is not None and worst > max_cell_width:
            raise ValueError(
                f"semantic_dedup: widest cell has {worst} members "
                f"(cap {max_cell_width}); raise k so cells stay bounded "
                "or pre-split the corpus — a quadratic compare over this "
                "cell would not scale"
            )
    # materialized once: the (vector, cell) frame feeds BOTH sides of
    # the self-join — without the checkpoint each side re-runs the
    # scan + scaling + assignment join
    m = (
        with_scaled_and_norm(df, vec_col, id_col)
        .withColumnRenamed(id_col, "vec_id")
        .join(cells, "vec_id")
        .localCheckpoint()
    )
    a, b = m.alias("a"), m.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.cell").alias("cell"),
            F.col("b.vec_id").alias("keeper_id"),
            cosine(
                dot(F.col("a.svec"), F.col("b.svec")),
                F.col("a.norm_sq"),
                F.col("b.norm_sq"),
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= F.lit(float(min_cosine)))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine_sim").desc(), F.col("keeper_id")
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "cell", "keeper_id", "cosine_sim")
    )


def hard_negatives_topk(
    df: DataFrame,
    query_ids_below: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for retrieval/contrastive training: for
    each probe vector, the top-k most-similar vectors with a DIFFERENT
    label (nearest wrong answers — the negatives that actually teach a
    ranker). Same broadcast-probe shape as :func:`brute_force_topk`
    with the label-mismatch predicate fused into the join; at 100 TB
    the candidate side streams through unchanged and only the
    query-keyed top-k shuffles."""
    base = df.select(
        F.col(id_col), F.col(label_col), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))
    q = F.broadcast(
        base.filter(F.col(id_col) < query_ids_below).select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col("svec").alias("q_svec"),
            F.col("norm_sq").alias("q_norm"),
        )
    )
    cand = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col("svec").alias("c_svec"),
        F.col("norm_sq").alias("c_norm"),
    )
    pairs = q.join(
        cand, F.col("query_label") != F.col("neighbor_label")
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        cosine(
            dot(F.col("q_svec"), F.col("c_svec")),
            F.col("q_norm"),
            F.col("c_norm"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "rnk",
            "cosine_sim",
        )
    )


def knn_label_eval(
    df: DataFrame,
    n_probes: int = 100,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """k-NN classifier evaluation — the label-quality probe a curated
    embedding table ships with: a FIXED-SIZE probe panel
    (``id < n_probes``, held OUT of the train side) is classified by
    the majority label of its k nearest train vectors (exact
    scaled-integer cosine); output is per-true-label accuracy.

    Scale shape: the panel is bounded by construction (~n_probes · dim
    · 8 bytes broadcast, independent of index size), so the join is one
    broadcast × one linear index scan — embarrassingly parallel, no
    pair matrix ever shuffled; only the panel-keyed top-k rows move.
    Ties are total-ordered everywhere (cosine desc → neighbor_id asc;
    vote count desc → smaller label), so the result is deterministic
    and oracle-reproducible.
    """
    base = df.select(
        F.col(id_col), F.col(label_col), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))
    probes = F.broadcast(
        base.filter(F.col(id_col) < n_probes).select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("true_label"),
            F.col("svec").alias("q_svec"),
            F.col("norm_sq").alias("q_norm"),
        )
    )
    train = base.filter(F.col(id_col) >= n_probes).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col("svec").alias("c_svec"),
        F.col("norm_sq").alias("c_norm"),
    )
    pairs = probes.crossJoin(train).select(
        "query_id",
        "true_label",
        "neighbor_id",
        "neighbor_label",
        cosine(
            dot(F.col("q_svec"), F.col("c_svec")),
            F.col("q_norm"),
            F.col("c_norm"),
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    top = pairs.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    votes = top.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("neighbor_label")
    )
    pick = votes.withColumn("vr", F.row_number().over(wv)).filter(
        F.col("vr") == 1
    )
    return (
        pick.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(
                (F.col("neighbor_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "true_label",
            "n_probes",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_probes")).alias(
                "accuracy"
            ),
        )
        .orderBy("true_label")
    )
