"""Deterministic Lloyd's k-means over embedding columns — the trainer
that replaces the label-derived cell assignment in the IVF index
(:func:`.similarity.ivf_topk`) with learned cells.

The reference has no iterative algorithms (SURVEY.md §2 — its jobs are
single-pass ETL); this is the canonical "loop of DataFrame programs"
shape: per round one broadcast of k centroids, one scan of the vectors,
one bounded groupBy(cell) — and the assignment frame is
localCheckpoint()ed so round k's plan does not re-derive rounds 0..k-1.
At 100 TB the per-round cost is one pass over the corpus; k and dim are
broadcast-sized.

Cross-engine determinism (the DuckDB oracle re-runs the identical
rounds):

- components are floor(x·1e6) integer-valued doubles (see
  ``similarity`` module docstring) — dot products are exact in any
  summation order;
- centroid update is ``floor(sum / count)`` — the sum is an exact
  integer below 2^53 and the quotient is ≥ 2^-13 away from the nearest
  wrong-floor boundary at these magnitudes, so the floor is exact in
  both engines;
- assignment ties break on the lower cell id;
- initial centroids are the vectors with the k smallest ids (no RNG —
  k-means++ would need a seeded sampler both engines share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine, dot, scaled


# Above this codebook size the literal-expression plan gets unwieldy;
# switch to the Arrow-batched GEMM form (:func:`_assign_gemm`) — one
# BLAS matmul per batch instead of N×k higher-order-function dot
# evaluations, bit-identical by the scaled-integer design.
MAX_LITERAL_CELLS = 128


def _assign(base: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its max-cosine centroid (tie → lower
    cell) — the pure-JVM broadcast form, kept as the EQUALITY
    REFERENCE the tests pin the literal and GEMM paths against (the
    production gates route to :func:`_assign_literal` below
    ``MAX_LITERAL_CELLS`` and :func:`_assign_gemm` above it).

    The fan-out row drops BOTH vectors before any exchange: the
    broadcast product projects only ``(vec_id, struct(sim, -cell))``,
    so the per-vector argmax is a map-side partial ``max`` (at most
    one surviving row per vector per partition crosses the wire)
    instead of the previous per-vector ``row_number`` window, whose
    sort dragged the ×k fan-out — embedding arrays, centroid arrays
    and all — through a full exchange (~1 KB × N × k bytes; the 100x
    scale harness measured that cliff the first time a scaled
    codebook crossed MAX_LITERAL_CELLS). Struct ordering matches the
    window exactly: highest sim wins, ties fall to the lower cell via
    the negated id, and Spark compares NaN/null identically in both
    forms. The vectors re-attach with one equi-join on ``vec_id``
    (AQE broadcasts the argmax side when it is small enough)."""
    fan = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        F.struct(
            cosine(
                dot(F.col("svec"), F.col("cvec")),
                F.col("norm_sq"),
                F.col("cnorm"),
            ).alias("sim"),
            (-F.col("cell")).alias("negcell"),
        ).alias("cand"),
    )
    best = (
        fan.groupBy("vec_id")
        .agg(F.max("cand").alias("best"))
        .select("vec_id", (-F.col("best.negcell")).alias("cell"))
    )
    return base.select("vec_id", "svec", "norm_sq").join(best, "vec_id")


def _assign_gemm(base: DataFrame, cent_rows) -> DataFrame:
    """Assignment for codebooks past the literal gate as ONE
    Arrow-batched numpy GEMM per batch (``V @ C.T`` — the same
    vectorized posture as :func:`.similarity.gemm_topk`): the
    ×k fan-out never exists as rows, and per 10k-row Arrow batch the
    sims matrix is ``batch × k`` float64 (~31 MB at k=390).

    Bit-identical to the JVM forms, not approximately equal: scaled
    components are integer-valued doubles, so every partial sum in
    the BLAS dot is an exact integer below 2^53 (summation order is
    irrelevant — the module docstring's determinism argument), and
    sqrt/divide are correctly-rounded IEEE ops in both runtimes.
    Tie-break parity: centroid columns are ordered by cell id and
    ``np.argmax`` returns the FIRST maximum — the lower cell, exactly
    the ``(sim DESC, cell ASC)`` rule; NaN columns (zero-norm
    centroid) rank greatest in both runtimes (numpy argmax returns
    the first NaN index; Spark orders NaN above every double).
    Pinned against both other forms by
    ``test_kmeans_literal_assign_equals_join_assign``."""
    import numpy as np

    cent_rows = sorted(cent_rows, key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([list(r["cvec"]) for r in cent_rows], dtype=np.float64)
    cnorm = np.sqrt(
        np.array([r["cnorm"] for r in cent_rows], dtype=np.float64)
    )

    def batch_assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            vmat = np.array(list(pdf["svec"]), dtype=np.float64)
            vnorm = np.sqrt(pdf["norm_sq"].to_numpy(dtype=np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (vmat @ cmat.T) / (vnorm[:, None] * cnorm[None, :])
            yield pd.DataFrame(
                {"vec_id": ids, "cell": cells[sims.argmax(axis=1)]}
            )

    best = base.select("vec_id", "svec", "norm_sq").mapInPandas(
        batch_assign, "vec_id long, cell long"
    )
    return base.select("vec_id", "svec", "norm_sq").join(best, "vec_id")


def _dlit(x) -> str:
    """Exact double literal as SQL text: ``repr`` round-trips the IEEE
    value and the string→double cast is constant-folded at analysis."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _assign_literal(base: DataFrame, cent_rows) -> DataFrame:
    """Zero-shuffle assignment: the codebook is driver-sized by
    definition, so embed each centroid as a literal array and pick the
    argmax with ``array_max`` over k (sim, -cell) structs — ONE
    codegen'd projection per round, no ×k row fan-out, no per-vector
    window shuffle. Identical math and tie-break (max sim, then lower
    cell via the negated id) to the join form.

    The expression is rendered as ONE SQL string and parsed with a
    single ``F.expr`` call: building it from k·dim ``F.lit`` Column
    objects costs one py4j round-trip PER LITERAL — measured ~7.6 s of
    pure driver time per round at k=128, dim=64, vs ~0.1 s for the
    text parse. Same expression tree either way (aggregate/zip_with
    products, double division, struct argmax)."""
    parts = []
    for r in cent_rows:
        cvec_sql = "array(" + ",".join(_dlit(x) for x in r.cvec) + ")"
        sim_sql = (
            f"aggregate(zip_with(svec, {cvec_sql}, (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) "
            f"/ (sqrt(norm_sq) * sqrt({_dlit(r.cnorm)}))"
        )
        parts.append(
            f"named_struct('s', {sim_sql}, 'negc', {-int(r.cell)})"
        )
    best = F.expr(f"array_max(array({', '.join(parts)}))")
    return base.select(
        "vec_id",
        "svec",
        "norm_sq",
        (-best["negc"]).cast("long").alias("cell"),
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroids: per-cell, per-dim floor(mean) of the scaled
    components — exact integers, list-collected in dim order."""
    return (
        assigned.select("cell", F.posexplode("svec").alias("dim", "sval"))
        .groupBy("cell", "dim")
        .agg(F.floor(F.sum("sval") / F.count(F.lit(1))).alias("c"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("_dc"))
        .select(
            "cell",
            F.transform("_dc", lambda s: s["c"].cast("double")).alias("cvec"),
        )
        .withColumn("cnorm", dot(F.col("cvec"), F.col("cvec")))
    )


def train_cells(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    full: bool = False,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds and return the final assignment
    (vec_id, cell). Empty cells simply stop receiving members (no
    re-seeding — deterministic). ``full=True`` keeps the scaled vector
    and its norm on the assignment (the frame is already checkpointed,
    so downstream consumers pay no re-derivation)."""
    base = df.select(
        F.col(id_col).alias("vec_id"), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))

    centroids = (
        base.orderBy("vec_id")
        .limit(k)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("svec").alias("cvec"),
            F.col("norm_sq").alias("cnorm"),
        )
    )
    assigned = None
    for _ in range(iters):
        if k <= MAX_LITERAL_CELLS:
            # the codebook is bounded (k rows) — collecting it is the
            # same driver posture as broadcasting it, and buys the
            # zero-shuffle literal assignment
            assigned = _assign_literal(base, centroids.collect())
        else:
            # same driver posture (k rows collected), arithmetic in
            # one BLAS call per Arrow batch instead of N x k
            # higher-order-function evaluations
            assigned = _assign_gemm(base, centroids.collect())
        assigned = assigned.localCheckpoint()
        centroids = _recompute(assigned)
    if full:
        return assigned
    return assigned.select("vec_id", "cell")


def cell_profile(assignment: DataFrame) -> DataFrame:
    """Summarize a cell assignment: size and id-checksum per cell —
    the deterministic fingerprint the oracle compares."""
    return assignment.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").alias("id_checksum"),
        F.min("vec_id").alias("min_member"),
    )


def append_assign(
    index_df: DataFrame,
    batch_df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF index APPEND: train cells on the STANDING index, then assign
    an arriving batch of vectors to the frozen final centroids without
    retraining — the incremental index-maintenance posture (retraining
    on every append touches the whole corpus; frozen-codebook
    assignment touches only the batch — the vector twin of the
    document ingest index). Returns the per-cell growth audit
    ``(cell, n_before, n_appended, appended_checksum, min_appended)``
    an embedding store alerts on: one cell absorbing most of an append
    usually means drift or a degenerate codebook.

    Scale shape: the trainer's bounded rounds over the index, then ONE
    codegen'd literal-codebook projection over the batch (no shuffle,
    no ×k fan-out) and two k-row aggregates. Determinism: identical
    integer-grid math and tie-breaks as :func:`train_cells`, so the
    DuckDB oracle replays the rounds and the frozen assignment
    exactly."""
    assigned = train_cells(index_df, k, iters, vec_col, id_col, full=True)
    cents = _recompute(assigned)
    base_new = batch_df.select(
        F.col(id_col).alias("vec_id"), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))
    if k <= MAX_LITERAL_CELLS:
        newly = _assign_literal(base_new, cents.collect())
    else:
        newly = _assign_gemm(base_new, cents.collect())
    before = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    app = newly.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_appended"),
        F.sum("vec_id").cast("long").alias("appended_checksum"),
        F.min("vec_id").alias("min_appended"),
    )
    return before.join(app, "cell", "left").select(
        "cell",
        "n_before",
        F.coalesce(F.col("n_appended"), F.lit(0)).cast("long").alias(
            "n_appended"
        ),
        F.coalesce(F.col("appended_checksum"), F.lit(0)).cast("long").alias(
            "appended_checksum"
        ),
        "min_appended",
    )


def outlier_report(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    bottom_n: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distance-to-centroid outlier report: the ``bottom_n`` members of
    every trained cell FARTHEST from their own final centroid (lowest
    cosine, id tiebreak) — the candidate list a corpus build reviews
    for mislabeled / noise / off-distribution vectors before training
    on them. (No reference analogue — the reference has no vector ops,
    SURVEY.md §2.10.)

    Scale shape: the trainer's per-round cost (one scan, broadcast
    codebook) plus ONE codegen'd projection against the broadcast
    final centroids; the per-cell ranking runs through
    :func:`operators.skew.salted_topk` because cells are few — a plain
    cell-partitioned window would sort the whole corpus in k reducers.
    Cell sizes are a k-row aggregate joined back broadcast.
    """
    from ..operators.skew import salted_topk

    assigned = train_cells(df, k, iters, vec_col, id_col, full=True)
    cents = _recompute(assigned)
    member = assigned.join(F.broadcast(cents), "cell").withColumn(
        "cosine_to_centroid",
        cosine(dot(F.col("svec"), F.col("cvec")), F.col("norm_sq"), F.col("cnorm")),
    )
    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("cell_n_members")
    )
    bottom = salted_topk(
        member.select("cell", "vec_id", "cosine_to_centroid"),
        ["cell"],
        [F.col("cosine_to_centroid").asc(), F.col("vec_id")],
        bottom_n,
        rank_col="outlier_rank",
    )
    return bottom.join(F.broadcast(sizes), "cell").select(
        "cell", "vec_id", "outlier_rank", "cosine_to_centroid",
        "cell_n_members",
    )
