"""Exact second-moment (Gram/covariance) statistics and PCA whitening
for embedding columns — the preprocessing layer ANN indexes and
duplicate detectors want (decorrelated components make fixed-threshold
cosine and product-quantization cells behave uniformly across dims).

Two-phase design, the only shape that scales to 100 TB of vectors:

- **Map phase** (:func:`gram_partials`): each Arrow batch computes its
  ``XᵀX`` partial as ONE int64 BLAS matmul over the scaled components
  (`floor(x·1e6)` — the :mod:`.similarity` idiom, so every partial is
  EXACT) and emits a dim×dim partial grid plus the marginal sums.
  Per-batch output is dim² + dim + 1 rows — sketch-sized, independent
  of batch row count.
- **Reduce phase**: one bounded-key groupBy sums the partials. Integer
  sums are order- and partitioning-independent, so the full Gram
  matrix is bit-identical at any parallelism and matches the DuckDB
  oracle's explode² restatement exactly.

``pca_whiten`` then closes the loop driver-side: the dim×dim
covariance (a bounded collect by construction — 4096 rows for dim 64)
is eigendecomposed with numpy, and the whitening projection ships back
as a broadcast-closure matrix applied per Arrow batch (one float64
GEMM per batch, embarrassingly parallel). Whitening output is float
(eigenvectors are irrational); its contract is pinned by pytest
(whitened covariance ≈ identity), not by a value-hash oracle — same
posture as :func:`.similarity.gemm_topk`.

int64 overflow headroom: |scaled x| ≤ ~2^21 for unit-ish embeddings →
per-pair products ≤ 2^42; a 10k-row Arrow batch sums to ≤ 2^55 and the
global sum for 10¹² rows stays ≤ 2^82 — past int64. The REDUCE side
therefore accumulates in Spark's DECIMAL(38,0) (exact to 10^38), while
per-batch partials stay in int64 BLAS (exact up to ~10^5-row batches
of unit vectors — asserted, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import SCALE

# s_part is int64 at the partial level (exact under the per-batch
# assert); the REDUCE casts to DECIMAL(38,0) before summing so the
# global accumulation never overflows
GRAM_PARTIAL_SCHEMA = "dim_i int, dim_j int, s_part long, n_part long"


def gram_partials(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-Arrow-batch exact Gram partials: rows ``(dim_i, dim_j,
    s_part, n_part)`` where ``dim_i, dim_j ≥ 1`` carry Σ xᵢxⱼ over the
    batch, ``(i, 0)`` carries the marginal Σ xᵢ, and ``(0, 0)`` the
    batch row count. Scaled-int exact; see module docstring."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            X = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * SCALE
            ).astype(np.int64)
            n = X.shape[0]
            absmax = int(np.abs(X).max()) if n else 0
            # exactness contract: batch Σ|xi·xj| must fit int64
            assert absmax * absmax * max(n, 1) < 2**62, (
                "gram_partials: batch too large/hot for exact int64 "
                "partials — lower arrow maxRecordsPerBatch"
            )
            G = X.T @ X  # int64, exact under the assert above
            S = X.sum(axis=0)
            ii, jj = np.meshgrid(
                np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "dim_i": np.concatenate(
                        [ii.ravel(), np.arange(1, dim + 1), [0]]
                    ),
                    "dim_j": np.concatenate(
                        [jj.ravel(), np.zeros(dim, dtype=int), [0]]
                    ),
                    "s_part": np.concatenate([G.ravel(), S, [n]]),
                    "n_part": n,
                }
            )

    return df.select(vec_col).mapInPandas(batches, GRAM_PARTIAL_SCHEMA)


def gram_sums(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Reduced Gram sums ``(dim_i, dim_j, s)`` — pair cells plus the
    ``(i, 0)`` marginals and ``(0, 0)`` row count, DECIMAL-accumulated.
    The single corpus scan both :func:`covariance_grid` and
    :func:`pca_whiten` derive everything from."""
    return gram_partials(df, vec_col, dim).groupBy("dim_i", "dim_j").agg(
        F.sum(F.col("s_part").cast("decimal(38,0)")).alias("s")
    )


def covariance_grid(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Full (dim_i, dim_j) covariance grid with exact integer second
    moments: ``(dim_i, dim_j, n, s_ij, cov_micro)``. ``s_ij`` is the
    exact Σ xᵢxⱼ of scaled components (DECIMAL-accumulated); the
    covariance in ORIGINAL units is quantized to micro via one fixed
    IEEE expression — identical operand order in the oracle, so the
    floor matches bit-for-bit."""
    sums = gram_sums(df, vec_col, dim)
    pair = (
        sums.filter((F.col("dim_i") >= 1) & (F.col("dim_j") >= 1))
        .select("dim_i", "dim_j", F.col("s").alias("s_ij"))
    )
    marg = sums.filter((F.col("dim_i") >= 1) & (F.col("dim_j") == 0)).select(
        F.col("dim_i").alias("m_dim"), F.col("s").alias("s_m")
    )
    n_row = sums.filter((F.col("dim_i") == 0) & (F.col("dim_j") == 0)).select(
        F.col("s").cast("long").alias("n")
    )
    out = (
        pair.join(
            F.broadcast(marg.select(F.col("m_dim").alias("dim_i"), F.col("s_m").alias("s_i"))),
            "dim_i",
        )
        .join(
            F.broadcast(marg.select(F.col("m_dim").alias("dim_j"), F.col("s_m").alias("s_j"))),
            "dim_j",
        )
        .crossJoin(F.broadcast(n_row))
    )
    # fixed IEEE sequence (see module docstring): t1 = s_i·s_j;
    # t2 = t1/n; t3 = s_ij − t2; t4 = t3/n; descale; micro-floor
    s_ij_d = F.col("s_ij").cast("double")
    s_i_d = F.col("s_i").cast("double")
    s_j_d = F.col("s_j").cast("double")
    n_d = F.col("n").cast("double")
    cov = (s_ij_d - (s_i_d * s_j_d) / n_d) / n_d
    return out.select(
        "dim_i",
        "dim_j",
        "n",
        F.col("s_ij").cast("decimal(38,0)").cast("string").alias("s_ij_str"),
        F.floor(cov / F.lit(float(SCALE) * float(SCALE)) * F.lit(1e6))
        .cast("long")
        .alias("cov_micro"),
    )


def pca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    eps: float = 1e-9,
) -> DataFrame:
    """PCA whitening: project every vector onto the covariance
    eigenbasis and rescale each component to unit variance. The
    dim×dim covariance is bounded by construction (collected grid ≤
    dim² rows — broadcast posture, like the k-means codebook); the
    projection applies per Arrow batch as one float64 GEMM. Output:
    ``(id, whitened array<double>)`` — float path, pytest-pinned
    (whitened covariance ≈ I), not oracle-hashed."""
    import numpy as np
    import pandas as pd

    # ONE corpus scan: the reduced Gram sums carry pair cells,
    # marginals AND the row count (dim²+dim+1 rows — a bounded collect
    # by construction, the k-means-codebook posture)
    rows = gram_sums(df, vec_col, dim).collect()
    cells = {(r["dim_i"], r["dim_j"]): r["s"] for r in rows}
    # empty input → no gram rows: return an empty frame with the
    # contract schema instead of KeyError/ZeroDivisionError
    if (0, 0) not in cells or int(cells[(0, 0)]) == 0:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, whitened array<double>"
        )
    n = int(cells[(0, 0)])
    mu = np.array(
        [float(cells[(i, 0)]) / n / SCALE for i in range(1, dim + 1)]
    )
    S = np.array(
        [
            [float(cells[(i, j)]) for j in range(1, dim + 1)]
            for i in range(1, dim + 1)
        ]
    )
    # covariance in original units from the exact sums (same algebra
    # as covariance_grid, full double precision here — the whitening
    # transform is the float path)
    C = (S / n - np.outer(mu * SCALE, mu * SCALE)) / (SCALE * SCALE)

    vals, vecs = np.linalg.eigh((C + C.T) / 2.0)
    W = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, eps))) @ vecs.T

    def batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mu) @ W.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], "whitened": list(Y)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        batches, f"{id_col} long, whitened array<double>"
    )
