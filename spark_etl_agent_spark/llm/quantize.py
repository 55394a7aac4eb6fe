"""Embedding quantization — the vector-index compression step of a
large-scale similarity stack (int8 symmetric quantization, the
"scalar quantization" tier of IVF-PQ-style indexes).

A 100 TB corpus's embedding table is itself TB-scale at float32;
serving ANN from it means quantizing: int8 cuts the index 4× and most
accelerators dot-product int8 natively. The operator is a pure
per-row projection — no shuffle, scan-bound, embarrassingly parallel —
and reports the fidelity metrics an index builder gates on (per-vector
quantization error and angular fidelity).

Determinism contract (same discipline as ``llm.similarity``):
components are first quantized to integer-valued doubles
(``floor(x·1e6)``), so the derived scale, int8 codes, error units and
dot products are all exact arithmetic on identical operands in Spark
and the DuckDB oracle — order-independent, partitioning-independent.
The angular-fidelity cosine uses the INT code vector directly (the
dequantization scale cancels inside cosine), keeping every sum exact
under 2⁵³.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization + fidelity report.

    For each vector: ``scale = max|x|/127``, ``q_i = round(x_i/scale)``
    (ties away from zero in both engines), dequantized error
    ``|q_i·scale − x_i|``. Output per vector:

    - ``n_dims``
    - ``scale`` (in micro-component units)
    - ``sum_abs_err`` / ``max_abs_err`` — error in nano units
      (micro-components × 1000), exact longs
    - ``cos_fidelity`` — cosine(original, quantized); scale cancels, so
      it is computed on exact integer dot products
    """
    x = F.transform(
        F.col(vec_col), lambda v: F.floor(v.cast("double") * 1e6).cast("double")
    )
    out = df.select(F.col(id_col), x.alias("__x"))
    absmax = F.array_max(F.transform(F.col("__x"), F.abs))
    out = out.withColumn("__scale", absmax / F.lit(127.0))
    q = F.when(
        F.col("__scale") > 0,
        F.transform(F.col("__x"), lambda v: F.round(v / F.col("__scale"))),
    ).otherwise(F.transform(F.col("__x"), lambda v: F.lit(0.0)))
    out = out.withColumn("__q", q)
    errs = F.zip_with(
        F.col("__x"),
        F.col("__q"),
        lambda a, b: F.round(
            F.abs(b * F.col("__scale") - a) * F.lit(1000.0)
        ).cast("long"),
    )
    dot_xq = F.aggregate(
        F.zip_with(F.col("__x"), F.col("__q"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dot_xx = F.aggregate(
        F.transform(F.col("__x"), lambda v: v * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dot_qq = F.aggregate(
        F.transform(F.col("__q"), lambda v: v * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return out.select(
        id_col,
        F.size("__x").alias("n_dims"),
        F.col("__scale").alias("scale"),
        F.aggregate(
            errs, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sum_abs_err"),
        F.coalesce(F.array_max(errs), F.lit(0).cast("long")).alias(
            "max_abs_err"
        ),
        F.when(
            (F.col("__scale") > 0) & (dot_qq > 0),
            dot_xq / (F.sqrt(dot_xx) * F.sqrt(dot_qq)),
        ).alias("cos_fidelity"),
    )


def pq_encode_stats(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode + fidelity report — the index
    compression that makes billion-vector ANN fit in memory (a 64-dim
    float vector becomes ``m`` one-byte codes).

    Per subspace ``j``: slice out ``dim/m`` components, assign every
    vector to its nearest (L2) seed centroid — the ``k`` lowest-id
    vectors' subslices, the same no-RNG seeding as the IVF trainer —
    then measure the residual against each cell's floor-mean centroid
    (one Lloyd update's worth of codebook refinement). Output is the
    bounded ``m × k`` grid: members, exact residual sum, mean residual
    per cell.

    Scale shape: the codebook is collected (k·m rows — broadcast-sized
    by definition) and embedded as literal expressions, so assignment
    is ONE codegen'd zero-shuffle projection over the corpus (the
    :func:`..kmeans._assign_literal` idiom); the only shuffles are the
    bounded (subspace, cell, dim) centroid aggregate and the final
    m×k-key summary.

    Determinism: scaled-integer components make every squared L2
    distance an exact integer ≤ 4e12·16 < 2^53; residual sums are
    int64; assignment ties break on the lower cell id; floor-mean
    centroids are exact (the kmeans idiom). Bit-identical across
    engines and partitionings.
    """
    _, codes, cent = _pq_codes_and_centroids(df, m, k, dim, vec_col, id_col)
    resid = codes.join(F.broadcast(cent), ["subspace", "cell"]).select(
        "subspace",
        "cell",
        F.aggregate(
            F.zip_with(F.col("sub"), F.col("cvec"), lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        .cast("long")
        .alias("err"),
    )
    return (
        resid.groupBy("subspace", "cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("err").alias("err_sum"),
        )
        .select(
            "subspace",
            "cell",
            "n_members",
            "err_sum",
            F.expr("err_sum div n_members").alias("err_mean"),
        )
    )


def _pq_codes_and_centroids(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    prescaled: bool = False,
):
    """Shared PQ front half: scaled base, long-form codes
    ``(vec_id, subspace, cell, sub)`` via the literal-codebook argmin,
    and the refined floor-mean centroids ``(subspace, cell, cvec)``.
    Feeds the encode-fidelity report and the ADC search; with
    ``prescaled=True`` the input column is taken as an already
    integer-valued grid (the IVF-PQ residual path)."""
    from .similarity import scaled

    d_sub = dim // m
    vec = F.col(vec_col) if prescaled else scaled(F.col(vec_col))
    base = df.select(F.col(id_col).alias("vec_id"), vec.alias("svec"))

    seeds = (
        base.orderBy("vec_id").limit(k).select("vec_id", "svec").collect()
    )

    # one literal-codebook argmin per subspace, all in a single
    # projection — rendered as SQL text and parsed once per subspace
    # (m·k·d_sub individual F.lit Columns cost one py4j round-trip
    # each; the kmeans._assign_literal lesson)
    from .kmeans import _dlit

    sub_assignments = []
    for j in range(m):
        sub_sql = f"slice(svec, {j * d_sub + 1}, {d_sub})"
        structs = []
        for cell, row in enumerate(seeds):
            cvec_sql = "array(" + ",".join(
                _dlit(x) for x in row.svec[j * d_sub : (j + 1) * d_sub]
            ) + ")"
            dist_sql = (
                f"aggregate(zip_with({sub_sql}, {cvec_sql}, "
                f"(x, c) -> (x - c) * (x - c)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
            structs.append(f"named_struct('d', {dist_sql}, 'cell', {cell})")
        best = F.expr(f"array_min(array({', '.join(structs)}))")
        sub_assignments.append(best["cell"].alias(f"c{j}"))

    coded = base.select("vec_id", "svec", *sub_assignments)

    # long form: (vec_id, subspace, cell, subvector)
    codes = coded.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("subspace"),
                        F.col(f"c{j}").alias("cell"),
                        F.slice(F.col("svec"), j * d_sub + 1, d_sub).alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.subspace", "s.cell", "s.sub")

    cent = (
        codes.select("subspace", "cell", F.posexplode("sub").alias("dimi", "sval"))
        .groupBy("subspace", "cell", "dimi")
        .agg(
            F.floor(F.sum("sval") / F.count(F.lit(1)).cast("double"))
            .cast("double")
            .alias("cq")
        )
        .groupBy("subspace", "cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dimi", "cq"))),
                lambda s: s["cq"],
            ).alias("cvec")
        )
    )

    return base, codes, cent


def pq_adc_topk(
    df: DataFrame,
    query_ids_below: int = 8,
    topk: int = 5,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the compressed-index
    query path that completes the PQ story: candidates are represented
    ONLY by their ``m`` codes (one byte each at k ≤ 256), queries stay
    exact, and distance is the sum over subspaces of the exact L2²
    between the query subvector and the candidate's ASSIGNED CENTROID
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011). At billion-vector scale this is what actually fits in
    memory; the trade is quantization error, which
    ``pq_encode_stats``'s residual grid measures.

    Shape: codes + centroid lookup is a broadcast join (m·k rows);
    queries (≤ ``query_ids_below``) broadcast; the per-(query,
    candidate, subspace) distance table is a bounded ×(q·m) expansion
    aggregated back to (query, candidate) and window-ranked per query
    — the brute-force broadcast pattern with codes instead of raw
    vectors. All arithmetic exact int64 (scaled-integer grid).
    """
    from pyspark.sql import Window

    base, codes, cent = _pq_codes_and_centroids(
        df, m, k, dim, vec_col, id_col
    )
    d_sub = dim // m
    queries = base.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("qid"), F.col("svec").alias("qsvec")
    )
    per = (
        codes.join(F.broadcast(cent), ["subspace", "cell"])
        .join(F.broadcast(queries))
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.expr(f"slice(qsvec, subspace * {d_sub} + 1, {d_sub})"),
                    F.col("cvec"),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("long")
            .alias("dist"),
        )
    )
    sums = (
        per.filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("dist").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        sums.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= topk)
        .select("qid", "vec_id", "adc_dist", "rnk")
    )


def pq_adc_recall(
    df: DataFrame,
    query_ids_below: int = 8,
    topk: int = 5,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ search-quality evaluation: recall of the ADC top-k against
    the EXACT L2 top-k over the same scaled-integer grid — the same
    metric on both sides, so the report isolates pure QUANTIZATION
    loss (m, k sizing) from metric mismatch. Per probe query:
    ``(query_id, n_exact, n_pq, n_common, recall_ppm)``, all exact
    integers.

    Shape: ADC is :func:`pq_adc_topk`; the exact side is the
    broadcast-queries × corpus scan with an integer L2 window rank
    (the brute-force pattern); the recall join is between
    ``q·topk``-row frames.
    """
    from pyspark.sql import Window

    from .similarity import with_scaled_and_norm

    base = with_scaled_and_norm(df, vec_col, id_col).withColumnRenamed(
        id_col, "vec_id"
    )
    queries = F.broadcast(
        base.filter(F.col("vec_id") < query_ids_below).select(
            F.col("vec_id").alias("qid"), F.col("svec").alias("qsvec")
        )
    )
    dist = (
        F.aggregate(
            F.zip_with(
                F.col("qsvec"), F.col("svec"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        .cast("long")
        .alias("dist")
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    etop = (
        queries.join(base, F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("qid", "vec_id")
    )
    atop = pq_adc_topk(
        df, query_ids_below, topk, m, k, dim, vec_col, id_col
    ).select("qid", "vec_id")
    n_exact = etop.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    n_pq = atop.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_pq")
    )
    n_common = (
        etop.join(atop, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        n_exact.join(n_pq, "qid")
        .join(n_common, "qid", "left")
        .na.fill({"n_common": 0})
        .select(
            F.col("qid").alias("query_id"),
            "n_exact",
            "n_pq",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr("(n_common * 1000000) div n_exact")
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def ivfpq_adc_topk(
    df: DataFrame,
    kc: int = 4,
    iters: int = 2,
    n_probe: int = 2,
    query_ids_below: int = 8,
    topk: int = 5,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ asymmetric-distance top-k — the full FAISS ``IVFADC``
    composition (Jégou et al., TPAMI 2011 §IV): a trained k-means
    coarse quantizer partitions the corpus into ``kc`` cells, every
    vector is PQ-encoded on its RESIDUAL against its coarse centroid
    (residuals are far better conditioned for quantization than raw
    vectors — the whole point of the composition), and a query scans
    only its ``n_probe`` best coarse cells, ranking candidates by the
    exact int64 sum of per-subspace L2² between the QUERY RESIDUAL
    (w.r.t. the probed cell's centroid) and the candidate's assigned
    refined PQ centroid.

    Scale shape: coarse training is the deterministic Lloyd loop
    (:func:`..kmeans.train_cells` internals — one scan per round,
    literal codebook); residuals are one broadcast join (kc rows);
    PQ encode is the literal-codebook projection; the probe list
    (≤ q·n_probe rows) broadcasts, so ONLY vectors in probed cells
    enter the distance pipeline — the candidate set shrinks by
    ~n_probe/kc before any per-subspace work, which is exactly how a
    billion-vector index bounds query cost. At 100 TB the codes table
    would be written cell-partitioned so the probe join becomes
    partition pruning. All arithmetic exact int64 on the scaled grid —
    bit-identical to the unrolled-CTE oracle.
    """
    from pyspark.sql import Window

    from .kmeans import _assign_literal, _recompute
    from .similarity import cosine, dot, scaled

    d_sub = dim // m
    base = df.select(
        F.col(id_col).alias("vec_id"), scaled(F.col(vec_col)).alias("svec")
    ).withColumn("norm_sq", dot(F.col("svec"), F.col("svec")))

    centroids = (
        base.orderBy("vec_id")
        .limit(kc)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("svec").alias("cvec"),
            F.col("norm_sq").alias("cnorm"),
        )
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign_literal(base, centroids.collect()).localCheckpoint()
        centroids = _recompute(assigned)
    coarse = centroids  # floor-mean centroids of the FINAL assignment

    # residual grid: integer-valued doubles minus integer-valued floor
    # means — still exact integers on the grid
    resid = assigned.join(
        F.broadcast(coarse.select("cell", "cvec")), "cell"
    ).select(
        "vec_id",
        F.col("cell").alias("ccell"),
        F.zip_with("svec", "cvec", lambda x, c: x - c).alias("rvec"),
    )
    _, codes, cent_pq = _pq_codes_and_centroids(
        resid, m, k, dim, vec_col="rvec", id_col="vec_id", prescaled=True
    )

    queries = base.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("qid"),
        F.col("svec").alias("qsvec"),
        F.col("norm_sq").alias("qnorm"),
    )
    wprobe = Window.partitionBy("qid").orderBy(F.desc("psim"), F.asc("cell"))
    probes = (
        queries.crossJoin(F.broadcast(coarse))
        .withColumn(
            "psim",
            cosine(dot(F.col("qsvec"), F.col("cvec")), F.col("qnorm"), F.col("cnorm")),
        )
        .withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select(
            "qid",
            F.col("cell").alias("ccell"),
            F.zip_with("qsvec", "cvec", lambda x, c: x - c).alias("qrvec"),
        )
    )

    # probed-cell pruning FIRST (broadcast, bounded q·n_probe rows),
    # then the per-candidate code join
    cand = resid.select("vec_id", "ccell").join(F.broadcast(probes), "ccell")
    per = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(cent_pq), ["subspace", "cell"])
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.expr(f"slice(qrvec, subspace * {d_sub} + 1, {d_sub})"),
                    F.col("cvec"),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("long")
            .alias("dist"),
        )
    )
    sums = (
        per.filter(F.col("qid") != F.col("vec_id"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("dist").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        sums.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= topk)
        .select("qid", "vec_id", "adc_dist", "rnk")
    )
