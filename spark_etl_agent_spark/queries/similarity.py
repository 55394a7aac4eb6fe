"""Embedding similarity-search inventory (north-star extension — the
reference has no vector ops, SURVEY.md §2.10).

Determinism contract with the DuckDB oracle: components are quantized
to integer-valued doubles (floor(x·1e6)) so dot products are exact and
order-independent in both engines; see ``llm.similarity`` docstring.
"""

from __future__ import annotations

from pyspark.sql import Window

from ..llm import similarity as sim
from .base import QuerySpec, load

_SVEC = "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000))"

_SIGN_BUCKET = "concat(" + ", ".join(
    f"CASE WHEN svec[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(8)
) + ")"


def ann_bruteforce_topk(spark, sf_dir):
    return sim.brute_force_topk(load(spark, sf_dir, "embeddings"))


ANN_BRUTEFORCE_TOPK_SQL = f"""
WITH normed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
    list_dot_product(q.svec, c.svec) / (sqrt(q.norm_sq) * sqrt(c.norm_sq))
      AS cosine_sim
  FROM normed q JOIN normed c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 8
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, cosine_sim FROM ranked WHERE rnk <= 5
"""


def ann_sign_bucket_pairs(spark, sf_dir):
    return sim.ann_bucketed_pairs(load(spark, sf_dir, "embeddings"), min_cosine=0.2)


ANN_SIGN_BUCKET_PAIRS_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq,
    {_SIGN_BUCKET} AS bucket
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
  list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
    AS cosine_sim
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
      >= 0.2
"""


def embedding_cosine_neardup(spark, sf_dir):
    return sim.cosine_near_duplicates(
        load(spark, sf_dir, "embeddings"), min_cosine=0.3
    )


EMBEDDING_COSINE_NEARDUP_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq,
    {_SIGN_BUCKET} AS bucket
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
      AS cosine_sim
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_b AS vec_id, min(id_a) AS kept_id,
  count(*) AS n_dup_neighbors, max(cosine_sim) AS max_cosine
FROM pairs WHERE cosine_sim >= 0.3
GROUP BY id_b
"""


def neardup_components(spark, sf_dir):
    """Near-dup pairs → duplicate clusters: iterative min-label
    propagation (operators/graph.py) over the cosine-pair graph. The
    oracle is an exact recursive-CTE reachability closure — Spark's
    iterative loop must converge to the identical fixpoint."""
    from ..operators import graph  # local import avoids a cycle at module load

    pairs = sim.ann_bucketed_pairs(
        load(spark, sf_dir, "embeddings"), min_cosine=0.25
    ).select("id_a", "id_b")
    return graph.dedup_clusters(pairs)


# shared recursive-closure CTE chain (sign-bucket pairs → undirected
# edges → reachability → min-label components) — reused by
# neardup_components and neardup_cluster_keepers
_NEARDUP_COMP_CTES = f"""bucketed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq,
    {_SIGN_BUCKET} AS bucket
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
prs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
        >= 0.25
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM prs
  UNION ALL SELECT id_b AS u, id_a AS v FROM prs
),
reach(node, lbl) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)"""

NEARDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE {_NEARDUP_COMP_CTES}
SELECT component, count(*) AS n_members, max(node) AS max_member
FROM comp GROUP BY component
"""


def ann_ivf_topk(spark, sf_dir):
    return sim.ivf_topk(load(spark, sf_dir, "embeddings"))


ANN_IVF_TOPK_SQL = f"""
WITH svecs AS (
  SELECT vec_id, label, {_SVEC} AS svec FROM embeddings
),
normed AS (
  SELECT vec_id, label, svec, list_dot_product(svec, svec) AS norm_sq FROM svecs
),
cent_long AS (
  SELECT label, dim, floor(sum(svec[CAST(dim AS INT)]) / 1024) AS c
  FROM svecs, range(1, 65) t(dim) GROUP BY label, dim
),
cent AS (
  SELECT label AS cent_cell, list(c ORDER BY dim) AS cvec
  FROM cent_long GROUP BY label
),
cent_n AS (
  SELECT cent_cell, cvec, list_dot_product(cvec, cvec) AS cnorm FROM cent
),
q AS (
  SELECT vec_id AS query_id, svec AS q_svec, norm_sq AS q_norm
  FROM normed WHERE vec_id < 8
),
probes AS (
  SELECT query_id, q_svec, q_norm, cent_cell AS label FROM (
    SELECT q.query_id, q.q_svec, q.q_norm, c.cent_cell,
      row_number() OVER (
        PARTITION BY q.query_id
        ORDER BY list_dot_product(q.q_svec, c.cvec)
                 / (sqrt(q.q_norm) * sqrt(c.cnorm)) DESC, c.cent_cell
      ) AS pr
    FROM q, cent_n c
  ) WHERE pr <= 2
),
pairs AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
    list_dot_product(p.q_svec, n.svec) / (sqrt(p.q_norm) * sqrt(n.norm_sq))
      AS cosine_sim
  FROM probes p JOIN normed n ON n.label = p.label AND n.vec_id != p.query_id
)
SELECT query_id, neighbor_id, rnk, cosine_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= 5
"""


def kmeans_cell_profile(spark, sf_dir):
    """Deterministic Lloyd's k-means (k=4, 2 rounds) → per-cell size and
    id checksum. The oracle re-runs the identical rounds as unrolled
    CTEs — the iterative Spark loop must land on the same fixpoint
    prefix."""
    from ..llm import kmeans

    return kmeans.cell_profile(
        kmeans.train_cells(load(spark, sf_dir, "embeddings"), k=4, iters=2)
    )


def _kmeans_round_sql(i: int) -> str:
    """One unrolled Lloyd round: assignment against cent{i}, then
    cent{i+1} as per-cell floor-mean centroids."""
    return f"""
assign{i} AS (
  SELECT vec_id, svec, norm_sq, cell FROM (
    SELECT b.vec_id, b.svec, b.norm_sq, c.cell,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        list_dot_product(b.svec, c.cvec) / (sqrt(b.norm_sq) * sqrt(c.cnorm))
          DESC, c.cell) AS r
    FROM base b, cent{i} c
  ) WHERE r = 1
),
cl{i} AS (
  SELECT cell, dim,
    CAST(floor(sum(svec[CAST(dim AS INT)]) / count(*)) AS DOUBLE) AS c
  FROM assign{i}, range(1, 65) t(dim)
  GROUP BY cell, dim
),
cent{i + 1} AS (
  SELECT cell, cvec, list_dot_product(cvec, cvec) AS cnorm
  FROM (SELECT cell, list(c ORDER BY dim) AS cvec FROM cl{i} GROUP BY cell)
)"""


KMEANS_CELL_PROFILE_SQL = f"""
WITH base AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id LIMIT 4
),
{_kmeans_round_sql(0)},
{_kmeans_round_sql(1)}
SELECT cell, count(*) AS n_members,
  CAST(sum(vec_id) AS BIGINT) AS id_checksum,
  min(vec_id) AS min_member
FROM assign1 GROUP BY cell
"""


def ivf_append_assign(spark, sf_dir):
    """IVF index append (`llm/kmeans.py::append_assign`): cells trained
    on the standing index (vec_id % 10 != 0), the arriving tenth
    assigned to the FROZEN final centroids without retraining — the
    incremental vector-index maintenance audit. The oracle replays the
    identical trainer rounds on the index slice, then the frozen
    argmax assignment of the batch."""
    from ..llm import kmeans

    emb = load(spark, sf_dir, "embeddings")
    return kmeans.append_assign(
        emb.filter(F.col("vec_id") % 10 != 0),
        emb.filter(F.col("vec_id") % 10 == 0),
        k=4,
        iters=2,
    )


IVF_APPEND_ASSIGN_SQL = f"""
WITH allb AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {{_SVEC}} AS svec FROM embeddings)
),
base AS (SELECT * FROM allb WHERE vec_id % 10 <> 0),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id LIMIT 4
),
{{round0}},
{{round1}},
newv AS (SELECT * FROM allb WHERE vec_id % 10 = 0),
nass AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, c.cell,
      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        list_dot_product(n.svec, c.cvec) / (sqrt(n.norm_sq) * sqrt(c.cnorm))
          DESC, c.cell) AS r
    FROM newv n, cent2 c
  ) WHERE r = 1
),
before AS (SELECT cell, count(*) AS n_before FROM assign1 GROUP BY cell),
app AS (
  SELECT cell, count(*) AS n_appended,
    CAST(sum(vec_id) AS BIGINT) AS appended_checksum,
    min(vec_id) AS min_appended
  FROM nass GROUP BY cell
)
SELECT b.cell, CAST(b.n_before AS BIGINT) AS n_before,
  CAST(coalesce(a.n_appended, 0) AS BIGINT) AS n_appended,
  CAST(coalesce(a.appended_checksum, 0) AS BIGINT) AS appended_checksum,
  a.min_appended
FROM before b LEFT JOIN app a USING (cell)
""".format(
    _SVEC=_SVEC, round0=_kmeans_round_sql(0), round1=_kmeans_round_sql(1)
)


def embedding_outlier_report(spark, sf_dir):
    """Distance-to-centroid outliers: per trained k-means cell, the 3
    members farthest from their own final centroid (lowest cosine, id
    tiebreak) plus the cell size — the noise/off-distribution review
    list. The per-cell ranking goes through ``salted_topk`` (cells are
    few; a plain cell window would sort the corpus in k reducers); the
    oracle replays the identical trainer rounds then ranks with one
    window."""
    from ..llm import kmeans

    return kmeans.outlier_report(
        load(spark, sf_dir, "embeddings"), k=4, iters=2, bottom_n=3
    )


EMBEDDING_OUTLIER_REPORT_SQL = f"""
WITH base AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id LIMIT 4
),
{_kmeans_round_sql(0)},
{_kmeans_round_sql(1)},
member AS (
  SELECT a.cell, a.vec_id,
    list_dot_product(a.svec, c.cvec) / (sqrt(a.norm_sq) * sqrt(c.cnorm))
      AS cosine_to_centroid
  FROM assign1 a JOIN cent2 c USING (cell)
),
rk AS (
  SELECT cell, vec_id, cosine_to_centroid,
    row_number() OVER (
      PARTITION BY cell ORDER BY cosine_to_centroid ASC, vec_id
    ) AS rnk,
    count(*) OVER (PARTITION BY cell) AS nm
  FROM member
)
SELECT cell, vec_id, CAST(rnk AS INT) AS outlier_rank,
  cosine_to_centroid, CAST(nm AS BIGINT) AS cell_n_members
FROM rk WHERE rnk <= 3
"""


def neardup_cluster_keepers(spark, sf_dir):
    """Duplicate-cluster keeper selection: cluster the near-dup pairs
    into components, join each member to its document, and keep the
    LONGEST document per cluster (n_chars DESC, id tiebreak) — the
    keep-best-version verdict a production dedup emits instead of
    keep-lowest-id. Output per cluster: keeper id/length and how many
    members get dropped. The component labels come from the iterative
    min-label propagation; the argmax is one window inside the
    component partition — both node-sized frames, no extra corpus
    shuffle."""
    from ..operators import graph

    pairs = sim.ann_bucketed_pairs(
        load(spark, sf_dir, "embeddings"), min_cosine=0.25
    ).select("id_a", "id_b")
    cc = graph.connected_components(pairs)
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    member = cc.join(docs, "node")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    ranked = member.withColumn("_r", F.row_number().over(w))
    return ranked.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(F.when(F.col("_r") == 1, F.col("node"))).alias("keeper_id"),
        F.max(F.when(F.col("_r") == 1, F.col("n_chars"))).alias(
            "keeper_chars"
        ),
        (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_dropped"),
    )


NEARDUP_CLUSTER_KEEPERS_SQL = f"""
WITH RECURSIVE {_NEARDUP_COMP_CTES},
member AS (
  SELECT c.component, c.node, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
rk AS (
  SELECT component, node, n_chars,
    row_number() OVER (
      PARTITION BY component ORDER BY n_chars DESC, node
    ) AS r
  FROM member
)
SELECT component,
  CAST(count(*) AS BIGINT) AS n_members,
  max(CASE WHEN r = 1 THEN node END) AS keeper_id,
  max(CASE WHEN r = 1 THEN n_chars END) AS keeper_chars,
  CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM rk GROUP BY component
"""


def ann_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN with TRAINED cells: the Lloyd's k-means assignment
    (k=4, 2 rounds — the same deterministic trainer the
    ``kmeans_cell_profile`` oracle replays) replaces the label column
    as the IVF partition, so the index quality comes from the data's
    own geometry rather than a metadata column. At 100 TB the chain is
    trainer (one scan/round, broadcast codebook) → one vec_id-keyed
    join to attach cells → the IVF probe (broadcast centroids, one
    cell-id shuffle)."""
    from ..llm import kmeans

    emb = load(spark, sf_dir, "embeddings")
    cells = kmeans.train_cells(emb, k=4, iters=2)
    return sim.ivf_topk(emb.join(cells, "vec_id"), cell_col="cell")


ANN_IVF_KMEANS_TOPK_SQL = f"""
WITH base AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id LIMIT 4
),
{_kmeans_round_sql(0)},
{_kmeans_round_sql(1)},
normed AS (
  SELECT vec_id, cell, svec, norm_sq FROM assign1
),
cent_long AS (
  SELECT cell, dim, floor(sum(svec[CAST(dim AS INT)]) / 1024) AS c
  FROM normed, range(1, 65) t(dim) GROUP BY cell, dim
),
centk AS (
  SELECT cell AS cent_cell, list(c ORDER BY dim) AS cvec
  FROM cent_long GROUP BY cell
),
centk_n AS (
  SELECT cent_cell, cvec, list_dot_product(cvec, cvec) AS cnorm FROM centk
),
q AS (
  SELECT vec_id AS query_id, svec AS q_svec, norm_sq AS q_norm
  FROM normed WHERE vec_id < 8
),
probes AS (
  SELECT query_id, q_svec, q_norm, cent_cell AS cell FROM (
    SELECT q.query_id, q.q_svec, q.q_norm, c.cent_cell,
      row_number() OVER (
        PARTITION BY q.query_id
        ORDER BY list_dot_product(q.q_svec, c.cvec)
                 / (sqrt(q.q_norm) * sqrt(c.cnorm)) DESC, c.cent_cell
      ) AS pr
    FROM q, centk_n c
  ) WHERE pr <= 2
),
pairs AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
    list_dot_product(p.q_svec, n.svec) / (sqrt(p.q_norm) * sqrt(n.norm_sq))
      AS cosine_sim
  FROM probes p JOIN normed n ON n.cell = p.cell AND n.vec_id != p.query_id
)
SELECT query_id, neighbor_id, rnk, cosine_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= 5
"""


def embedding_label_centroids(spark, sf_dir):
    return sim.label_centroids(load(spark, sf_dir, "embeddings"))


EMBEDDING_LABEL_CENTROIDS_SQL = """
WITH exploded AS (
  SELECT label, dim,
    floor(CAST(embedding[CAST(dim AS INT)] AS DOUBLE) * 1000000) AS sval
  FROM embeddings, range(1, 65) t(dim)
)
SELECT label, dim,
  sum(sval) / CAST(count(*) AS DOUBLE) / 1000000.0 AS centroid,
  count(*) AS n_vecs
FROM exploded GROUP BY label, dim
"""



def embedding_label_medoids(spark, sf_dir):
    return sim.label_medoids(load(spark, sf_dir, "embeddings"))


EMBEDDING_LABEL_MEDOIDS_SQL = f"""
WITH svecs AS (
  SELECT vec_id, label, {_SVEC} AS svec FROM embeddings
),
cent_long AS (
  SELECT label, dim,
    floor(sum(svec[CAST(dim AS INT)]) / CAST(count(*) AS DOUBLE)) AS cq
  FROM svecs, range(1, 65) t(dim) GROUP BY label, dim
),
cent AS (
  SELECT label, list(cq ORDER BY dim) AS cvec FROM cent_long GROUP BY label
),
scored AS (
  SELECT v.label, v.vec_id,
    list_dot_product(v.svec, c.cvec)
      / (sqrt(list_dot_product(v.svec, v.svec))
         * sqrt(list_dot_product(c.cvec, c.cvec))) AS centroid_sim
  FROM svecs v JOIN cent c ON c.label = v.label
)
SELECT label, vec_id AS medoid_id, centroid_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY label ORDER BY centroid_sim DESC, vec_id) AS rn
  FROM scored
) WHERE rn = 1
"""


def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization + fidelity report — the
    index-compression tier of a 100 TB ANN stack (`llm/quantize.py`)."""
    from ..llm.quantize import quantize_int8_report

    return quantize_int8_report(load(spark, sf_dir, "embeddings"))


EMBEDDING_QUANTIZE_INT8_SQL = """
WITH x AS (
  SELECT vec_id,
    list_transform(embedding, v -> floor(CAST(v AS DOUBLE) * 1000000)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
    list_max(list_transform(e, v -> abs(v))) / 127.0 AS scale
  FROM x
),
q AS (
  SELECT vec_id, e, scale,
    CASE WHEN scale > 0
         THEN list_transform(e, v -> round(v / scale))
         ELSE list_transform(e, v -> 0.0) END AS qv
  FROM s
),
err AS (
  SELECT vec_id, e, scale, qv,
    list_transform(range(1, len(e) + 1),
      i -> CAST(round(abs(qv[CAST(i AS INT)] * scale - e[CAST(i AS INT)])
                      * 1000) AS BIGINT)) AS errs
  FROM q
)
SELECT vec_id,
  len(e) AS n_dims,
  scale,
  CAST(coalesce(list_sum(errs), 0) AS BIGINT) AS sum_abs_err,
  CAST(coalesce(list_max(errs), 0) AS BIGINT) AS max_abs_err,
  CASE WHEN scale > 0 AND list_dot_product(qv, qv) > 0
       THEN list_dot_product(e, qv)
            / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(qv, qv)))
       END AS cos_fidelity
FROM err
"""


QUERIES = {
    "embedding_quantize_int8": QuerySpec(
        "embedding_quantize_int8", embedding_quantize_int8,
        EMBEDDING_QUANTIZE_INT8_SQL,
        "Int8 scalar quantization + exact fidelity report per vector",
        ("similarity", "llm"),
    ),
    "embedding_label_medoids": QuerySpec(
        "embedding_label_medoids", embedding_label_medoids,
        EMBEDDING_LABEL_MEDOIDS_SQL,
        "Per-label exemplar: member closest to the label centroid",
        ("similarity", "llm", "window"),
    ),
    "ann_bruteforce_topk": QuerySpec(
        "ann_bruteforce_topk", ann_bruteforce_topk, ANN_BRUTEFORCE_TOPK_SQL,
        "Exact cosine top-5 per query vector (broadcast × scan)",
        ("similarity", "llm"),
    ),
    "ann_sign_bucket_pairs": QuerySpec(
        "ann_sign_bucket_pairs", ann_sign_bucket_pairs, ANN_SIGN_BUCKET_PAIRS_SQL,
        "Sign-bucket (hyperplane-LSH) approximate near-neighbor pairs",
        ("similarity", "llm"),
    ),
    "embedding_cosine_neardup": QuerySpec(
        "embedding_cosine_neardup", embedding_cosine_neardup,
        EMBEDDING_COSINE_NEARDUP_SQL,
        "Embedding-cosine near-duplicate map (LSH-bucketed, keep-min-id)",
        ("similarity", "dedup", "llm"),
    ),
    "neardup_components": QuerySpec(
        "neardup_components", neardup_components, NEARDUP_COMPONENTS_SQL,
        "Duplicate clusters via iterative connected components",
        ("similarity", "dedup", "graph", "llm"),
    ),
    "ann_ivf_topk": QuerySpec(
        "ann_ivf_topk", ann_ivf_topk, ANN_IVF_TOPK_SQL,
        "IVF two-level ANN: centroid codebook, nprobe=2 cell search",
        ("similarity", "llm"),
    ),
    "ivf_append_assign": QuerySpec(
        "ivf_append_assign", ivf_append_assign, IVF_APPEND_ASSIGN_SQL,
        "IVF append: batch assigned to frozen trained cells, growth audit",
        ("similarity", "kmeans", "llm"),
    ),
    "kmeans_cell_profile": QuerySpec(
        "kmeans_cell_profile", kmeans_cell_profile, KMEANS_CELL_PROFILE_SQL,
        "Deterministic Lloyd's k-means cells (k=4, 2 rounds)",
        ("similarity", "iterative", "llm"),
    ),
    "ann_ivf_kmeans_topk": QuerySpec(
        "ann_ivf_kmeans_topk", ann_ivf_kmeans_topk, ANN_IVF_KMEANS_TOPK_SQL,
        "IVF ANN over trained k-means cells (trainer → index chain)",
        ("similarity", "iterative", "llm"),
    ),
    "embedding_outlier_report": QuerySpec(
        "embedding_outlier_report", embedding_outlier_report,
        EMBEDDING_OUTLIER_REPORT_SQL,
        "Per-cell farthest-from-centroid outliers (salted top-k rank)",
        ("similarity", "iterative", "llm"),
    ),
    "neardup_cluster_keepers": QuerySpec(
        "neardup_cluster_keepers", neardup_cluster_keepers,
        NEARDUP_CLUSTER_KEEPERS_SQL,
        "Keep-longest keeper per near-dup cluster (components → argmax)",
        ("similarity", "dedup", "graph", "llm"),
    ),
    "embedding_label_centroids": QuerySpec(
        "embedding_label_centroids", embedding_label_centroids,
        EMBEDDING_LABEL_CENTROIDS_SQL,
        "Per-label centroid components (posexplode → bounded-key agg)",
        ("similarity", "llm", "agg"),
    ),
}


def semantic_dedup_embeddings(spark, sf_dir):
    """SemDeDup: k-means cells bound the pairwise compare; every vector
    with a lower-id cell-mate above the cosine threshold is dropped and
    mapped to its most-similar keeper.

    k SCALES WITH THE CORPUS — ``clamp(n/125, 16, 128)`` — which IS the
    SemDeDup contract: cells stay ~125 wide so the within-cell
    quadratic is bounded at any data size instead of growing as
    (n/k)² under a pinned k (the one super-linear row of the first 10x
    scale A/B). The count is one cheap metadata-sized job; the oracle
    computes the identical k via a scalar-subquery LIMIT, so results
    stay bit-matched at every SF (k = 16 at all test fixtures)."""
    emb = load(spark, sf_dir, "embeddings")
    k = max(16, min(128, emb.count() // 125))
    return sim.semantic_dedup(
        emb,
        k=k,
        iters=2,
        min_cosine=0.35,
        # in-operator guard LIVE in the shipped query (the SimHash
        # hot-bucket lesson): a boilerplate corpus that collapses into
        # one cell must raise, not silently go quadratic
        max_cell_width=10_000,
    )


SEMANTIC_DEDUP_SQL = f"""
WITH base AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id
  LIMIT (SELECT greatest(16, least(128, count(*) // 125)) FROM embeddings)
),
{_kmeans_round_sql(0)},
{_kmeans_round_sql(1)},
pairs AS (
  SELECT a.vec_id AS vec_id, a.cell AS cell, b.vec_id AS keeper_id,
    list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
      AS cosine_sim
  FROM assign1 a JOIN assign1 b
    ON b.cell = a.cell AND b.vec_id < a.vec_id
)
SELECT vec_id, cell, keeper_id, cosine_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY vec_id ORDER BY cosine_sim DESC, keeper_id) AS rn
  FROM pairs WHERE cosine_sim >= 0.35
) WHERE rn = 1
"""


QUERIES["semantic_dedup_embeddings"] = QuerySpec(
    "semantic_dedup_embeddings",
    semantic_dedup_embeddings,
    SEMANTIC_DEDUP_SQL,
    "SemDeDup: within-k-means-cell cosine dedup, keep-lowest-id",
    ("similarity", "dedup", "iterative", "llm"),
)


def pq_encode_cells(spark, sf_dir):
    """Product-quantization encode (m=4 subspaces × k=8 cells) +
    residual fidelity grid — the memory-compression layer of a
    billion-vector ANN index."""
    from ..llm.quantize import pq_encode_stats

    return pq_encode_stats(load(spark, sf_dir, "embeddings"))


def _pq_subspace_sql(
    j: int, d_sub: int = 16, k: int = 8, src: str = "base", p: str = ""
) -> str:
    """One PQ subspace chain: seed-argmin assignment, floor-mean
    refined centroids, residual errors. ``src`` names the scaled-vector
    CTE (``base`` for raw vectors, the residual CTE for IVF-PQ) and
    ``p`` prefixes every generated CTE name so two PQ chains (or a PQ
    chain plus the k-means ``cent{i}`` CTEs) can coexist in one
    oracle."""
    a, b = j * d_sub + 1, (j + 1) * d_sub
    return f"""
{p}a{j} AS (
  SELECT vec_id, sub, cell FROM (
    SELECT b.vec_id, b.svec[{a}:{b}] AS sub, s.cell,
      row_number() OVER (PARTITION BY b.vec_id ORDER BY
        list_dot_product(b.svec[{a}:{b}], b.svec[{a}:{b}])
        - 2 * list_dot_product(b.svec[{a}:{b}], s.svec[{a}:{b}])
        + list_dot_product(s.svec[{a}:{b}], s.svec[{a}:{b}]) ASC,
        s.cell ASC) AS rn
    FROM {src} b, {p}seeds s
  ) WHERE rn = 1
),
{p}cl{j} AS (
  SELECT cell, dim,
    CAST(floor(sum(sub[CAST(dim AS INT)]) / count(*)) AS DOUBLE) AS cq
  FROM {p}a{j}, range(1, {d_sub + 1}) t(dim)
  GROUP BY cell, dim
),
{p}cent{j} AS (
  SELECT cell, list(cq ORDER BY dim) AS cvec FROM {p}cl{j} GROUP BY cell),
{p}r{j} AS (
  SELECT {j} AS subspace, a.cell,
    CAST(list_dot_product(a.sub, a.sub)
         - 2 * list_dot_product(a.sub, c.cvec)
         + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS err
  FROM {p}a{j} a JOIN {p}cent{j} c ON c.cell = a.cell
)"""


PQ_ENCODE_CELLS_SQL = (
    f"""
WITH base AS (
  SELECT vec_id, {_SVEC} AS svec FROM embeddings
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, svec
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8)
),
"""
    + ",".join(_pq_subspace_sql(j) for j in range(4))
    + """,
allr AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1
         UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
SELECT subspace, cell, count(*) AS n_members,
  CAST(sum(err) AS BIGINT) AS err_sum,
  CAST(sum(err) AS BIGINT) // count(*) AS err_mean
FROM allr GROUP BY subspace, cell
"""
)


QUERIES["pq_encode_cells"] = QuerySpec(
    "pq_encode_cells",
    pq_encode_cells,
    PQ_ENCODE_CELLS_SQL,
    "Product-quantization codes + exact residual grid (m=4, k=8)",
    ("similarity", "quantize", "llm"),
)


def hard_negatives_embeddings(spark, sf_dir):
    """Hard-negative mining: nearest different-label neighbors per
    probe vector (the contrastive-training negative sampler)."""
    return sim.hard_negatives_topk(load(spark, sf_dir, "embeddings"))


HARD_NEGATIVES_SQL = f"""
WITH normed AS (
  SELECT vec_id, label, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, label, {_SVEC} AS svec FROM embeddings)
),
pairs AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
    c.vec_id AS neighbor_id, c.label AS neighbor_label,
    list_dot_product(q.svec, c.svec) / (sqrt(q.norm_sq) * sqrt(c.norm_sq))
      AS cosine_sim
  FROM normed q JOIN normed c ON c.label != q.label
  WHERE q.vec_id < 8
)
SELECT query_id, query_label, neighbor_id, neighbor_label, rnk, cosine_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS rnk
  FROM pairs
) WHERE rnk <= 5
"""


QUERIES["hard_negatives_embeddings"] = QuerySpec(
    "hard_negatives_embeddings",
    hard_negatives_embeddings,
    HARD_NEGATIVES_SQL,
    "Hard-negative mining: top-k nearest different-label vectors per probe",
    ("similarity", "llm"),
)


def embedding_covariance(spark, sf_dir):
    """Exact dim×dim second-moment grid via Arrow-batched int64 BLAS
    partials + a DECIMAL(38,0) reduce — bit-identical to the oracle's
    explode² restatement at any parallelism."""
    from ..llm.whiten import covariance_grid

    return covariance_grid(load(spark, sf_dir, "embeddings"))


EMBEDDING_COVARIANCE_SQL = f"""
WITH s AS (SELECT vec_id, {_SVEC} AS svec FROM embeddings),
pairsum AS (
  SELECT i.dim AS dim_i, j.dim AS dim_j,
    sum(CAST(svec[CAST(i.dim AS INT)] AS BIGINT)
        * CAST(svec[CAST(j.dim AS INT)] AS BIGINT)) AS s_ij
  FROM s, range(1, 65) i(dim), range(1, 65) j(dim)
  GROUP BY 1, 2
),
marg AS (
  SELECT dim, sum(CAST(svec[CAST(dim AS INT)] AS BIGINT)) AS s_m
  FROM s, range(1, 65) t(dim) GROUP BY dim
),
nn AS (SELECT count(*) AS n FROM s)
SELECT CAST(p.dim_i AS INT) AS dim_i, CAST(p.dim_j AS INT) AS dim_j,
  CAST(nn.n AS BIGINT) AS n,
  CAST(p.s_ij AS VARCHAR) AS s_ij_str,
  CAST(floor(
    ((CAST(p.s_ij AS DOUBLE)
      - (CAST(mi.s_m AS DOUBLE) * CAST(mj.s_m AS DOUBLE))
        / CAST(nn.n AS DOUBLE))
     / CAST(nn.n AS DOUBLE)) / 1e12 * 1e6) AS BIGINT) AS cov_micro
FROM pairsum p
JOIN marg mi ON mi.dim = p.dim_i
JOIN marg mj ON mj.dim = p.dim_j, nn
"""


QUERIES["embedding_covariance"] = QuerySpec(
    "embedding_covariance",
    embedding_covariance,
    EMBEDDING_COVARIANCE_SQL,
    "Exact covariance grid: int64 BLAS partials, DECIMAL reduce",
    ("similarity", "stats", "llm"),
)


def neardup_triangles(spark, sf_dir):
    """Per-node triangle counts over the cosine near-dup pair graph —
    the clique-vs-chain diagnostic for dedup clusters (oriented-wedge
    enumeration + one closing equi-join; `operators/graph.py`)."""
    from ..operators.graph import triangle_counts

    pairs = sim.ann_bucketed_pairs(
        load(spark, sf_dir, "embeddings"), min_cosine=0.2
    ).select("id_a", "id_b")
    return triangle_counts(pairs)


NEARDUP_TRIANGLES_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq,
    {_SIGN_BUCKET} AS bucket
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
e AS (
  SELECT DISTINCT a.vec_id AS u, b.vec_id AS v
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.svec, b.svec) / (sqrt(a.norm_sq) * sqrt(b.norm_sq))
        >= 0.2
),
wedges AS (
  SELECT ab.a, ab.b, bc.c
  FROM (SELECT u AS a, v AS b FROM e) ab
  JOIN (SELECT u AS b, v AS c FROM e) bc ON bc.b = ab.b
),
tris AS (
  SELECT w.a, w.b, w.c
  FROM wedges w
  JOIN (SELECT u AS a, v AS c FROM e) cl ON cl.a = w.a AND cl.c = w.c
),
corners AS (
  SELECT a AS node FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris
),
tcount AS (SELECT node, count(*) AS n FROM corners GROUP BY node),
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
)
SELECT deg.node, deg.degree, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_triangles
FROM deg LEFT JOIN tcount t ON t.node = deg.node
"""


QUERIES["neardup_triangles"] = QuerySpec(
    "neardup_triangles",
    neardup_triangles,
    NEARDUP_TRIANGLES_SQL,
    "Per-node triangles in the near-dup graph (oriented-wedge + close join)",
    ("similarity", "graph", "llm"),
)


def ann_recall_report(spark, sf_dir):
    """Index-quality evaluation: recall of BOTH IVF variants (label
    cells and trained k-means cells, nprobe=2) against the exact
    brute-force top-5, per probe query — the "measure, don't guess"
    report an ANN deployment tunes cells/nprobe/k with. Pure
    composition of existing operators; the joins are between 40-row
    frames."""
    from ..llm import kmeans

    emb = load(spark, sf_dir, "embeddings")
    brute = sim.brute_force_topk(emb).select("query_id", "neighbor_id")
    ivf = sim.ivf_topk(emb).select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("n2")
    )
    kivf = sim.ivf_topk(
        emb.join(kmeans.train_cells(emb, k=4, iters=2), "vec_id"),
        cell_col="cell",
    ).select(F.col("query_id").alias("q3"), F.col("neighbor_id").alias("n3"))

    def overlap(approx, qc, nc, out):
        return (
            brute.join(
                approx,
                (F.col("query_id") == F.col(qc))
                & (F.col("neighbor_id") == F.col(nc)),
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    common = overlap(ivf, "q2", "n2", "n_common")
    kcommon = overlap(kivf, "q3", "n3", "n_common_kmeans")
    counts = brute.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_brute"))
    icounts = ivf.groupBy(F.col("q2").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_ivf")
    )
    kcounts = kivf.groupBy(F.col("q3").alias("query_id")).agg(
        F.count(F.lit(1)).alias("n_ivf_kmeans")
    )
    return (
        counts.join(icounts, "query_id")
        .join(kcounts, "query_id")
        .join(common, "query_id", "left")
        .join(kcommon, "query_id", "left")
        .select(
            "query_id",
            "n_brute",
            "n_ivf",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr("(coalesce(n_common, 0L) * 1000000) div n_brute")
            .cast("long")
            .alias("recall_ppm"),
            "n_ivf_kmeans",
            F.coalesce("n_common_kmeans", F.lit(0))
            .cast("long")
            .alias("n_common_kmeans"),
            F.expr("(coalesce(n_common_kmeans, 0L) * 1000000) div n_brute")
            .cast("long")
            .alias("recall_kmeans_ppm"),
        )
    )


from pyspark.sql import functions as F  # noqa: E402  (used above)

ANN_RECALL_REPORT_SQL = f"""
WITH brute AS (SELECT * FROM ({ANN_BRUTEFORCE_TOPK_SQL}) b),
ivf AS (SELECT * FROM ({ANN_IVF_TOPK_SQL}) i),
kivf AS (SELECT * FROM ({ANN_IVF_KMEANS_TOPK_SQL}) ki),
common AS (
  SELECT b.query_id, count(*) AS n_common
  FROM brute b JOIN ivf v
    ON v.query_id = b.query_id AND v.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
),
kcommon AS (
  SELECT b.query_id, count(*) AS n_common_kmeans
  FROM brute b JOIN kivf v
    ON v.query_id = b.query_id AND v.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
),
counts AS (SELECT query_id, count(*) AS n_brute FROM brute GROUP BY query_id),
icounts AS (SELECT query_id, count(*) AS n_ivf FROM ivf GROUP BY query_id),
kcounts AS (
  SELECT query_id, count(*) AS n_ivf_kmeans FROM kivf GROUP BY query_id
)
SELECT c.query_id, c.n_brute, i.n_ivf,
  CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
  (COALESCE(m.n_common, 0) * 1000000) // c.n_brute AS recall_ppm,
  k.n_ivf_kmeans,
  CAST(COALESCE(km.n_common_kmeans, 0) AS BIGINT) AS n_common_kmeans,
  (COALESCE(km.n_common_kmeans, 0) * 1000000) // c.n_brute
    AS recall_kmeans_ppm
FROM counts c
JOIN icounts i ON i.query_id = c.query_id
JOIN kcounts k ON k.query_id = c.query_id
LEFT JOIN common m ON m.query_id = c.query_id
LEFT JOIN kcommon km ON km.query_id = c.query_id
"""


QUERIES["ann_recall_report"] = QuerySpec(
    "ann_recall_report",
    ann_recall_report,
    ANN_RECALL_REPORT_SQL,
    "IVF-vs-exact recall evaluation per probe query (index tuning report)",
    ("similarity", "quality", "llm"),
)


def ann_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k: candidates live as m=4 codes, the
    query stays exact, distance = sum of exact L2-squared to the
    assigned refined centroids — the compressed-index ANN query path
    (Jegou et al. 2011)."""
    from ..llm.quantize import pq_adc_topk

    return pq_adc_topk(load(spark, sf_dir, "embeddings"))


def _pq_adc_sql(qib: int = 8, topk: int = 5, m: int = 4,
                d_sub: int = 16) -> str:
    dists = []
    for j in range(m):
        a, b = j * d_sub + 1, (j + 1) * d_sub
        dists.append(f"""
d{j} AS (
  SELECT q.qid, a.vec_id,
    CAST(list_dot_product(q.qsvec[{a}:{b}], q.qsvec[{a}:{b}])
         - 2 * list_dot_product(q.qsvec[{a}:{b}], c.cvec)
         + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS dist
  FROM a{j} a JOIN cent{j} c ON c.cell = a.cell, q
)""")
    alld = " UNION ALL ".join(f"SELECT * FROM d{j}" for j in range(m))
    return (
        f"""
WITH base AS (
  SELECT vec_id, {_SVEC} AS svec FROM embeddings
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, svec
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8)
),
"""
        + ",".join(_pq_subspace_sql(j) for j in range(m))
        + f""",
q AS (SELECT vec_id AS qid, svec AS qsvec FROM base WHERE vec_id < {qib}),
{",".join(dists)},
alld AS ({alld}),
sums AS (
  SELECT qid, vec_id, CAST(sum(dist) AS BIGINT) AS adc_dist
  FROM alld WHERE qid <> vec_id GROUP BY qid, vec_id
)
SELECT qid, vec_id, adc_dist, rnk FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (PARTITION BY qid
      ORDER BY adc_dist ASC, vec_id ASC) AS INT) AS rnk
  FROM sums
) WHERE rnk <= {topk}
"""
    )


ANN_PQ_ADC_TOPK_SQL = _pq_adc_sql()


QUERIES["ann_pq_adc_topk"] = QuerySpec(
    "ann_pq_adc_topk",
    ann_pq_adc_topk,
    ANN_PQ_ADC_TOPK_SQL,
    "PQ asymmetric-distance top-k over m=4 codes (compressed ANN)",
    ("similarity", "quantize", "llm", "window"),
)


def ann_pq_recall_report(spark, sf_dir):
    """PQ quantization-loss recall: ADC top-5 vs the exact L2 top-5 on
    the same scaled-integer grid, per probe query — the m/k sizing
    measurement for a compressed ANN index."""
    from ..llm.quantize import pq_adc_recall

    return pq_adc_recall(load(spark, sf_dir, "embeddings"))


def _pq_adc_recall_sql(qib: int = 8, topk: int = 5, m: int = 4,
                       d_sub: int = 16) -> str:
    dists = []
    for j in range(m):
        a, b = j * d_sub + 1, (j + 1) * d_sub
        dists.append(f"""
d{j} AS (
  SELECT q.qid, a.vec_id,
    CAST(list_dot_product(q.qsvec[{a}:{b}], q.qsvec[{a}:{b}])
         - 2 * list_dot_product(q.qsvec[{a}:{b}], c.cvec)
         + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS dist
  FROM a{j} a JOIN cent{j} c ON c.cell = a.cell, q
)""")
    alld = " UNION ALL ".join(f"SELECT * FROM d{j}" for j in range(m))
    return (
        f"""
WITH base AS (
  SELECT vec_id, {_SVEC} AS svec FROM embeddings
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, svec
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8)
),
"""
        + ",".join(_pq_subspace_sql(j) for j in range(m))
        + f""",
q AS (SELECT vec_id AS qid, svec AS qsvec FROM base WHERE vec_id < {qib}),
{",".join(dists)},
alld AS ({alld}),
sums AS (
  SELECT qid, vec_id, CAST(sum(dist) AS BIGINT) AS adc_dist
  FROM alld WHERE qid <> vec_id GROUP BY qid, vec_id
),
atop AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
      row_number() OVER (PARTITION BY qid
        ORDER BY adc_dist ASC, vec_id ASC) AS rn
    FROM sums
  ) WHERE rn <= {topk}
),
exact AS (
  SELECT q.qid, b.vec_id,
    CAST(list_dot_product(b.svec, b.svec)
         - 2 * list_dot_product(q.qsvec, b.svec)
         + list_dot_product(q.qsvec, q.qsvec) AS BIGINT) AS dist
  FROM base b, q WHERE b.vec_id <> q.qid
),
etop AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
      row_number() OVER (PARTITION BY qid
        ORDER BY dist ASC, vec_id ASC) AS rn
    FROM exact
  ) WHERE rn <= {topk}
),
ncommon AS (
  SELECT e.qid, count(*) AS n_common
  FROM etop e JOIN atop a ON a.qid = e.qid AND a.vec_id = e.vec_id
  GROUP BY e.qid
)
SELECT e.qid AS query_id,
  CAST(count(*) AS BIGINT) AS n_exact,
  CAST((SELECT count(*) FROM atop a WHERE a.qid = e.qid) AS BIGINT) AS n_pq,
  CAST(COALESCE(max(nc.n_common), 0) AS BIGINT) AS n_common,
  (CAST(COALESCE(max(nc.n_common), 0) AS BIGINT) * 1000000)
    // CAST(count(*) AS BIGINT) AS recall_ppm
FROM etop e LEFT JOIN ncommon nc ON nc.qid = e.qid
GROUP BY e.qid
"""
    )


ANN_PQ_RECALL_REPORT_SQL = _pq_adc_recall_sql()


QUERIES["ann_pq_recall_report"] = QuerySpec(
    "ann_pq_recall_report",
    ann_pq_recall_report,
    ANN_PQ_RECALL_REPORT_SQL,
    "PQ-ADC recall vs exact L2 top-k per probe query (ppm)",
    ("similarity", "quantize", "llm", "agg"),
)


def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ asymmetric-distance top-k (FAISS ``IVFADC``, Jégou et
    al. 2011): trained coarse cells + PQ codes on the residuals; a
    query probes its 2 best cells and ranks ONLY their members by
    exact int64 residual-ADC distance. Completes the ANN family:
    brute, sign-bucket LSH, IVF, IVF-k-means, PQ-ADC, IVF-PQ."""
    from ..llm.quantize import ivfpq_adc_topk

    return ivfpq_adc_topk(load(spark, sf_dir, "embeddings"))


def _ivfpq_sql(qib: int = 8, topk: int = 5, n_probe: int = 2, m: int = 4,
               d_sub: int = 16) -> str:
    dists = []
    for j in range(m):
        a, b = j * d_sub + 1, (j + 1) * d_sub
        dists.append(f"""
d{j} AS (
  SELECT p.qid, a.vec_id,
    CAST(list_dot_product(p.qrvec[{a}:{b}], p.qrvec[{a}:{b}])
         - 2 * list_dot_product(p.qrvec[{a}:{b}], c.cvec)
         + list_dot_product(c.cvec, c.cvec) AS BIGINT) AS dist
  FROM pa{j} a
  JOIN resid s ON s.vec_id = a.vec_id
  JOIN probes p ON p.ccell = s.ccell
  JOIN pcent{j} c ON c.cell = a.cell
)""")
    alld = " UNION ALL ".join(f"SELECT * FROM d{j}" for j in range(m))
    return (
        f"""
WITH base AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, {_SVEC} AS svec FROM embeddings)
),
cent0 AS (
  SELECT vec_id AS cell, svec AS cvec, norm_sq AS cnorm
  FROM base ORDER BY vec_id LIMIT 4
),
{_kmeans_round_sql(0)},
{_kmeans_round_sql(1)},
resid AS (
  SELECT a.vec_id, a.cell AS ccell,
    list_transform(range(1, 65),
      i -> a.svec[CAST(i AS INT)] - c.cvec[CAST(i AS INT)]) AS svec
  FROM assign1 a JOIN cent2 c ON c.cell = a.cell
),
pseeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
    svec
  FROM (SELECT vec_id, svec FROM resid ORDER BY vec_id LIMIT 8)
),
"""
        + ",".join(
            _pq_subspace_sql(j, src="resid", p="p") for j in range(m)
        )
        + f""",
q AS (
  SELECT vec_id AS qid, svec AS qsvec, norm_sq AS qnorm
  FROM base WHERE vec_id < {qib}
),
probes AS (
  SELECT qid, ccell,
    list_transform(range(1, 65),
      i -> qsvec[CAST(i AS INT)] - cvec[CAST(i AS INT)]) AS qrvec
  FROM (
    SELECT q.qid, q.qsvec, c.cell AS ccell, c.cvec,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        list_dot_product(q.qsvec, c.cvec) / (sqrt(q.qnorm) * sqrt(c.cnorm))
          DESC, c.cell) AS pr
    FROM q, cent2 c
  ) WHERE pr <= {n_probe}
),
{",".join(dists)},
alld AS ({alld}),
sums AS (
  SELECT qid, vec_id, CAST(sum(dist) AS BIGINT) AS adc_dist
  FROM alld WHERE qid <> vec_id GROUP BY qid, vec_id
)
SELECT qid, vec_id, adc_dist, rnk FROM (
  SELECT qid, vec_id, adc_dist,
    CAST(row_number() OVER (PARTITION BY qid
      ORDER BY adc_dist ASC, vec_id ASC) AS INT) AS rnk
  FROM sums
) WHERE rnk <= {topk}
"""
    )


ANN_IVFPQ_TOPK_SQL = _ivfpq_sql()


QUERIES["ann_ivfpq_topk"] = QuerySpec(
    "ann_ivfpq_topk",
    ann_ivfpq_topk,
    ANN_IVFPQ_TOPK_SQL,
    "IVF-PQ residual-ADC top-k: coarse k-means cells + PQ codes (IVFADC)",
    ("similarity", "quantize", "iterative", "llm"),
)


# Panel cut / vote size shared by the Spark call AND the oracle SQL —
# interpolated into both so a default change can never desynchronize
# them (same pattern as _FH_BUCKETS / _KANON_K).
_KNN_PROBES = 100
_KNN_K = 5


def knn_label_eval(spark, sf_dir):
    return sim.knn_label_eval(
        load(spark, sf_dir, "embeddings"), n_probes=_KNN_PROBES, k=_KNN_K
    )


KNN_LABEL_EVAL_SQL = f"""
WITH normed AS (
  SELECT vec_id, label, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id, label, {_SVEC} AS svec FROM embeddings)
),
probes AS (SELECT * FROM normed WHERE vec_id < {_KNN_PROBES}),
train AS (SELECT * FROM normed WHERE vec_id >= {_KNN_PROBES}),
pairs AS (
  SELECT p.vec_id AS query_id, p.label AS true_label,
    t.vec_id AS neighbor_id, t.label AS neighbor_label,
    list_dot_product(p.svec, t.svec)
      / (sqrt(p.norm_sq) * sqrt(t.norm_sq)) AS cosine_sim
  FROM probes p JOIN train t ON TRUE
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cosine_sim DESC, neighbor_id) AS rnk
  FROM pairs
),
votes AS (
  SELECT query_id, true_label, neighbor_label, COUNT(*) AS n_votes
  FROM ranked WHERE rnk <= {_KNN_K}
  GROUP BY query_id, true_label, neighbor_label
),
pick AS (
  SELECT query_id, true_label, neighbor_label,
    row_number() OVER (PARTITION BY query_id
      ORDER BY n_votes DESC, neighbor_label) AS vr
  FROM votes
)
SELECT true_label,
  CAST(COUNT(*) AS BIGINT) AS n_probes,
  CAST(SUM(CASE WHEN neighbor_label = true_label THEN 1 ELSE 0 END)
       AS BIGINT) AS n_correct,
  CAST(SUM(CASE WHEN neighbor_label = true_label THEN 1 ELSE 0 END)
       AS DOUBLE) / COUNT(*) AS accuracy
FROM pick WHERE vr = 1
GROUP BY true_label
ORDER BY true_label
"""


QUERIES["knn_label_eval"] = QuerySpec(
    "knn_label_eval",
    knn_label_eval,
    KNN_LABEL_EVAL_SQL,
    "k-NN classifier eval: per-label accuracy from a held-out panel",
    ("similarity", "eval", "llm"),
)
