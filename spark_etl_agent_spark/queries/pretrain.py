"""Pretraining-corpus preparation inventory: benchmark decontamination,
sequence packing (concat-and-chunk), and domain-mixture planning /
fractional-epoch resampling (``llm.decontam``, ``llm.packing``,
``llm.sampling``).

These are the corpus-assembly steps downstream of dedup/quality in a
training-data pipeline (SURVEY.md §7 LLM extension surface; no reference
analogue — the reference delegates all analytics to Redshift SQL,
services/jcap_pa_etl_service.py:176-227). Every query here is
oracle-checked against DuckDB with exact integer arithmetic or
single-division doubles, so results are bitwise engine-independent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.decontam import ngram_contamination
from ..llm.packing import pack_chunks, packing_summary
from ..llm.sampling import mixture_plan, resample_epochs
from ..llm.text import words_of
from .base import QuerySpec, fan_out, load

_WORDS = r"string_split_regex(lower(text), '\s+')"

# ---------------------------------------------------------------------------
# decontaminate_corpus


def decontaminate_corpus(spark, sf_dir):
    """Flag training docs sharing any word 3-gram with the held-out
    eval slice (doc_id % 97 == 0 stands in for a benchmark set). The
    benchmark n-gram set broadcasts; the corpus never shuffles for the
    membership probe — only for the per-doc aggregation. ``fan_out``
    widens the single-file fixture scan before the compute-heavy n-gram
    explode (a no-op on a many-split 100 TB scan; without it the whole
    explode serializes into one task — measured 8.4 s → 1.4 s at
    sf0.1)."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_contamination(train, bench, n=3)


DECONTAMINATE_CORPUS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS ngram
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i)
),
bench AS (SELECT DISTINCT ngram FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id,
       count(*) AS n_total_m,
       count(b.ngram) AS n_matched_m,
       CAST(count(b.ngram) AS DOUBLE) / count(*) AS contamination_ratio
FROM grams g LEFT JOIN bench b USING (ngram)
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
"""

# ---------------------------------------------------------------------------
# pack_documents / packing_audit

_BUDGET = 256


def _packed(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(words_of(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_chunks(docs, order_col="doc_id", tokens_col="n_tokens",
                       budget=_BUDGET)


def pack_documents(spark, sf_dir):
    """Concat-and-chunk span assignment: every document's half-open
    token-stream span and chunk range at a 256-token sequence length —
    computed with range-partitioned offsets, never a one-partition
    global window."""
    return _packed(spark, sf_dir).select(
        "doc_id", "n_tokens", "start_off", "end_off",
        "chunk_first", "chunk_last", "n_chunks",
    )


_PACK_CUM_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS end_off
  FROM toks
),
spans AS (
  SELECT doc_id, n_tokens, end_off, end_off - n_tokens AS start_off,
    (end_off - n_tokens) // {_BUDGET} AS chunk_first,
    greatest((end_off - n_tokens) // {_BUDGET},
             (end_off - 1) // {_BUDGET}) AS chunk_last
  FROM cum
)
"""

PACK_DOCUMENTS_SQL = (
    _PACK_CUM_SQL
    + """
SELECT doc_id, n_tokens, start_off, end_off, chunk_first, chunk_last,
       chunk_last - chunk_first + 1 AS n_chunks
FROM spans
"""
)


def packing_audit(spark, sf_dir):
    """Corpus-level packing report: total tokens/chunks, boundary
    straddlers, tail-chunk fill."""
    return packing_summary(_packed(spark, sf_dir), budget=_BUDGET)


PACKING_AUDIT_SQL = (
    _PACK_CUM_SQL
    + f"""
SELECT count(*) AS n_docs,
       max(end_off) AS total_tokens,
       (max(end_off) + {_BUDGET} - 1) // {_BUDGET} AS n_chunks_total,
       CAST(sum(CASE WHEN chunk_last > chunk_first THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddling,
       CASE WHEN max(end_off) % {_BUDGET} = 0 THEN CAST(1.0 AS DOUBLE)
            ELSE CAST(max(end_off) % {_BUDGET} AS DOUBLE) / {_BUDGET}.0
       END AS tail_fill_ratio
FROM spans
"""
)

# ---------------------------------------------------------------------------
# mixture_plan_langs

_MIX_W = {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125}
_MAX_EPOCHS = 4.0


def mixture_plan_langs(spark, sf_dir):
    """Language-mixture plan: largest corpus hitting the target language
    proportions without repeating any language more than 4 epochs."""
    docs = load(spark, sf_dir, "documents")
    return mixture_plan(docs, "lang", _MIX_W, max_epochs=_MAX_EPOCHS)


_W_CASE = "CASE lang " + " ".join(
    f"WHEN '{d}' THEN CAST({w} AS DOUBLE)" for d, w in _MIX_W.items()
) + " END"

MIXTURE_PLAN_LANGS_SQL = f"""
WITH tagged AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_avail, {_W_CASE} AS target_w
  FROM documents GROUP BY lang
),
scalar AS (
  SELECT min(CAST(n_avail AS DOUBLE) * {_MAX_EPOCHS} / target_w) AS scale
  FROM tagged WHERE target_w IS NOT NULL
)
SELECT lang, n_avail, target_w,
       CAST(floor(target_w * scale) AS BIGINT) AS n_target,
       CAST(floor(target_w * scale) AS DOUBLE) / n_avail AS epochs
FROM tagged, scalar
WHERE target_w IS NOT NULL
"""

# ---------------------------------------------------------------------------
# mixture_resample_counts

_EPOCHS = {"en": 1.0, "de": 2.5, "es": 0.6, "fr": 1.75, "zh": 3.25}


def mixture_resample_counts(spark, sf_dir):
    """Fractional-epoch materialization audit: emit floor(e) copies per
    doc plus a hash-gated extra (P = frac(e)); per-language emitted/
    unique counts. Membership hashes (doc_id, copy) so the resampled
    corpus is bit-reproducible at any partitioning — verified row-for-
    row by the oracle."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = resample_epochs(docs, key_col="doc_id", domain_col="lang",
                          epochs=_EPOCHS)
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_emitted"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


_E_CASE = "CASE lang " + " ".join(
    f"WHEN '{d}' THEN CAST({e} AS DOUBLE)" for d, e in _EPOCHS.items()
) + " END"

MIXTURE_RESAMPLE_COUNTS_SQL = f"""
WITH e AS (
  SELECT doc_id, lang, {_E_CASE} AS eps FROM documents
),
exploded AS (
  SELECT doc_id, lang, eps, copy
  FROM e, LATERAL unnest(generate_series(1, CAST(ceil(eps) AS INT))) AS u(copy)
  WHERE eps IS NOT NULL
)
SELECT lang, count(*) AS n_emitted, count(DISTINCT doc_id) AS n_docs
FROM exploded
WHERE copy <= floor(eps)
   OR CAST('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR) || ':'
                               || CAST(copy AS VARCHAR)), 1, 8) AS BIGINT)
      < CAST(floor((eps - floor(eps)) * 4294967296) AS BIGINT)
GROUP BY lang
"""

# ---------------------------------------------------------------------------
# corpus_shuffle_order


def corpus_shuffle_order(spark, sf_dir):
    """Deterministic global training-order shuffle: position = exact
    global rank of md5('shuf1' || doc_id). Reproducible (a pure row
    function of the key — re-runs and engines agree bit-for-bit) and
    computed with range-partitioned rank offsets, never a
    one-partition global sort (``operators.ranks.global_rank``)."""
    from ..operators.ranks import global_rank

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf1"), F.col("doc_id").cast("string"))).alias(
            "__h"
        ),
    )
    return global_rank(docs, [F.col("__h")], rank_col="shuffle_pos").select(
        "doc_id", "shuffle_pos"
    )


CORPUS_SHUFFLE_ORDER_SQL = """
SELECT doc_id,
  row_number() OVER (
    ORDER BY md5('shuf1' || CAST(doc_id AS VARCHAR))
  ) AS shuffle_pos
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus_cluster_quality


def corpus_cluster_quality(spark, sf_dir):
    """Cross-table curation report: documents joined to their embedding
    cluster (doc_id = vec_id), per-label volume and text-quality
    signals — the view that tells you WHICH semantic clusters are
    boilerplate-heavy before downweighting them in the mixture. The
    embeddings side is projected to (id, label) before the join; the
    per-doc density is micro-quantized so per-label averages are exact
    integer sums divided once."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    per_doc = docs.join(emb, "doc_id").select(
        "label",
        F.col("n_chars"),
        F.floor(
            F.size(words_of(F.col("text"))).cast("double")
            / (F.col("n_chars") + F.lit(1)).cast("double")
            * F.lit(1000000.0)
        ).cast("bigint").alias("density_micro"),
    )
    return per_doc.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (
            F.sum("density_micro").cast("double") / F.count(F.lit(1))
        ).alias("avg_density_micro"),
    )


CORPUS_CLUSTER_QUALITY_SQL = f"""
WITH per_doc AS (
  SELECT e.label, d.n_chars,
    CAST(floor(CAST(len({_WORDS}) AS DOUBLE)
               / CAST(d.n_chars + 1 AS DOUBLE) * 1000000.0) AS BIGINT)
      AS density_micro
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
)
SELECT label,
  count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(density_micro) AS DOUBLE) / count(*) AS avg_density_micro
FROM per_doc GROUP BY label
"""



# ---------------------------------------------------------------------------
# chunk_documents (RAG-style overlapping windows)

_CHUNK_W = 32   # words per chunk
_CHUNK_S = 24   # stride (8-word overlap)


def chunk_documents(spark, sf_dir):
    """Split every document into overlapping word windows (W=32,
    stride=24) — the retrieval-corpus preparation step (distinct from
    ``pack_documents``, which CONCATENATES docs; chunking SPLITS them).
    Pure array expressions: per-row transform + explode, zero shuffle,
    scan-bound at any scale. Chunk content is fingerprinted (md5) so
    the result stays narrow while still verifying the exact text of
    every chunk against the oracle."""
    docs = load(spark, sf_dir, "documents")
    words = words_of(F.col("text"))
    n = F.size(words)
    # pure Column arithmetic (an F.expr would re-tokenize text and
    # invite SQL-string escaping bugs); values are small ints, so the
    # floor(double/int) is exact
    k_max = F.when(
        n > _CHUNK_W,
        F.floor((n - _CHUNK_W + _CHUNK_S - 1) / _CHUNK_S).cast("int"),
    ).otherwise(F.lit(0))
    chunks = F.transform(
        F.sequence(F.lit(0), k_max),
        lambda k: F.slice(words, k * _CHUNK_S + 1, _CHUNK_W),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "cw")
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * _CHUNK_S + 1).alias("start_word"),
        F.size("cw").cast("bigint").alias("n_chunk_words"),
        F.md5(F.concat_ws(" ", F.col("cw"))).alias("chunk_md5"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_WORDS} AS t FROM documents
),
spans AS (
  SELECT doc_id, t, k AS chunk_idx
  FROM toks, LATERAL unnest(generate_series(0,
    CASE WHEN len(t) > {_CHUNK_W}
         THEN (len(t) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}
         ELSE 0 END)) AS u(k)
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
  chunk_idx * {_CHUNK_S} + 1 AS start_word,
  CAST(len(t[CAST(chunk_idx * {_CHUNK_S} + 1 AS INT)
            : CAST(chunk_idx * {_CHUNK_S} + {_CHUNK_W} AS INT)]) AS BIGINT)
    AS n_chunk_words,
  md5(array_to_string(t[CAST(chunk_idx * {_CHUNK_S} + 1 AS INT)
            : CAST(chunk_idx * {_CHUNK_S} + {_CHUNK_W} AS INT)], ' '))
    AS chunk_md5
FROM spans
"""


# ---------------------------------------------------------------------------

QUERIES = {
    "chunk_documents": QuerySpec(
        "chunk_documents", chunk_documents, CHUNK_DOCUMENTS_SQL,
        "Overlapping word-window chunking (RAG corpus prep, zero shuffle)",
        ("llm", "text", "projection"),
    ),
    "corpus_cluster_quality": QuerySpec(
        "corpus_cluster_quality", corpus_cluster_quality,
        CORPUS_CLUSTER_QUALITY_SQL,
        "Per-embedding-cluster text-quality report (docs x embeddings join)",
        ("llm", "join", "agg"),
    ),
    "corpus_shuffle_order": QuerySpec(
        "corpus_shuffle_order", corpus_shuffle_order,
        CORPUS_SHUFFLE_ORDER_SQL,
        "Reproducible global corpus shuffle via distributed hash rank",
        ("llm", "sampling", "window"),
    ),
    "decontaminate_corpus": QuerySpec(
        "decontaminate_corpus", decontaminate_corpus,
        DECONTAMINATE_CORPUS_SQL,
        "Benchmark n-gram decontamination (broadcast eval-set probe)",
        ("llm", "decontam", "join"),
    ),
    "pack_documents": QuerySpec(
        "pack_documents", pack_documents, PACK_DOCUMENTS_SQL,
        "Concat-and-chunk sequence packing spans (distributed offsets)",
        ("llm", "packing", "window"),
    ),
    "packing_audit": QuerySpec(
        "packing_audit", packing_audit, PACKING_AUDIT_SQL,
        "Corpus packing summary (chunks, straddlers, tail fill)",
        ("llm", "packing", "agg"),
    ),
    "mixture_plan_langs": QuerySpec(
        "mixture_plan_langs", mixture_plan_langs, MIXTURE_PLAN_LANGS_SQL,
        "Domain-mixture plan under an epoch cap",
        ("llm", "sampling", "agg"),
    ),
    "mixture_resample_counts": QuerySpec(
        "mixture_resample_counts", mixture_resample_counts,
        MIXTURE_RESAMPLE_COUNTS_SQL,
        "Fractional-epoch resampling audit (hash-gated extra copy)",
        ("llm", "sampling", "agg"),
    ),
}


def semantic_decontaminate(spark, sf_dir):
    """Embedding-space benchmark decontamination: corpus vectors whose
    cosine to any broadcast benchmark probe (vec_id < 8) reaches 0.30,
    with the nearest probe — the paraphrase-level contamination the
    13-gram overlap check cannot see
    (`llm/decontam.py::semantic_contamination`)."""
    from ..llm.decontam import semantic_contamination

    return semantic_contamination(load(spark, sf_dir, "embeddings"))


SEMANTIC_DECONTAMINATE_SQL = """
WITH normed AS (
  SELECT vec_id, svec, list_dot_product(svec, svec) AS norm_sq
  FROM (SELECT vec_id,
          list_transform(embedding,
            x -> floor(CAST(x AS DOUBLE) * 1000000)) AS svec
        FROM embeddings)
),
pairs AS (
  SELECT c.vec_id, b.vec_id AS bench_id,
    list_dot_product(c.svec, b.svec) / (sqrt(c.norm_sq) * sqrt(b.norm_sq))
      AS cos
  FROM normed c JOIN normed b ON b.vec_id < 8
  WHERE c.vec_id >= 8
),
best AS (
  SELECT vec_id, bench_id, cos AS max_cosine FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
    FROM pairs
  ) WHERE rn = 1
)
SELECT vec_id, CAST(bench_id AS BIGINT) AS bench_id, max_cosine
FROM best WHERE max_cosine >= 0.3
"""


QUERIES["semantic_decontaminate"] = QuerySpec(
    "semantic_decontaminate", semantic_decontaminate,
    SEMANTIC_DECONTAMINATE_SQL,
    "Embedding-cosine benchmark decontamination (paraphrase-level)",
    ("pretrain", "similarity", "llm"),
)


# ---------------------------------------------------------------------------
# corpus_build_funnel — the end-to-end staged pipeline audit


def corpus_build_funnel(spark, sf_dir):
    """Quality gate → exact dedup → MinHash near-dedup → holdout +
    3-gram decontamination over ``documents``, reported as the 5-row
    per-stage survival funnel (`llm/funnel.py::corpus_build_funnel`).
    The one query that exercises the composed corpus build end-to-end
    rather than each stage in isolation."""
    from ..llm.funnel import corpus_build_funnel as funnel

    return funnel(
        fan_out(load(spark, sf_dir, "documents")),
        quality_flags=_FUNNEL_FLAGS,
    )


# The fixture corpus is synthetic engine-vocabulary text: the Gopher
# stopword rule (natural-English prior) rejects every document, so the
# funnel pins the 6-rule subset that discriminates on this corpus.
_FUNNEL_FLAGS = (
    "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
    "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
)


def _funnel_sql() -> str:
    from ..llm import dedup as D
    from .text import GOPHER_QUALITY_RULES_SQL, GOPHER_REPETITION_RULES_SQL

    sig_body = D.minhash_sig_select_sql(src="sh2")
    bands = D.bands_union_sql(src="sig")
    gate = " AND ".join(_FUNNEL_FLAGS)
    return f"""
WITH gq AS (
  SELECT doc_id FROM ({GOPHER_QUALITY_RULES_SQL}) q WHERE {gate}
),
gr AS (
  SELECT doc_id FROM ({GOPHER_REPETITION_RULES_SQL}) r
  WHERE passes_repetition
),
s1 AS (SELECT d.doc_id, d.text FROM documents d
       JOIN gq USING (doc_id) JOIN gr USING (doc_id)),
k2 AS (SELECT md5(text) AS _h, min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN k2 USING (doc_id)),
w2 AS (
  SELECT doc_id, {_WORDS} AS words FROM s2
),
sh2 AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3 THEN
      list_transform(range(1, len(words) - 1),
        i -> words[CAST(i AS INT)] || ' ' ||
             words[CAST(i AS INT) + 1] || ' ' ||
             words[CAST(i AS INT) + 2])
    ELSE CAST([] AS VARCHAR[]) END AS shingles
  FROM w2
),
sig AS (
  {sig_body}
),
banded AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
shing AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh2),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shing GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, count(*) AS n_common
  FROM cand p
  JOIN shing sa ON sa.doc_id = p.id_a
  JOIN shing sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b
),
near_drops AS (
  SELECT DISTINCT p.id_b AS doc_id
  FROM cand p
  LEFT JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
  JOIN sizes na ON na.doc_id = p.id_a
  JOIN sizes nb ON nb.doc_id = p.id_b
  WHERE CAST(coalesce(c.n_common, 0) AS DOUBLE)
    / (na.n_shingles + nb.n_shingles - coalesce(c.n_common, 0)) >= 0.5
),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM near_drops)
),
toks_all AS (SELECT doc_id, {_WORDS} AS t FROM documents),
bgrams AS (
  SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS ngram
  FROM toks_all, LATERAL unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE doc_id % 97 = 0
),
train AS (SELECT * FROM s3 WHERE doc_id % 97 <> 0),
tgrams AS (
  SELECT DISTINCT w.doc_id, array_to_string(w.t[i:i+2], ' ') AS ngram
  FROM (SELECT doc_id, {_WORDS} AS t FROM train) w,
       LATERAL unnest(generate_series(1, len(w.t) - 2)) AS u(i)
),
contaminated AS (
  SELECT doc_id FROM (
    SELECT t.doc_id, count(*) AS n_total_m, count(b.ngram) AS n_matched_m
    FROM tgrams t LEFT JOIN bgrams b USING (ngram)
    GROUP BY t.doc_id
  ) WHERE n_matched_m * 1000000 >= 200000 * n_total_m
),
s4 AS (
  SELECT * FROM train
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
stages AS (
        SELECT 0 AS stage_order, 'raw' AS stage,
    count(*) AS docs_out, coalesce(sum(len(text)), 0) AS chars_out
    FROM documents
  UNION ALL SELECT 1, 'quality', count(*), coalesce(sum(len(text)), 0) FROM s1
  UNION ALL SELECT 2, 'exact_dedup', count(*), coalesce(sum(len(text)), 0)
    FROM s2
  UNION ALL SELECT 3, 'near_dedup', count(*), coalesce(sum(len(text)), 0)
    FROM s3
  UNION ALL SELECT 4, 'decontam', count(*), coalesce(sum(len(text)), 0) FROM s4
)
SELECT CAST(stage_order AS INT) AS stage_order, stage,
  CAST(coalesce(lag(docs_out) OVER (ORDER BY stage_order), docs_out)
    AS BIGINT) AS docs_in,
  CAST(docs_out AS BIGINT) AS docs_out,
  CAST(coalesce(lag(docs_out) OVER (ORDER BY stage_order), docs_out)
    - docs_out AS BIGINT) AS docs_dropped,
  CAST(chars_out AS BIGINT) AS chars_out
FROM stages
"""


QUERIES["corpus_build_funnel"] = QuerySpec(
    "corpus_build_funnel", corpus_build_funnel,
    _funnel_sql(),
    "End-to-end corpus build: quality -> exact -> near-dup -> decontam "
    "funnel audit",
    ("pretrain", "dedup", "quality", "llm"),
)
