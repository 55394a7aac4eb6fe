"""Reproducible-sampling inventory (``llm.sampling``): membership is a
pure function of the row key (md5 bucket), so the DuckDB oracle verifies
sample membership row-for-row — the property `df.sample()` cannot give
(partitioning-dependent) and a 100 TB training corpus requires
(auditable, re-derivable splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.sampling import (
    deterministic_sample,
    stratified_sample,
    train_val_test_split,
    weighted_sample,
)
from .base import QuerySpec, load

_BUCKET = "CAST('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"


def deterministic_sample_docs(spark, sf_dir):
    """20% reproducible sample of documents by content key."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return deterministic_sample(docs, key_col="doc_id", rate=0.2, salt="s1")


DETERMINISTIC_SAMPLE_DOCS_SQL = f"""
SELECT doc_id, source FROM documents
WHERE {_BUCKET.format(salt='s1')} < CAST(0.2 * 4294967296 AS BIGINT)
"""


def train_val_test_counts(spark, sf_dir):
    """80/10/10 split assignment; per-split×source counts (the audit
    query you run before training)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    split = train_val_test_split(docs, key_col="doc_id")
    return split.groupBy("split", "source").agg(F.count(F.lit(1)).alias("n_docs"))


TRAIN_VAL_TEST_COUNTS_SQL = f"""
WITH assigned AS (
  SELECT source,
    CASE WHEN {_BUCKET.format(salt='split1')} < CAST(0.8 * 4294967296 AS BIGINT)
           THEN 'train'
         WHEN {_BUCKET.format(salt='split1')}
              < CAST((0.8 + 0.1) * 4294967296 AS BIGINT) THEN 'val'
         ELSE 'test' END AS split
  FROM documents
)
SELECT split, source, count(*) AS n_docs FROM assigned GROUP BY split, source
"""


def weighted_sample_docs(spark, sf_dir):
    """Quality-weighted sampling: acceptance probability = word-density
    score (clamped to [0,1]); longer/denser docs are likelier kept."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.least(
            F.lit(1.0), F.col("n_chars").cast("double") / F.lit(10000.0)
        ).alias("quality_w"),
    )
    return weighted_sample(scored, key_col="doc_id", weight_col="quality_w")


WEIGHTED_SAMPLE_DOCS_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
    least(1.0, CAST(n_chars AS DOUBLE) / 10000.0) AS quality_w
  FROM documents
)
SELECT doc_id, source, quality_w FROM scored
WHERE {_BUCKET.format(salt='w1')} < CAST(floor(quality_w * 4294967296) AS BIGINT)
"""


def stratified_sample_docs(spark, sf_dir):
    """Per-source rates (the downweight-boilerplate-sources move of a
    corpus build): keep 50% of src0, 10% of src1, drop the rest —
    membership still a pure function of the key, audited per source."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    sampled = stratified_sample(
        docs, key_col="doc_id", stratum_col="source",
        rates={"src0": 0.5, "src1": 0.1, "src2": 0.9},
    )
    return sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


STRATIFIED_SAMPLE_DOCS_SQL = f"""
SELECT source, count(*) AS n_kept FROM documents
WHERE (source = 'src0'
       AND {_BUCKET.format(salt='strat1')} < CAST(0.5 * 4294967296 AS BIGINT))
   OR (source = 'src1'
       AND {_BUCKET.format(salt='strat1')} < CAST(0.1 * 4294967296 AS BIGINT))
   OR (source = 'src2'
       AND {_BUCKET.format(salt='strat1')} < CAST(0.9 * 4294967296 AS BIGINT))
GROUP BY source
"""



def per_domain_holdout(spark, sf_dir):
    """Per-domain held-out set: the k=10 docs with the smallest key
    hash in each language — a deterministic 'reservoir' whose
    membership is a pure row function (stable as the corpus grows
    APPEND-ONLY per domain only when re-derived; the point is
    re-derivability, not incremental stability). One window partitioned
    by the domain — parallel across domains, no global sort."""
    from pyspark.sql import Window

    from ..llm.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id"), "hold1"), "doc_id"
    )
    return (
        docs.withColumn("holdout_rank", F.row_number().over(w))
        .filter(F.col("holdout_rank") <= 10)
    )


PER_DOMAIN_HOLDOUT_SQL = f"""
SELECT doc_id, lang, holdout_rank FROM (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY {_BUCKET.format(salt='hold1')}, doc_id
    ) AS holdout_rank
  FROM documents
) WHERE holdout_rank <= 10
"""


QUERIES = {
    "stratified_sample_docs": QuerySpec(
        "stratified_sample_docs", stratified_sample_docs,
        STRATIFIED_SAMPLE_DOCS_SQL,
        "Per-stratum reproducible sampling rates + audit counts",
        ("sampling", "llm", "agg"),
    ),
    "weighted_sample_docs": QuerySpec(
        "weighted_sample_docs", weighted_sample_docs, WEIGHTED_SAMPLE_DOCS_SQL,
        "Quality-weighted reproducible sampling", ("sampling", "llm"),
    ),
    "deterministic_sample_docs": QuerySpec(
        "deterministic_sample_docs", deterministic_sample_docs,
        DETERMINISTIC_SAMPLE_DOCS_SQL,
        "Reproducible hash-membership sampling (row-exact oracle)",
        ("sampling", "llm"),
    ),
    "per_domain_holdout": QuerySpec(
        "per_domain_holdout", per_domain_holdout, PER_DOMAIN_HOLDOUT_SQL,
        "Deterministic per-domain held-out selection (hash reservoir)",
        ("sampling", "llm", "window"),
    ),
    "train_val_test_counts": QuerySpec(
        "train_val_test_counts", train_val_test_counts,
        TRAIN_VAL_TEST_COUNTS_SQL,
        "Stable 80/10/10 split assignment + audit counts",
        ("sampling", "llm", "agg"),
    ),
}


def mixture_temperature_langs(spark, sf_dir):
    """√-temperature language mixture (α=0.5): low-resource languages
    upweighted ∝ √n — the multilingual-pretraining sampling standard,
    integer-exact (`llm/sampling.py::temperature_mixture_plan`)."""
    from ..llm.sampling import temperature_mixture_plan

    return temperature_mixture_plan(
        load(spark, sf_dir, "documents"), "lang", temperature_pct=50
    )


MIXTURE_TEMPERATURE_LANGS_SQL = """
WITH counts AS (
  SELECT lang, count(*) AS n_avail FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, n_avail,
    CAST(floor(sqrt(CAST(n_avail AS DOUBLE))) AS BIGINT) AS w_int
  FROM counts
),
total AS (SELECT CAST(sum(w_int) AS BIGINT) AS tw FROM weighted)
SELECT w.lang, w.n_avail, w.w_int,
  (w.w_int * 1000000) // t.tw AS share_ppm
FROM weighted w, total t
"""


QUERIES["mixture_temperature_langs"] = QuerySpec(
    "mixture_temperature_langs",
    mixture_temperature_langs,
    MIXTURE_TEMPERATURE_LANGS_SQL,
    "√-temperature (α=0.5) language mixture shares, integer-exact",
    ("sampling", "llm", "agg"),
)
