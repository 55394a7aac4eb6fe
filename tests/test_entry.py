"""Smoke tests for the driver contract module."""

import importlib.util
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    assert df.count() > 0


def test_queries_and_oracles_aligned(spark):
    mod = _load_entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) > 0
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_session_scale_posture(spark):
    """The session contract the 100 TB design assumes (SURVEY.md §4.1):
    AQE + partition coalescing + skew-join handling + Arrow + UTC must
    stay on — a config regression here silently degrades every plan."""
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.parquet.filterPushdown") == "true"


def test_driver_window_is_first_50_registry_entries():
    """The driver oracles registry[:50] in insertion order; a refactor
    that breaks the DRIVER_WINDOW-first ordering silently forfeits the
    round's correctness coverage plan."""
    from spark_etl_agent_spark.queries import registry
    from spark_etl_agent_spark.queries.base import DRIVER_WINDOW

    assert list(registry())[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW) == 50
    # round-9 rotation contract: the 4 never-driver-checked queries
    # LEAD (the r08 verdict's #1 ask — nothing may be added ahead of
    # them), then the round's new query, then the changed-plan
    # re-checks, then the alphabetical r05 staleness-cohort drain
    assert DRIVER_WINDOW[:4] == (
        "kanon_publish_audit",      # never driver-checked
        "cohort_retention",         # never driver-checked
        "source_kl_divergence",     # never driver-checked
        "pii_entity_linking",       # never driver-checked
    )
    assert DRIVER_WINDOW[4] == "ingest_compaction_probe"  # new r09
    assert DRIVER_WINDOW[5] == "ldiversity_audit"          # new r09
    for changed in (
        "supplier_pagerank",        # broadcast-gated rounds, fused r1
        "image_ahash_report",       # batch-vectorized binning
        "cdc_apply_orders",         # materialize + scratch cleanup
        "partition_pruning_probe",  # materialize + scratch cleanup
        "compact_small_files_audit",  # materialize + scratch cleanup
        "corpus_release_e2e",       # materialize + scratch cleanup
        "knn_label_eval",           # oracle constant interpolation
    ):
        assert changed in DRIVER_WINDOW, changed
    for r05 in (
        "ann_ivf_topk", "approx_distinct_parts", "bloom_ingest_dedup",
        "bpe_encode_corpus", "bpe_train_merges", "chunk_documents",
        "corpus_cluster_quality", "corpus_datacard",
        "corpus_shuffle_order", "decontaminate_corpus",
        "drift_psi_report", "duplicate_span_stats",
        "embedding_cosine_neardup", "embedding_covariance",
        "embedding_label_medoids", "embedding_quantize_int8",
        "exact_dedup", "hard_negatives_embeddings",
        "incremental_neardup_probe", "jcap_pa_extract",
        "join_skew_report", "minhash_near_duplicates",
        "minhash_signatures", "mixture_plan_langs",
        "mixture_resample_counts", "mixture_temperature_langs",
        "neardup_components", "neardup_triangles",
        "ngram_jaccard_dedup", "pack_documents", "packing_audit",
        "per_domain_holdout",
    ):
        assert r05 in DRIVER_WINDOW, r05
