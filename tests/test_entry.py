"""Smoke tests for the driver contract module."""

import importlib.util
import os

import pytest

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
    # round-10 rotation contract (the r09 verdict's #1 ask): the FULL
    # r05 staleness cohort (11 names) LEADS — drained to zero — then
    # the alphabetically-first 36 of the r06 cohort, then the round's
    # new query and the two changed-plan re-checks.
    assert DRIVER_WINDOW[:11] == (
        "pmi_word_pairs",
        "pq_encode_cells",
        "pricing_summary",
        "quality_linear_score",
        "semantic_dedup_embeddings",
        "sessionization",
        "set_operations",
        "simhash_near_duplicates",
        "streaming_running_totals",
        "streaming_stream_join",
        "window_topk_per_group",
    )
    assert DRIVER_WINDOW[47] == "streaming_compaction_probe"  # new r10
    for changed in (
        "supplier_pagerank",        # broadcast-deg setup redesign
        "ingest_compaction_probe",  # range-partitioned compact_table
    ):
        assert changed in DRIVER_WINDOW, changed
    # r06 drain: 36 in, leaving 12 for round 11 (bar: <= 20)
    for r06 in (
        "above_nation_average", "ann_bruteforce_topk",
        "ann_ivf_kmeans_topk", "ann_ivfpq_topk", "ann_pq_adc_topk",
        "ann_pq_recall_report", "ann_recall_report",
        "ann_sign_bucket_pairs", "bigram_doc_logprob",
        "bm25_search_topk", "bpe_fertility_by_lang", "bpe_pair_counts",
        "case_when_classifier", "conversion_funnel",
        "corpus_select_budget", "count_distinct_customers",
        "countmin_heavy_hitters", "cube_part_inventory",
        "customer_order_counts", "date_function_gallery",
        "dedup_family_agreement", "distinct_projection",
        "doc_fingerprints", "dsir_importance_weights",
        "embedding_label_centroids", "embedding_outlier_report",
        "gopher_quality_rules", "histogram_quantile_error",
        "hll_distinct_trigrams", "kmeans_cell_profile",
        "lsh_band_calibration", "minhash_estimate_error",
        "multimodal_decode", "multimodal_source_stats",
        "neardup_cluster_keepers", "normalized_dedup",
    ):
        assert r06 in DRIVER_WINDOW, r06


def test_rotation_guard_fails_on_aged_out_names(monkeypatch):
    """The registry-time rotation assertion: a planned window that
    leaves any name's latest driver row to age past 4 rounds (or a
    never-checked name out of the window) must raise loudly."""
    import spark_etl_agent_spark.queries.base as base

    # current plan is valid against the committed artifacts
    base._rotation_checked = False
    base.registry()
    assert base._rotation_checked

    # drop a must-drain lead from the window -> its r05 row would age
    # past 4 rounds after round 10 -> raise
    base._rotation_checked = False
    crippled = tuple(n for n in base.DRIVER_WINDOW if n != "pricing_summary")
    monkeypatch.setattr(base, "DRIVER_WINDOW", crippled)
    with pytest.raises(ValueError, match="rotation contract"):
        base.registry()
    base._rotation_checked = False
    monkeypatch.undo()
    base.registry()  # restore the cached-valid state for other tests
