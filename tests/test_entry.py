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
    # round-6 rotation contract: new/schema-changed queries lead, the
    # stalest r01-era rows all hold slots
    assert DRIVER_WINDOW[0] == "semantic_decontaminate"
    assert DRIVER_WINDOW[1] == "shard_movement_report"
    assert DRIVER_WINDOW[2] == "bm25_search_topk"
    assert DRIVER_WINDOW[3] == "countmin_heavy_hitters"
    assert DRIVER_WINDOW[4] == "ann_ivfpq_topk"
    assert DRIVER_WINDOW[5] == "gopher_quality_rules"
    assert DRIVER_WINDOW[6] == "gopher_repetition_rules"
    assert DRIVER_WINDOW[7] == "ann_pq_recall_report"
    assert DRIVER_WINDOW[8] == "source_overlap_matrix"
    assert DRIVER_WINDOW[9] == "ann_pq_adc_topk"
    assert DRIVER_WINDOW[10] == "minhash_estimate_error"
    assert DRIVER_WINDOW[11] == "dedup_family_agreement"
    assert DRIVER_WINDOW[12] == "bpe_fertility_by_lang"
    assert DRIVER_WINDOW[13] == "split_leakage_audit"
    assert DRIVER_WINDOW[14] == "perplexity_prune_band"
    assert DRIVER_WINDOW[15] == "dsir_importance_weights"
    for stale_r01 in ("ann_bruteforce_topk", "multimodal_decode",
                      "normalized_dedup", "streaming_tumbling_agg"):
        assert stale_r01 in DRIVER_WINDOW
    # round-6e additions get their driver rows this round
    assert "hll_distinct_trigrams" in DRIVER_WINDOW
    assert "corpus_build_funnel" in DRIVER_WINDOW
    assert "embedding_outlier_report" in DRIVER_WINDOW
    assert "histogram_quantile_error" in DRIVER_WINDOW
