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
    # round-8 rotation contract: new + plan/oracle-changed queries lead,
    # then ALL 34 remaining r04-era rows (draining the staleness tail —
    # the r07 verdict's #3 ask); the r05-era tail rotated out entirely
    # to make room for the 7 late-round-8 additions
    assert DRIVER_WINDOW[0] == "pii_scrub_report"      # new: hygiene
    assert DRIVER_WINDOW[1] == "feature_hash_buckets"  # new: hygiene
    assert DRIVER_WINDOW[2] == "union_by_name_migration"  # new: hygiene
    assert DRIVER_WINDOW[3] == "knn_label_eval"        # new: embedding eval
    assert DRIVER_WINDOW[4] == "cdc_apply_orders"      # new: CDC apply verb
    assert DRIVER_WINDOW[5] == "partition_pruning_probe"   # new: layout
    assert DRIVER_WINDOW[6] == "compact_small_files_audit"  # new: layout
    assert DRIVER_WINDOW[7] == "hll_union_daily_users"  # new: sketch union
    assert DRIVER_WINDOW[8] == "corpus_release_e2e"   # new: job e2e
    assert DRIVER_WINDOW[9] == "indexed_ingest_probe"  # new: stored artifacts
    assert DRIVER_WINDOW[10] == "ivf_append_assign"     # new: frozen-codebook
    assert DRIVER_WINDOW[11] == "streaming_ingest_dedup_audit"  # indexed sink
    assert DRIVER_WINDOW[12] == "corpus_build_funnel"   # shared shingles
    assert DRIVER_WINDOW[13] == "gopher_repetition_rules"  # one-agg fold
    assert DRIVER_WINDOW[14] == "supplier_pagerank"     # symmetric path
    assert DRIVER_WINDOW[15] == "mg_heavy_hitter_tokens"  # oracle cast
    for r04 in (
        "filtered_aggregates", "grouping_sets_revenue",
        "idle_rich_customers", "large_volume_orders",
        "lone_returner_suppliers", "market_share", "min_cost_supplier",
        "multimodal_wav_decode", "nation_trade_volume",
        "nation_year_profit", "orders_table_profile",
        "parts_supplier_counts", "promo_revenue_share",
        "quantity_profile", "returned_item_revenue",
        "revenue_share_parts", "salted_agg_lineitem",
        "scd2_priority_history", "shipmode_priority_counts",
        "small_quantity_revenue", "snapshot_diff_orders",
        "stratified_sample_docs", "streaming_session_agg",
        "streaming_sliding_agg", "streaming_static_enrichment",
        "streaming_watermark_dedup", "string_similarity_pairs",
        "tfidf_top_terms", "top_supplier_quarter",
        "trailing_interval_revenue", "train_val_test_counts",
        "unpivot_quarterly", "weighted_sample_docs",
        "window_value_functions",
    ):
        assert r04 in DRIVER_WINDOW, r04
