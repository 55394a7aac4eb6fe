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
    # round-7 rotation contract: new/result-changed queries lead, then
    # ALL 32 remaining r03-era rows (clearing the staleness tail — the
    # r06 verdict's #1 ask), then 14 r04-era rows
    assert DRIVER_WINDOW[0] == "exactsubstr_spans"
    assert DRIVER_WINDOW[1] == "salted_join_hotkey"
    assert DRIVER_WINDOW[2] == "corpus_build_funnel"  # repetition fold
    assert DRIVER_WINDOW[3] == "streaming_user_ewma"  # 2-stage replay
    for new_r07b in ("orders_expectation_gate", "events_freshness_gate",
                     "rollup_day_by_type", "mg_heavy_hitter_tokens"):
        assert new_r07b in DRIVER_WINDOW
    for r03 in (
        "timestamp_parse_roundtrip", "token_counts", "text_stats",
        "stat_moments_gallery", "event_type_daily_pivot",
        "events_tumbling_agg", "filter_in_upper", "fk_integrity_audit",
        "forecast_revenue", "gap_fill_daily", "having_big_spenders",
        "incremental_revenue_agg", "json_extraction", "key_skew_report",
        "language_id", "local_supplier_volume", "multiset_operations",
        "pivot_linestatus", "poc_projection", "retailprice_histogram",
        "revenue_concentration", "rolling_active_users", "rollup_returns",
        "scalar_function_gallery", "scd2_temporal_join", "semi_anti_join",
        "top_accounts_global_sort", "top_revenue_orders",
        "unigram_doc_logprob", "value_outlier_fences",
        "window_rank_family", "window_running_and_lag",
    ):
        assert r03 in DRIVER_WINDOW, r03
