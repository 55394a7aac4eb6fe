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
    # round-11 rotation contract (the r10 verdict's #1 ask): the FULL
    # r06 staleness cohort (12 names) LEADS — drained to zero — then
    # the round's 8 changed-plan re-checks, then the
    # alphabetically-first 30 of the r07 cohort (17 remain for round
    # 12, where the rotation guard forces them).
    assert DRIVER_WINDOW[:12] == (
        "perplexity_prune_band",
        "scrub_duplicate_spans",
        "semantic_decontaminate",
        "shard_movement_report",
        "simhash_fingerprints",
        "source_overlap_matrix",
        "split_leakage_audit",
        "streaming_tumbling_agg",
        "vocab_coverage_curve",
        "winnowing_fingerprints",
        "winnowing_overlap_pairs",
        "zorder_curve_stats",
    )
    for changed in (
        "supplier_pagerank",            # single-exchange symmetric SMJ
        "streaming_compaction_probe",   # sink trims + final-epilogue skip
        "streaming_ingest_dedup_audit",  # observed-count write
        "streaming_pack_manifest",      # one-job batch staging
        "streaming_drift_audit",
        "streaming_user_ewma",
        "indexed_ingest_probe",         # candidate-id In pushdown
        "ingest_compaction_probe",
    ):
        assert changed in DRIVER_WINDOW, changed
    # r07 drain: 30 in (alphabetically first), leaving 17 for round 12
    for r07 in (
        "agg_topk_quantities", "array_functions_gallery",
        "asof_join_clicks", "band_join_parts", "corpus_quality_filter",
        "customer_order_distribution", "deterministic_sample_docs",
        "disjunctive_bracket_revenue", "dominant_part_suppliers",
        "event_type_daily_pivot", "events_freshness_gate",
        "events_tumbling_agg", "exactsubstr_spans",
        "exists_returned_orders", "filter_in_upper",
        "fk_integrity_audit", "forecast_revenue", "gap_fill_daily",
        "having_big_spenders", "incremental_revenue_agg",
        "json_extraction", "key_skew_report", "language_id",
        "local_supplier_volume", "multiset_operations",
        "orders_expectation_gate", "pivot_linestatus", "poc_projection",
        "retailprice_histogram", "revenue_concentration",
    ):
        assert r07 in DRIVER_WINDOW, r07


def test_rotation_guard_fails_on_aged_out_names(monkeypatch):
    """The registry-time rotation assertion: a planned window that
    leaves any name's latest driver row to age past 4 rounds (or a
    never-checked name out of the window) must raise loudly."""
    import spark_etl_agent_spark.queries.base as base

    # current plan is valid against the committed artifacts
    base._rotation_checked = False
    base.registry()
    assert base._rotation_checked

    # drop a must-drain lead from the window -> its r06 row would age
    # past 4 rounds after round 11 -> raise
    base._rotation_checked = False
    crippled = tuple(
        n for n in base.DRIVER_WINDOW if n != "zorder_curve_stats"
    )
    monkeypatch.setattr(base, "DRIVER_WINDOW", crippled)
    with pytest.raises(ValueError, match="rotation contract"):
        base.registry()
    base._rotation_checked = False
    monkeypatch.undo()
    base.registry()  # restore the cached-valid state for other tests
