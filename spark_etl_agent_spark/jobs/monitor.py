"""Job 6: ``quality_monitor_etl`` — the standing data-quality watch a
production feed runs BEFORE downstream jobs trust a new load.

The reference's only quality signal is the post-hoc row-count variance
alert (``services/jcap_pa_etl_service.py``, ±N% vs yesterday). This job
is the scale-right monitor stack built from the quality operators:

1. **contract** — :func:`..operators.quality.expectation_report`:
   N schema/value rules in ONE aggregation (hard gate: a broken
   contract aborts before any report is written).
2. **freshness** — :func:`..operators.quality.freshness_report` per
   source group vs the injected ``as_of`` (never wall-clock inside the
   plan — backfills must gate against logical time).
3. **drift** — :func:`..operators.quality.drift_psi`: PSI between the
   reference and current windows per group, integer-ppm buckets.
4. **alert** — every drifted group fires through the
   :class:`.alerts.Alerter` interface (the variance-alert verb, with
   PSI·100 riding in the percentage field — one alert per drifted
   group, same delivery contract as the reference's breach mail).
5. **report** — the three bounded report frames land in warehouse
   tables (``<prefix>.expectations / .freshness / .drift``) for
   dashboards; all writes are report-sized, never feed-sized.

Scan discipline: the feed is persisted once and all three reports
aggregate from that one materialization (three bounded-key aggregates
over one read — never a pass per report), then released.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, List, Optional

from pyspark.sql import functions as F

from ..operators.quality import (
    Expectation,
    drift_psi,
    expectation_report,
    freshness_report,
    in_range,
    not_null,
)
from ..sources.catalog import Catalog
from .alerts import Alerter, LogAlerter


class QualityMonitorService:
    def __init__(
        self,
        catalog: Catalog,
        feed_table: str = "staging.events",
        report_prefix: str = "monitor",
        ts_col: str = "ts",
        value_col: str = "value",
        group_col: str = "event_type",
        boundary: str = "2024-01-16",
        max_lag_hours: float = 24.0,
        rules: Optional[List[Expectation]] = None,
        alerter: Optional[Alerter] = None,
    ) -> None:
        self.catalog = catalog
        self.feed_table = feed_table
        self.report_prefix = report_prefix
        self.ts_col = ts_col
        self.value_col = value_col
        self.group_col = group_col
        self.boundary = boundary
        self.max_lag_hours = max_lag_hours
        self.rules = rules if rules is not None else [
            Expectation("event_id_not_null", not_null("event_id")),
            Expectation("ts_not_null", not_null(ts_col)),
            # soft rule: tolerate up to 5% out-of-band values
            Expectation(
                "value_in_band", in_range(value_col, -1e6, 1e6), 0.05
            ),
        ]
        self.alerter = alerter or LogAlerter()

    def run_quality_monitor(
        self, load_date: Optional[str] = None, as_of: Optional[str] = None
    ) -> Dict[str, Any]:
        start_time = datetime.now()
        if not load_date:
            load_date = datetime.now().strftime("%Y-%m-%d")

        # NTZ→LTZ normalization (value-identical under the UTC-pinned
        # session): raw parquet feeds frequently carry TIMESTAMP_NTZ,
        # which breaks timestamp arithmetic downstream — same posture
        # as queries/base.py::load
        feed = self.catalog.read_table(self.feed_table)
        feed = feed.withColumn(
            self.ts_col, F.col(self.ts_col).cast("timestamp")
        ).persist()
        try:
            # 1. contract gate — one aggregation, hard abort on failure
            expectations = expectation_report(feed, self.rules)
            exp_rows = expectations.collect()  # one row per rule
            failed = [r.rule for r in exp_rows if not r.passed]
            if failed:
                return {
                    "job_type": "quality_monitor_etl",
                    "status": "Failed",
                    "error": f"contract violated: {failed}",
                    "expectations": {
                        r.rule: r.violation_ppm for r in exp_rows
                    },
                    "load_date": load_date,
                    "duration_seconds": (
                        datetime.now() - start_time
                    ).total_seconds(),
                }

            # as_of defaults to the feed's own newest event: reruns are
            # deterministic, and lag then measures intra-feed staleness
            if as_of is None:
                as_of = feed.agg(F.max(self.ts_col)).collect()[0][0]

            freshness = freshness_report(
                feed,
                self.ts_col,
                as_of,
                self.max_lag_hours,
                groups=[self.group_col],
            )
            drift = drift_psi(
                feed,
                ts_col=self.ts_col,
                value_col=self.value_col,
                group_col=self.group_col,
                boundary=self.boundary,
            )

            fresh_rows = freshness.collect()  # one row per group
            drift_rows = drift.collect()  # one row per group
            stale = [
                getattr(r, self.group_col)
                for r in fresh_rows
                if not r.passed
            ]
            drifted = [r for r in drift_rows if r.drifted]
            alerts_fired = 0
            for r in drifted:
                if self.alerter.send_variance_alert(
                    job_name=(
                        f"quality_monitor_etl:{getattr(r, self.group_col)}"
                    ),
                    variance_percentage=r.psi_micro / 10_000.0,  # PSI·100
                    previous_count=r.n_ref,
                    current_count=r.n_cur,
                ):
                    alerts_fired += 1

            p = self.report_prefix
            self.catalog.write_table(
                expectations, f"{p}.expectations", mode="overwrite"
            )
            self.catalog.write_table(
                freshness, f"{p}.freshness", mode="overwrite"
            )
            self.catalog.write_table(drift, f"{p}.drift", mode="overwrite")

            return {
                "job_type": "quality_monitor_etl",
                "status": "Success",
                "load_date": load_date,
                "as_of": str(as_of),
                "n_rules": len(exp_rows),
                "n_groups": len(fresh_rows),
                "stale_groups": stale,
                "drifted_groups": [
                    getattr(r, self.group_col) for r in drifted
                ],
                "alerts_fired": alerts_fired,
                "duration_seconds": (
                    datetime.now() - start_time
                ).total_seconds(),
            }
        finally:
            feed.unpersist()
