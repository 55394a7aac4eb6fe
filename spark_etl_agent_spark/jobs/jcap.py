"""Job 2: ``jcap_pa_etl`` (reference parity:
``services/jcap_pa_etl_service.py:40-398``) — the production six-step
workflow: backup-and-validate → extract → transform → stage → load-with-
verify → variance-validate-and-alert. Envelope keys match :93-107.

Architectural inversion (SURVEY.md §2.1 S2): the reference ships its
52-line extract SQL to Redshift; here the same relational program runs
natively in Spark (``plans.jcap_extract``) over catalog tables, and the
backup/copy verbs move Parquet instead of round-tripping JDBC.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame

from ..plans.jcap_extract import jcap_extract, jcap_transform
from ..sources.catalog import Catalog
from ..sources.files import FileIO
from .alerts import (
    DEFAULT_VARIANCE_THRESHOLD,
    Alerter,
    LogAlerter,
    variance_exceeded,
    variance_percentage,
)

# fixture-catalog names (FIXTURES.md Group A, flattened)
SOURCE_TABLES = {
    "payer": "cdp.fct_pah_pa_payer_details",
    "ref_cap": "cdp.fct_pah_ref_cap_dly",
    "alignment": "cdp.dmn_pah_curr_alignment_all",
    "segment": "cdp.dmn_pah_segment",
}
MAIN_TABLE = "jcap_presentation.pah_jcap_pa"
BACKUP_TABLE = "jcap_presentation.pah_jcap_pa_bkp"


class JcapPaEtlService:
    def __init__(
        self,
        catalog: Catalog,
        stage_path: str,
        alerter: Optional[Alerter] = None,
        variance_threshold: float = DEFAULT_VARIANCE_THRESHOLD,
        main_table: str = MAIN_TABLE,
        backup_table: str = BACKUP_TABLE,
        source_tables: Optional[Dict[str, str]] = None,
    ) -> None:
        self.catalog = catalog
        self.stage_path = stage_path
        self.alerter = alerter or LogAlerter()
        self.variance_threshold = variance_threshold
        self.main_table = main_table
        self.backup_table = backup_table
        self.source_tables = dict(source_tables or SOURCE_TABLES)
        self.files = FileIO(catalog.spark)

    # -- steps (reference section cites on each) ------------------------------

    def _create_and_validate_backup(self) -> int:
        """Step 1 (:131-170): truncate backup, copy main→backup, assert
        the copy is complete. Returns the previous load's count."""
        self.catalog.truncate_table(self.backup_table)
        previous_count = self.catalog.get_table_count(self.main_table)
        self.catalog.copy_table_data(self.main_table, self.backup_table)
        backup_count = self.catalog.get_table_count(self.backup_table)
        if backup_count != previous_count:
            raise RuntimeError(
                f"backup validation failed: main={previous_count} "
                f"backup={backup_count}"
            )
        return previous_count

    def _extract_cdp_data(self, load_date: str) -> DataFrame:
        """Step 2 (:172-243) — natively in Spark instead of pushed to
        Redshift."""
        t = self.source_tables
        return jcap_extract(
            self.catalog.read_table(t["payer"]),
            self.catalog.read_table(t["ref_cap"]),
            self.catalog.read_table(t["alignment"]),
            self.catalog.read_table(t["segment"]),
            load_date=load_date,
        )

    def _transform_data(self, df: DataFrame) -> DataFrame:
        """Step 3 (:245-297)."""
        return jcap_transform(df)

    def _stage_to_s3(self, df: DataFrame) -> str:
        """Step 4 (:299-320): Parquet stage (overwrite)."""
        return self.files.write_parquet(df, self.stage_path, mode="overwrite")

    def _load_to_destination(self, df: DataFrame) -> int:
        """Step 5 (:322-355): truncate main, append, verify non-empty,
        warn (not fail) on count mismatch."""
        import logging

        self.catalog.truncate_table(self.main_table)
        row_count = df.count()
        self.catalog.write_table(df, self.main_table, mode="append")
        final_count = self.catalog.get_table_count(self.main_table)
        if final_count == 0:
            raise RuntimeError("No rows loaded despite successful write operation!")
        if final_count != row_count:
            logging.getLogger(__name__).warning(
                "row count mismatch: expected %s got %s", row_count, final_count
            )
        return final_count

    def _validate_and_alert(
        self, previous_count: int, current_count: int
    ) -> Dict[str, Any]:
        """Step 6 (:357-398): variance math, >= threshold, alert."""
        pct = variance_percentage(previous_count, current_count)
        exceeded = variance_exceeded(pct, self.variance_threshold)
        email_sent = False
        if exceeded:
            email_sent = self.alerter.send_variance_alert(
                job_name="JCAP PA ETL",
                variance_percentage=pct,
                previous_count=previous_count,
                current_count=current_count,
            )
        return {
            "variance_percentage": pct,
            "threshold_exceeded": exceeded,
            "email_sent": email_sent,
        }

    # -- workflow --------------------------------------------------------------

    def run_jcap_pa_etl(self, load_date: Optional[str] = None) -> Dict[str, Any]:
        start_time = datetime.now()
        if not load_date:
            load_date = datetime.now().strftime("%Y-%m-%d")

        previous_count = self._create_and_validate_backup()
        extracted = self._extract_cdp_data(load_date)
        transformed = self._transform_data(extracted)

        # the transform is reused by stage + load + counts: persist once
        # (the reference recomputes it per action — SURVEY.md §3.2)
        transformed = transformed.cache()
        try:
            self._stage_to_s3(transformed)
            current_count = self._load_to_destination(transformed)
        finally:
            transformed.unpersist()

        variance_result = self._validate_and_alert(previous_count, current_count)

        end_time = datetime.now()
        duration = (end_time - start_time).total_seconds()
        self.alerter.send_completion_notification(
            job_name="JCAP PA ETL",
            status="Success",
            rows_processed=current_count,
            duration=duration,
            variance_percentage=variance_result["variance_percentage"],
        )
        return {
            "status": "Success",
            "rows_processed": current_count,
            "start_time": start_time,
            "end_time": end_time,
            "duration_seconds": duration,
            "load_date": load_date,
            "previous_count": previous_count,
            "current_count": current_count,
            "variance_percentage": variance_result["variance_percentage"],
            "variance_threshold_exceeded": variance_result["threshold_exceeded"],
            "email_sent": variance_result["email_sent"],
            "s3_path": self.stage_path,
            "method": "Native Spark Workflow",
        }
