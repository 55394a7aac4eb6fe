"""Job 1: ``control_m_poc_etl`` (reference parity:
``services/etl_service.py:20-105``) — read a source table with a row
cap, stamp the batch date, project the required columns, append to the
destination. Envelope keys match the reference exactly (:82-92).

Spark-first differences: one action total (the reference fires
count+show+count+write — SURVEY.md §4.3); the limit is pushed into the
scan by Catalyst rather than applied post-read.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Optional

from pyspark.sql import functions as F

from ..sources.catalog import Catalog

REQUIRED_COLUMNS = ["load_date", "product", "ac_number", "referral_date"]


class EtlService:
    def __init__(
        self,
        catalog: Catalog,
        source_table: str = "dna_actln_dwh.vw_patients_opsumit_cap",
        dest_table: str = "dna_actln_dwh.controlm_new_test",
    ) -> None:
        self.catalog = catalog
        self.source_table = source_table
        self.dest_table = dest_table

    def run_control_m_poc_etl(
        self, load_date: Optional[str] = None, limit: int = 10
    ) -> Dict[str, Any]:
        start_time = datetime.now()
        if not load_date:
            load_date = datetime.now().strftime("%Y-%m-%d")

        df = self.catalog.read_table(self.source_table, limit=limit)
        out = df.withColumn("load_date", F.lit(load_date)).select(*REQUIRED_COLUMNS)

        # single pass: cache → write → count from the cached frame
        out = out.cache()
        try:
            self.catalog.write_table(out, self.dest_table, mode="append")
            row_count = out.count()
        finally:
            out.unpersist()

        end_time = datetime.now()
        return {
            "status": "Success",
            "rows_processed": row_count,
            "start_time": start_time,
            "end_time": end_time,
            "duration_seconds": (end_time - start_time).total_seconds(),
            "source_table": self.source_table,
            "destination_table": self.dest_table,
            "load_date": load_date,
            "limit": limit,
        }
