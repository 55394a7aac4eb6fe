"""Job registry + dispatch (reference parity:
``services/job_service.py:14-209``): ``supported_job_types`` metadata,
listing, per-type parameter extraction, a TypeError-probing generic
fallback, result-envelope enrichment and the error envelope."""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Optional

from ..core.config import Settings, get_settings
from ..sources.catalog import Catalog
from .alerts import Alerter
from .corpus import CorpusDedupService
from .etl import EtlService
from .ingest import CorpusIngestService
from .jcap import JcapPaEtlService
from .monitor import QualityMonitorService
from .release import CorpusReleaseService
from .pretrain import CorpusPrepService
from .sync import IncrementalSyncService

# Static job-type metadata (reference services/job_service.py:23-38) —
# module-level so listings (CLI --list-job-types) never have to boot a
# SparkSession; JobService binds each entry to its service instance.
JOB_TYPE_INFO: Dict[str, Dict[str, Any]] = {
    "control_m_poc_etl": {
        "method": "run_control_m_poc_etl",
        "description": (
            "Control M POC ETL - Development/testing with row limits "
            "and append mode"
        ),
        "parameters": ["load_date", "limit"],
        "environment": "POC",
    },
    "corpus_dedup_etl": {
        "method": "run_corpus_dedup_etl",
        "description": (
            "Corpus dedup ETL - quality gate, exact + MinHash near-dup "
            "dedup, cluster survivors"
        ),
        "parameters": ["load_date"],
        "environment": "Corpus",
    },
    "corpus_ingest_etl": {
        "method": "run_corpus_ingest",
        "description": (
            "Corpus ingest ETL - drain staged document batches through "
            "the indexed dedup sink; novel docs + dedup artifacts "
            "append to the accepted table, drop-flood alerts"
        ),
        "parameters": ["load_date"],
        "environment": "Corpus",
    },
    "corpus_prep_etl": {
        "method": "run_corpus_prep_etl",
        "description": (
            "Corpus prep ETL - decontaminate vs benchmarks, mixture "
            "resample, deterministic shuffle, sequence packing"
        ),
        "parameters": ["load_date"],
        "environment": "Corpus",
    },
    "incremental_sync_etl": {
        "method": "run_incremental_sync",
        "description": (
            "Incremental sync ETL - snapshot diff, referential "
            "gate, CDC apply with row-count invariant"
        ),
        "parameters": ["load_date"],
        "environment": "Warehouse",
    },
    "corpus_release_etl": {
        "method": "run_corpus_release",
        "description": (
            "Corpus release ETL - contract gate, versioned publish "
            "(crash-safe pointer), release diff vs previous version, "
            "datacard"
        ),
        "parameters": ["load_date"],
        "environment": "Corpus",
    },
    "quality_monitor_etl": {
        "method": "run_quality_monitor",
        "description": (
            "Quality monitor ETL - expectation contract gate, per-group "
            "freshness, PSI drift with alerts, report tables"
        ),
        "parameters": ["load_date", "as_of"],
        "environment": "Monitoring",
    },
    "jcap_pa_etl": {
        "method": "run_jcap_pa_etl",
        "description": (
            "JCAP PA ETL - Production workflow with backup/restore, "
            "variance validation, and alerts"
        ),
        "parameters": ["load_date"],
        "environment": "Production",
    },
}


def list_job_types() -> Dict[str, str]:
    """Session-free listing (CLI --list-job-types)."""
    return {
        job_type: f"[{cfg['environment']}] {cfg['description']}"
        for job_type, cfg in JOB_TYPE_INFO.items()
    }


class JobService:
    def __init__(
        self,
        catalog: Catalog,
        stage_path: str,
        alerter: Optional[Alerter] = None,
        settings: Optional[Settings] = None,
    ) -> None:
        self.catalog = catalog
        self.settings = settings or get_settings()
        self.etl_service = EtlService(catalog)
        self.jcap_pa_etl_service = JcapPaEtlService(
            catalog, stage_path=stage_path, alerter=alerter
        )
        self.corpus_dedup_service = CorpusDedupService(catalog)
        self.corpus_ingest_service = CorpusIngestService(
            catalog, alerter=alerter
        )
        self.corpus_prep_service = CorpusPrepService(catalog)
        self.incremental_sync_service = IncrementalSyncService(catalog)
        self.quality_monitor_service = QualityMonitorService(
            catalog, alerter=alerter
        )
        self.corpus_release_service = CorpusReleaseService(catalog)
        # registry shape mirrors services/job_service.py:23-38; the
        # static half lives in module-level JOB_TYPE_INFO
        services = {
            "control_m_poc_etl": self.etl_service,
            "corpus_dedup_etl": self.corpus_dedup_service,
            "corpus_ingest_etl": self.corpus_ingest_service,
            "corpus_prep_etl": self.corpus_prep_service,
            "incremental_sync_etl": self.incremental_sync_service,
            "corpus_release_etl": self.corpus_release_service,
            "quality_monitor_etl": self.quality_monitor_service,
            "jcap_pa_etl": self.jcap_pa_etl_service,
        }
        self.supported_job_types: Dict[str, Dict[str, Any]] = {
            job_type: {"service": services[job_type], **info}
            for job_type, info in JOB_TYPE_INFO.items()
        }

    def list_supported_job_types(self) -> Dict[str, str]:
        """Reference :46-51."""
        return {
            job_type: f"[{cfg['environment']}] {cfg['description']}"
            for job_type, cfg in self.supported_job_types.items()
        }

    def register_job_type(
        self,
        name: str,
        service: Any,
        method: str,
        description: str = "",
        parameters: Optional[list] = None,
        environment: str = "Custom",
    ) -> None:
        """Extension point the reference hard-codes around: new job
        types dispatch through the generic parameter prober."""
        self.supported_job_types[name] = {
            "service": service,
            "method": method,
            "description": description,
            "parameters": parameters or [],
            "environment": environment,
        }

    # -- dispatch ----------------------------------------------------------

    def execute_job(self, job_config: Dict[str, Any]) -> Dict[str, Any]:
        """Reference :53-124 — validate type, dispatch with per-type
        parameter extraction, enrich the envelope, never raise."""
        job_id = job_config.get("id", "unknown")
        job_name = job_config.get("name", f"job-{job_id}")
        job_type = job_config.get("type", "control_m_poc_etl")

        if job_type not in self.supported_job_types:
            return self._create_error_result(
                job_id,
                job_name,
                job_type,
                f"Unknown job type: {job_type}. Supported types: "
                f"{list(self.supported_job_types.keys())}",
            )

        # per-job-type config completeness (reference :72-80)
        try:
            self.settings.validate_for_job_type(job_type)
        except ValueError as e:
            return self._create_error_result(
                job_id, job_name, job_type,
                f"Configuration validation failed: {e}",
            )

        start_time = datetime.now()
        job_info = self.supported_job_types[job_type]
        try:
            service, method_name = job_info["service"], job_info["method"]
            if job_type == "control_m_poc_etl":
                result = getattr(service, method_name)(
                    load_date=job_config.get("load_date"),
                    limit=job_config.get("limit", 10),
                )
            elif job_type == "jcap_pa_etl":
                result = getattr(service, method_name)(
                    load_date=job_config.get("load_date")
                )
            else:
                result = self._execute_generic_job(
                    service,
                    method_name,
                    job_config,
                    job_info.get("parameters") or [],
                )
            result.update(
                {
                    "job_id": job_id,
                    "job_name": job_name,
                    "job_type": job_type,
                    "job_description": job_info["description"],
                    "environment": job_info["environment"],
                }
            )
            return result
        except Exception as e:  # error envelope, reference :190-209
            end_time = datetime.now()
            return self._create_error_result(
                job_id,
                job_name,
                job_type,
                str(e),
                start_time=start_time,
                end_time=end_time,
                duration=(end_time - start_time).total_seconds(),
            )

    def _execute_generic_job(
        self,
        service: Any,
        method_name: str,
        job_config: Dict[str, Any],
        parameters: Optional[list] = None,
    ) -> Dict[str, Any]:
        """TypeError-probing fallback (reference :147-164), widened to
        forward every DECLARED parameter present in the job_config —
        the declared-parameter list is the contract (e.g.
        quality_monitor_etl's ``as_of`` backfill pin), so a config key
        matching it must reach the service rather than being silently
        dropped by a load_date-only call."""
        method = getattr(service, method_name)
        declared = [p for p in (parameters or []) if p != "load_date"]
        kwargs: Dict[str, Any] = {"load_date": job_config.get("load_date")}
        for p in declared:
            if p in job_config:
                kwargs[p] = job_config[p]
        try:
            return method(limit=job_config.get("limit", 10), **kwargs)
        except TypeError:
            try:
                return method(**kwargs)
            except TypeError:
                try:
                    return method(load_date=job_config.get("load_date"))
                except TypeError:
                    return method()

    def _create_error_result(
        self,
        job_id: Any,
        job_name: str,
        job_type: str,
        error: str,
        start_time: Optional[datetime] = None,
        end_time: Optional[datetime] = None,
        duration: float = 0.0,
    ) -> Dict[str, Any]:
        now = datetime.now()
        return {
            "status": "Failed",
            "error": error,
            "rows_processed": 0,
            "start_time": start_time or now,
            "end_time": end_time or now,
            "duration_seconds": duration,
            "job_id": job_id,
            "job_name": job_name,
            "job_type": job_type,
        }
