"""Job orchestration (reference parity: ``services/job_service.py``,
``services/etl_service.py``, ``services/jcap_pa_etl_service.py``,
``app.py`` — SURVEY.md §2.12): a registry of job types dispatched with
per-type parameter extraction, result envelopes with the reference's
exact keys, data-variance validation with alerting, and a continuous
runner with graceful shutdown."""

from .alerts import Alerter, LogAlerter
from .registry import JobService
from .runner import run_continuous_jobs, run_single_job

__all__ = [
    "Alerter",
    "LogAlerter",
    "JobService",
    "run_continuous_jobs",
    "run_single_job",
]
