"""Single / continuous execution (reference parity: ``app.py:143-236``):
one-shot runs with load-date defaulting, and a continuous loop with
graceful SIGINT/SIGTERM shutdown, per-iteration config copies,
cumulative stats, 1-second sleep slices for responsive shutdown and the
>=50%-success exit criterion (``app.py:341``)."""

from __future__ import annotations

import logging
import signal
import time
from datetime import datetime
from typing import Any, Dict, Optional

from .registry import JobService

logger = logging.getLogger(__name__)


class ShutdownFlag:
    """Signal-driven stop flag (reference ``app.py:26-33,240-242``)."""

    def __init__(self) -> None:
        self.requested = False

    def install(self) -> None:
        signal.signal(signal.SIGINT, self._handle)
        signal.signal(signal.SIGTERM, self._handle)

    def _handle(self, signum, frame) -> None:
        logger.info("shutdown requested (signal %s)", signum)
        self.requested = True


def run_single_job(
    job_service: JobService, job_config: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference ``app.py:143-158``: default the load date to today when
    absent, then dispatch."""
    config = dict(job_config)
    if not config.get("load_date"):
        config["load_date"] = datetime.now().strftime("%Y-%m-%d")
    return job_service.execute_job(config)


def run_continuous_jobs(
    job_service: JobService,
    job_config: Dict[str, Any],
    interval_seconds: int = 60,
    shutdown: Optional[ShutdownFlag] = None,
    max_iterations: Optional[int] = None,
) -> Dict[str, Any]:
    """Reference ``app.py:160-236``. ``max_iterations`` is a test hook
    the reference lacks (its loop only stops on signal)."""
    shutdown = shutdown or ShutdownFlag()
    stats = {"total_runs": 0, "successful_runs": 0, "failed_runs": 0}
    t0 = time.time()

    while not shutdown.requested:
        if max_iterations is not None and stats["total_runs"] >= max_iterations:
            break
        result = run_single_job(job_service, dict(job_config))
        stats["total_runs"] += 1
        if result.get("status") == "Success":
            stats["successful_runs"] += 1
        else:
            stats["failed_runs"] += 1
        logger.info(
            "run %s: %s (%.2fs)",
            stats["total_runs"],
            result.get("status"),
            result.get("duration_seconds", 0.0),
        )
        if max_iterations is not None and stats["total_runs"] >= max_iterations:
            break
        # 1-second slices so a signal interrupts the wait promptly
        for _ in range(interval_seconds):
            if shutdown.requested:
                break
            time.sleep(1)

    stats["elapsed_seconds"] = time.time() - t0
    stats["success_rate"] = (
        stats["successful_runs"] / stats["total_runs"] if stats["total_runs"] else 0.0
    )
    # exit-code criterion: success iff at least half the runs succeeded
    stats["exit_success"] = stats["success_rate"] >= 0.5
    return stats
