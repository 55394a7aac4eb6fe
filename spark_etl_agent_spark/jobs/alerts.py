"""Alerting hooks (reference parity: ``services/email_service.py``).

The reference sends bare-SMTP emails for variance breaches (:51-99) and
job completion (:101-151). Here alerting is a small interface so the
default deployment logs structured alerts (always works, testable) and
SMTP remains an optional drop-in with the same two verbs.
"""

from __future__ import annotations

import logging
from typing import List, Optional

logger = logging.getLogger(__name__)


class Alerter:
    """Interface: both verbs return True when the alert was delivered
    (the reference records ``email_sent`` in the result envelope)."""

    def send_variance_alert(
        self,
        job_name: str,
        variance_percentage: float,
        previous_count: int,
        current_count: int,
    ) -> bool:
        raise NotImplementedError

    def send_completion_notification(
        self,
        job_name: str,
        status: str,
        rows_processed: int,
        duration: float,
        variance_percentage: Optional[float] = None,
    ) -> bool:
        raise NotImplementedError


class LogAlerter(Alerter):
    """Default: structured log records; also keeps an in-memory trail so
    tests (and operators' log scrapers) can assert on what fired."""

    def __init__(self) -> None:
        self.sent: List[dict] = []

    def send_variance_alert(
        self, job_name, variance_percentage, previous_count, current_count
    ) -> bool:
        record = {
            "kind": "variance_alert",
            "job_name": job_name,
            "variance_percentage": variance_percentage,
            "previous_count": previous_count,
            "current_count": current_count,
        }
        self.sent.append(record)
        logger.warning("ALERT %s", record)
        return True

    def send_completion_notification(
        self, job_name, status, rows_processed, duration, variance_percentage=None
    ) -> bool:
        record = {
            "kind": "completion",
            "job_name": job_name,
            "status": status,
            "rows_processed": rows_processed,
            "duration": duration,
            "variance_percentage": variance_percentage,
        }
        self.sent.append(record)
        logger.info("NOTIFY %s", record)
        return True


class SmtpAlerter(Alerter):
    """Optional SMTP delivery (reference ``services/email_service.py:35-42``
    — plain SMTP, no auth/TLS assumptions). Import-gated: never required
    for the engine to run."""

    def __init__(self, host: str, port: int, sender: str, recipients: List[str]):
        self.host, self.port, self.sender, self.recipients = (
            host,
            port,
            sender,
            recipients,
        )

    def _send(self, subject: str, body: str) -> bool:
        try:
            import smtplib
            from email.mime.text import MIMEText

            msg = MIMEText(body)
            msg["Subject"] = subject
            msg["From"] = self.sender
            msg["To"] = ", ".join(self.recipients)
            with smtplib.SMTP(self.host, self.port, timeout=30) as smtp:
                smtp.sendmail(self.sender, self.recipients, msg.as_string())
            return True
        except Exception:  # delivery failure must not fail the job
            logger.exception("SMTP alert delivery failed")
            return False

    def send_variance_alert(
        self, job_name, variance_percentage, previous_count, current_count
    ) -> bool:
        return self._send(
            f"Data Variance Alert: {job_name}",
            f"Variance {variance_percentage:.2f}% "
            f"(previous={previous_count}, current={current_count})",
        )

    def send_completion_notification(
        self, job_name, status, rows_processed, duration, variance_percentage=None
    ) -> bool:
        return self._send(
            f"Job {status}: {job_name}",
            f"rows={rows_processed} duration={duration:.2f}s "
            f"variance={variance_percentage}",
        )


def variance_percentage(previous_count: int, current_count: int) -> float:
    """The reference's variance math
    (``services/jcap_pa_etl_service.py:363-364``): absolute delta over
    previous, as a percentage; 0 when there is no previous load."""
    if previous_count > 0:
        return abs(current_count - previous_count) / previous_count * 100.0
    return 0.0


DEFAULT_VARIANCE_THRESHOLD = 5.0  # reference core/config.py:35


def variance_exceeded(pct: float, threshold: float = DEFAULT_VARIANCE_THRESHOLD) -> bool:
    """Reference uses ``>=`` (``services/jcap_pa_etl_service.py:370``) —
    the boundary value itself trips the alert."""
    return pct >= threshold
