"""CLI (reference parity: ``app.py:35-382``): the same flag surface —
``--job-type/--job-id/--job-name/--job-config/--job-config-file/
--list-job-types/--load-date/--limit/--continuous/--interval/--local/
--log-level`` — config validation requiring ``type`` + ``id``
(``app.py:324-330``), sensitive-key redaction in logs (:333-335), and
exit codes (single: success=0; continuous: 0 iff >=50% runs succeed,
``app.py:340-341``).

Run as ``python -m spark_etl_agent_spark --list-job-types`` etc.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Any, Dict, Optional

from .core.session import SparkManager
from .jobs.registry import JobService
from .jobs.runner import ShutdownFlag, run_continuous_jobs, run_single_job
from .sources.catalog import Catalog

SENSITIVE_KEYS = ("password", "secret", "token", "key")


def redact(config: Dict[str, Any]) -> Dict[str, Any]:
    """Reference ``app.py:333-335``: never log credential-ish values."""
    return {
        k: "***" if any(s in k.lower() for s in SENSITIVE_KEYS) else v
        for k, v in config.items()
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="spark-etl-agent-spark",
        description="PySpark-native ETL agent (reference app.py surface)",
    )
    p.add_argument("--job-type", default="control_m_poc_etl")
    p.add_argument("--job-id", default="1")
    p.add_argument("--job-name")
    p.add_argument("--job-config", help="inline JSON job config")
    p.add_argument("--job-config-file", help="path to JSON job config")
    p.add_argument("--list-job-types", action="store_true")
    p.add_argument("--load-date", help="YYYY-MM-DD (defaults to today)")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--continuous", action="store_true")
    p.add_argument("--interval", type=int, default=60)
    p.add_argument("--local", action="store_true", default=True)
    p.add_argument("--log-level", default="INFO")
    p.add_argument(
        "--warehouse",
        default="./warehouse",
        help="catalog root directory (system of record)",
    )
    p.add_argument(
        "--stage-path",
        default="./warehouse/_stage/jcap_pa",
        help="parquet staging directory for jcap_pa_etl",
    )
    return p


def load_job_config(args: argparse.Namespace) -> Dict[str, Any]:
    """Precedence mirrors the reference (``app.py:125-141``): file, then
    inline JSON, then flags."""
    if args.job_config_file:
        with open(args.job_config_file) as f:
            config = json.load(f)
    elif args.job_config:
        config = json.loads(args.job_config)
    else:
        config = {
            "type": args.job_type,
            "id": args.job_id,
            "name": args.job_name or f"job-{args.job_id}",
            "load_date": args.load_date,
            "limit": args.limit,
        }
    return config


def validate_job_config(config: Dict[str, Any]) -> None:
    """Reference ``app.py:324-330``: type and id are mandatory."""
    missing = [k for k in ("type", "id") if not config.get(k)]
    if missing:
        raise ValueError(f"job config missing required keys: {missing}")


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )
    logger = logging.getLogger("spark_etl_agent_spark.cli")

    if args.list_job_types:
        # static metadata — no reason to boot a JVM for a listing
        from .jobs.registry import list_job_types

        for name, desc in list_job_types().items():
            print(f"{name}: {desc}")
        return 0

    manager = SparkManager(app_name="spark_etl_agent_spark", local_mode=args.local)
    try:
        catalog = Catalog(manager.spark, args.warehouse)
        job_service = JobService(catalog, stage_path=args.stage_path)

        config = load_job_config(args)
        validate_job_config(config)
        logger.info("job config: %s", redact(config))

        if args.continuous:
            flag = ShutdownFlag()
            flag.install()
            stats = run_continuous_jobs(
                job_service, config, interval_seconds=args.interval, shutdown=flag
            )
            logger.info("continuous stats: %s", stats)
            return 0 if stats["exit_success"] else 1

        result = run_single_job(job_service, config)
        logger.info("result: %s", {k: str(v) for k, v in result.items()})
        return 0 if result.get("status") == "Success" else 1
    finally:
        manager.stop()


if __name__ == "__main__":
    sys.exit(main())
