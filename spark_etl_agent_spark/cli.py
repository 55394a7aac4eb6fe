"""CLI (reference parity: ``app.py:35-382``): the same flag surface —
``--job-type/--job-id/--job-name/--job-config/--job-config-file/
--list-job-types/--load-date/--limit/--continuous/--interval/--local/
--k8s/--log-level`` — config validation requiring ``type`` + ``id``
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
    # reference app.py:92-94 — k8s mode switch; the conf payload comes
    # from core.session.k8s_conf (manifest parity) and is validated
    # here like the per-job settings (image is mandatory)
    p.add_argument("--k8s", action="store_true", default=False)
    p.add_argument("--k8s-namespace", default="spark")
    p.add_argument("--k8s-image", help="container image (required with --k8s)")
    p.add_argument("--k8s-service-account", default="spark")
    p.add_argument("--k8s-executors", type=int, default=2)
    p.add_argument("--k8s-executor-memory", default="2g")
    p.add_argument("--k8s-driver-memory", default="2g")
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


def resolve_session_args(args: argparse.Namespace) -> Dict[str, Any]:
    """Map CLI mode flags → SparkManager kwargs. ``--k8s`` wins over
    the default ``--local`` (reference ``app.py:92-94``) and merges
    the spark-on-k8s conf into ``extra_conf``; a missing image is a
    config error surfaced before any JVM boots."""
    if not args.k8s:
        return {"local_mode": True, "extra_conf": None}
    if not args.k8s_image:
        raise ValueError("--k8s requires --k8s-image")
    from .core.session import k8s_conf

    return {
        "local_mode": False,
        "extra_conf": k8s_conf(
            namespace=args.k8s_namespace,
            image=args.k8s_image,
            service_account=args.k8s_service_account,
            executor_instances=args.k8s_executors,
            executor_memory=args.k8s_executor_memory,
            driver_memory=args.k8s_driver_memory,
        ),
    }


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

    try:
        session_args = resolve_session_args(args)
    except ValueError as e:
        logger.error("invalid session config: %s", e)
        return 2
    manager = SparkManager(app_name="spark_etl_agent_spark", **session_args)
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
