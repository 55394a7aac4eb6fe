"""CLI surface tests (pure functions — the Spark-touching path is
covered by the jobs end-to-end tests and a manual smoke run)."""

import json

import pytest

from spark_etl_agent_spark.cli import (
    build_parser,
    load_job_config,
    redact,
    resolve_session_args,
    validate_job_config,
)


def test_parser_flag_surface():
    """The reference's app.py flags all parse (SURVEY.md §2.12)."""
    args = build_parser().parse_args(
        [
            "--job-type", "jcap_pa_etl", "--job-id", "7", "--job-name", "x",
            "--load-date", "2026-08-13", "--limit", "5",
            "--continuous", "--interval", "30", "--local",
            "--log-level", "DEBUG", "--warehouse", "/tmp/wh",
        ]
    )
    assert args.job_type == "jcap_pa_etl" and args.interval == 30
    assert args.continuous and args.limit == 5


def test_k8s_flag_reaches_session_builder():
    """Reference ``app.py:92-94`` parity: ``--k8s`` flips local_mode
    off and the k8s conf keys land in the SparkManager's extra_conf —
    asserted on the builder kwargs, no cluster needed."""
    from spark_etl_agent_spark.core.session import SparkManager

    args = build_parser().parse_args(
        ["--k8s", "--k8s-namespace", "corpus", "--k8s-image",
         "registry.example.com/etl:1.2.3", "--k8s-executors", "8",
         "--k8s-executor-memory", "8g"]
    )
    kwargs = resolve_session_args(args)
    assert kwargs["local_mode"] is False
    conf = kwargs["extra_conf"]
    assert conf["spark.kubernetes.namespace"] == "corpus"
    assert conf["spark.kubernetes.container.image"] == (
        "registry.example.com/etl:1.2.3"
    )
    assert conf["spark.executor.instances"] == "8"
    assert conf["spark.executor.memory"] == "8g"
    # the kwargs construct a manager whose conf carries the keys
    mgr = SparkManager(app_name="t", **kwargs)
    assert mgr.local_mode is False
    assert "spark.kubernetes.namespace" in mgr.extra_conf

    # default path stays local
    local = resolve_session_args(build_parser().parse_args([]))
    assert local == {"local_mode": True, "extra_conf": None}

    # --k8s without an image is a config error (validated like the
    # reference's per-job settings)
    with pytest.raises(ValueError, match="k8s-image"):
        resolve_session_args(build_parser().parse_args(["--k8s"]))


def test_config_precedence_file_then_inline_then_flags(tmp_path):
    p = build_parser()
    # flags only
    a = p.parse_args(["--job-type", "control_m_poc_etl", "--job-id", "1"])
    assert load_job_config(a)["type"] == "control_m_poc_etl"
    # inline JSON wins over flags
    a = p.parse_args(["--job-type", "x", "--job-config", '{"type":"inline","id":"2"}'])
    assert load_job_config(a)["type"] == "inline"
    # file wins over inline
    f = tmp_path / "cfg.json"
    f.write_text(json.dumps({"type": "fromfile", "id": "3"}))
    a = p.parse_args(["--job-config", '{"type":"inline","id":"2"}',
                      "--job-config-file", str(f)])
    assert load_job_config(a)["type"] == "fromfile"


def test_validate_requires_type_and_id():
    validate_job_config({"type": "t", "id": "1"})
    with pytest.raises(ValueError, match="id"):
        validate_job_config({"type": "t"})
    with pytest.raises(ValueError, match="type"):
        validate_job_config({"id": "1"})


def test_redaction_hides_sensitive_keys():
    out = redact({"db_password": "x", "api_token": "y", "secret_key": "z",
                  "load_date": "2026-08-13"})
    assert out == {"db_password": "***", "api_token": "***", "secret_key": "***",
                   "load_date": "2026-08-13"}
