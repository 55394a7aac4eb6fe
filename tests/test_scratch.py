"""core.scratch.scratch_dir: stale-sibling reaping semantics."""

import os
import time

from spark_etl_agent_spark.core.scratch import scratch_dir


def test_scratch_dir_reaps_only_stale_same_prefix(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # force re-read of TMPDIR
    try:
        prefix = "spark_graft_test_reap_"
        stale = tmp_path / f"{prefix}old"
        fresh = tmp_path / f"{prefix}new"
        other = tmp_path / "spark_graft_other_old"
        for d in (stale, fresh, other):
            d.mkdir()
            (d / "part-0.parquet").write_bytes(b"x")
        old = time.time() - 7200
        os.utime(stale, (old, old))
        os.utime(other, (old, old))

        made = scratch_dir(prefix, max_age_s=3600)
        assert os.path.isdir(made) and os.path.basename(made).startswith(
            prefix
        )
        assert not stale.exists(), "stale same-prefix sibling not reaped"
        assert fresh.exists(), "fresh sibling must survive (in-flight plan)"
        assert other.exists(), "different-prefix dir must never be touched"
    finally:
        tempfile.tempdir = None  # don't leak the patched TMPDIR


def test_scratch_dir_returns_fresh_unique_dirs(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        a = scratch_dir("spark_graft_test_uniq_")
        b = scratch_dir("spark_graft_test_uniq_")
        assert a != b and os.path.isdir(a) and os.path.isdir(b)
    finally:
        tempfile.tempdir = None
