"""Round-10 ADVICE regression pins.

1. regression_gate waivers are scoped to the gated round's NOTES file —
   a historical waiver must not exempt a query forever.
2. Catalog.table_file_count recurses into partition subdirectories.
3. scratch_dir's default reap age is a day, not an hour — a >1 h bench
   session's live scratch tables must survive a concurrent invocation.
4. png_gray_pixels / png_parse raise the ValueError contract (not
   struct.error) on a truncated chunk.
"""

import os
import sys
import time

import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from regression_gate import _waivers  # noqa: E402

from spark_etl_agent_spark.core.scratch import scratch_dir
from spark_etl_agent_spark.llm.multimodal import (
    png_encode,
    png_gray_pixels,
    png_parse,
)
from spark_etl_agent_spark.sources.catalog import Catalog


def test_waivers_scoped_to_gated_round(tmp_path, monkeypatch):
    import regression_gate as rg

    monkeypatch.setattr(rg, "_repo_root", lambda: str(tmp_path))
    (tmp_path / "NOTES_r09.md").write_text(
        "REGRESSION-WAIVER: old_query — past-round adjudication\n"
    )
    (tmp_path / "NOTES_r10.md").write_text(
        "REGRESSION-WAIVER: new_query — this-round adjudication\n"
    )
    w10 = _waivers(str(tmp_path / "BENCH_PAIRED_r10.json"))
    assert "new_query" in w10 and "old_query" not in w10
    w09 = _waivers(str(tmp_path / "BENCH_PAIRED_r09.json"))
    assert "old_query" in w09 and "new_query" not in w09
    # unparseable tag or missing NOTES file -> no waivers, not a crash
    assert _waivers(str(tmp_path / "weird.json")) == {}
    assert _waivers(str(tmp_path / "BENCH_PAIRED_r99.json")) == {}


def test_table_file_count_recurses_into_partitions(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(100).selectExpr("id", "id % 4 AS part_key")
    df.write.partitionBy("part_key").parquet(cat.path("parted"))
    n = cat.table_file_count("parted")
    assert n >= 4, "partitioned data files must be counted, not 0"
    # unpartitioned behavior unchanged
    spark.range(10).coalesce(1).write.parquet(cat.path("flat"))
    assert cat.table_file_count("flat") == 1


def test_scratch_default_age_spares_recent_siblings(tmp_path, monkeypatch):
    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    prefix = "spark_graft_test_age_"
    old = tmp_path / f"{prefix}live"
    old.mkdir()
    two_hours_ago = time.time() - 2 * 3600
    os.utime(old, (two_hours_ago, two_hours_ago))
    scratch_dir(prefix)  # default age: a 2h-old sibling is NOT stale
    assert old.exists(), "a 2h-old scratch dir must survive the default reap"
    scratch_dir(prefix, max_age_s=3600)
    assert not old.exists(), "explicit 1h age still reaps it"


def test_truncated_png_chunk_raises_value_error():
    raw = png_encode(8, 8, bytes(range(64)))
    # cut 2 bytes into the IEND CRC: the chunk header is still readable
    # (so the walk enters the body) but the CRC slice is short — the
    # shape that used to escape as struct.error
    truncated = raw[: len(raw) - 2]
    with pytest.raises(ValueError, match="truncated"):
        png_gray_pixels(truncated)
    with pytest.raises(ValueError, match="truncated"):
        png_parse(truncated)
    # a chunk whose declared length runs past the buffer is the same
    # contract violation
    bad_len = raw[:33] + b"\xff\xff\xff\xff" + raw[37:]
    with pytest.raises(ValueError, match="truncated"):
        png_gray_pixels(bad_len)
