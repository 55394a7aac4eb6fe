"""Testdata schema contract canaries.

The driver regenerates /root/testdata between rounds and its physical
choices are NOT frozen (round 2 lesson: ``events.ts`` flipped from
TIMESTAMP(NANOS) to ``timestamp[us]`` and broke nine queries at
analysis time). These tests fail in seconds — before any query runs —
if a generator change lands that ``load()`` doesn't absorb.
"""

import os

import pytest
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from spark_etl_agent_spark.queries.base import TABLES, load

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_events_ts_loads_as_timestamp(spark, sf):
    """``load("events")`` must deliver ``ts`` as a timestamp regardless of
    how the generator physically encoded it (nanos-as-long or native
    micro/milli)."""
    df = load(spark, sf, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, (TimestampType, TimestampNTZType)), dt
    assert not isinstance(dt, LongType)
    # one cheap action proves the scan itself parses
    assert df.limit(1).count() >= 0


@pytest.mark.parametrize("sf", SF_DIRS)
def test_all_tables_parse(spark, sf):
    """Every declared table opens and exposes a non-empty schema."""
    for t in TABLES:
        df = load(spark, sf, t)
        assert len(df.schema.fields) > 0, t
