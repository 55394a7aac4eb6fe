"""Scoped cache lifetime for long-lived sessions.

Operators in this package persist intermediates that feed multiple
consumers (shingle tables, fingerprint tables, localCheckpoints). In a
one-shot job the session teardown releases them; in a long-lived
session (a streaming ``foreachBatch`` loop, a 123-query bench run)
they accumulate unless released. ``spark.catalog.clearCache()`` is the
wrong tool twice over: it evicts caches owned by *unrelated* concurrent
work in the same session, and it does not release RDD-level
``localCheckpoint`` storage at all.

``scoped_caches`` snapshots the JVM's persistent-RDD map around a
block and unpersists exactly the entries the block created — other
owners' caches are untouched.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


def _persistent_rdd_ids(spark: SparkSession) -> set:
    """IDs of all currently-persisted RDDs (DataFrame caches AND
    localCheckpoints both surface here — `sc.getPersistentRDDs` is the
    one registry that sees every storage-holding entity)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {jid for jid in jmap.keySet().toArray()}


@contextmanager
def scoped_caches(spark: SparkSession, blocking: bool = False):
    """Unpersist every RDD/DataFrame cache *created inside* the block,
    leaving pre-existing caches alone.

    >>> with scoped_caches(spark):
    ...     verdicts = incremental_neardup_verdicts(index, batch)
    ...     verdicts.count()      # probe's internal persists live here
    ... # ...and are released here; the caller's own caches survive
    """
    before = _persistent_rdd_ids(spark)
    try:
        yield
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jid in jmap.keySet().toArray():
            if jid not in before:
                rdd = jmap.get(jid)
                if rdd is not None:
                    rdd.unpersist(blocking)
