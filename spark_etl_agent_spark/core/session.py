"""SparkSession lifecycle management.

Parity target: the reference's ``SparkManager`` (``core/spark.py:27-198``)
builds a local or k8s session with AQE, AQE partition coalescing, Arrow,
and a UTC-pinned session timezone (``core/spark.py:84-86,177``). This
module keeps those semantics and adds the scale-oriented defaults the
reference lacked (AQE skew-join handling, sane shuffle partitioning).

Local mode here is a *test harness* for a multi-executor deployment:
every query in the engine is written to partition/shuffle correctly on a
real cluster; nothing relies on single-JVM locality.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


class SparkManager:
    """Builds and owns a SparkSession (reference parity: ``core/spark.py``).

    Parameters mirror the reference's local/k8s split but only local mode
    is executable in this environment; cluster settings are expressed as
    plain config overrides so the same code deploys unchanged.
    """

    def __init__(
        self,
        app_name: str = "spark_etl_agent_spark",
        local_mode: bool = True,
        extra_conf: Optional[Dict[str, str]] = None,
        shuffle_partitions: Optional[int] = None,
    ) -> None:
        self.app_name = app_name
        self.local_mode = local_mode
        self.extra_conf = dict(extra_conf or {})
        self.shuffle_partitions = shuffle_partitions
        self._spark: Optional[SparkSession] = None

    # -- session construction -------------------------------------------------

    def create_spark_session(self) -> SparkSession:
        if self._spark is not None:
            return self._spark
        cores = _default_parallelism()
        shuffle = self.shuffle_partitions or cores
        builder = SparkSession.builder.appName(self.app_name)
        if self.local_mode:
            builder = builder.master(f"local[{cores}]")
            # local mode = driver-only JVM; the driver memory is the only
            # memory knob. Leave unset unless the caller provided one so
            # an already-running JVM is reused cleanly.
            if "spark.driver.memory" in self.extra_conf:
                builder = builder.config(
                    "spark.driver.memory", self.extra_conf["spark.driver.memory"]
                )
        conf = {
            # Reference parity (core/spark.py:84-86,177 + yaml:34-36):
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.session.timeZone": "UTC",
            "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
            # Scale posture beyond the reference:
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.shuffle.partitions": str(shuffle),
            "spark.sql.parquet.filterPushdown": "true",
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        }
        conf.update(self.extra_conf)
        for k, v in conf.items():
            builder = builder.config(k, v)
        self._spark = builder.getOrCreate()
        self._spark.sparkContext.setLogLevel("WARN")
        return self._spark

    @property
    def spark(self) -> SparkSession:
        return self.create_spark_session()

    def stop(self) -> None:
        if self._spark is not None:
            self._spark.stop()
            self._spark = None


_MANAGER: Optional[SparkManager] = None


def get_or_create_session(**kwargs) -> SparkSession:
    """Module-level singleton session (the reference creates one session
    per process and reuses it across continuous-mode iterations,
    ``app.py:283``)."""
    global _MANAGER
    if _MANAGER is None:
        _MANAGER = SparkManager(**kwargs)
    return _MANAGER.spark
