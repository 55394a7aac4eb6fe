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


def _silence_bounded_window_warnings(spark: SparkSession) -> None:
    """Drop ``WindowExec: No Partition Defined`` WARNs to ERROR level.

    Every unpartitioned window in this codebase is PROVABLY BOUNDED —
    it runs over partition *metadata* (≤ npart rows: ``operators/
    ranks.py``, ``llm/packing.py``), over a post-``limit(N)`` frame
    (``llm/text.py`` top-N ranks, ``queries/lifecycle.py``), or over a
    fixed-row report (``llm/funnel.py`` 5-stage audit) — so the warning
    is pure noise that buries real signals in a 175-query bench tail.
    ``Window.partitionBy(F.lit(0))`` does NOT silence it: Catalyst
    constant-folds the foldable partition key away and WindowExec still
    sees an empty partition spec, hence the log-level filter.

    The discipline the warning used to (noisily) provide is enforced
    instead by ``tests/test_lint.py::test_unpartitioned_windows_are_
    documented_bounded``: every ``Window.orderBy(...)`` construction
    site must carry a ``bounded:`` comment stating why its input is
    small, so a REAL unpartitioned window cannot land unreviewed."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover — non-log4j2 logging backends
        pass


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
        _silence_bounded_window_warnings(self._spark)
        return self._spark

    @property
    def spark(self) -> SparkSession:
        return self.create_spark_session()

    def stop(self) -> None:
        if self._spark is not None:
            self._spark.stop()
            self._spark = None


# -- deployment conf builders (reference parity: core/spark.py:139-151 and
# manifests/spark_etl_agent.yaml) — plain dicts merged into ``extra_conf``
# so the same SparkManager deploys local, k8s, or cloud unchanged.


def s3a_conf(committer: str = "magic") -> Dict[str, str]:
    """S3A cloud-storage wiring: WebIdentity (IRSA) credentials like the
    reference (`core/spark.py:139-151`), plus the S3A committer the
    reference lacked — directory rename is NOT atomic on S3, so
    table-swap maintenance (``Catalog._swap_in``) and plain overwrite
    jobs need the magic committer's one-shot multipart completion to be
    crash-safe at 100 TB."""
    return {
        "spark.hadoop.fs.s3a.aws.credentials.provider": (
            "com.amazonaws.auth.WebIdentityTokenCredentialsProvider"
        ),
        "spark.hadoop.fs.s3a.assumed.role.credentials.provider": (
            "com.amazonaws.auth.WebIdentityTokenCredentialsProvider"
        ),
        "spark.hadoop.fs.s3a.committer.name": committer,
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        # connection pool sized for wide parquet scans
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.fast.upload": "true",
    }


def k8s_conf(
    namespace: str,
    image: str,
    service_account: str = "spark",
    executor_instances: int = 2,
    executor_memory: str = "2g",
    driver_memory: str = "2g",
) -> Dict[str, str]:
    """spark-operator / spark-on-k8s conf mirroring the reference's
    manifest (`manifests/spark_etl_agent.yaml:31-70`): static allocation
    with the external shuffle service off — executors own their shuffle
    files, which is the spark-operator default posture the reference
    runs."""
    return {
        "spark.kubernetes.namespace": namespace,
        "spark.kubernetes.container.image": image,
        "spark.kubernetes.authenticate.driver.serviceAccountName": service_account,
        "spark.executor.instances": str(executor_instances),
        "spark.executor.memory": executor_memory,
        "spark.driver.memory": driver_memory,
        "spark.shuffle.service.enabled": "false",
        "spark.dynamicAllocation.enabled": "false",
    }


def streaming_conf(
    checkpoint_root: str,
    state_store: str = "rocksdb",
    max_files_per_trigger: int = 1000,
) -> Dict[str, str]:
    """Production Structured-Streaming posture. The default in-memory
    (HDFS-backed) state store holds every key's state on the executor
    heap — at 100 TB of keyed state that is an OOM, not a tuning
    problem; RocksDB spills state to local disk with changelog
    checkpointing so executor memory bounds the working set, not the
    key space. ``maxFilesPerTrigger`` bounds micro-batch size so one
    huge backlog catch-up cannot blow past executor memory either."""
    conf = {
        "spark.sql.streaming.checkpointLocation": checkpoint_root,
        "spark.sql.streaming.maxBatchesToRetainInMemory": "2",
        "spark.sql.streaming.fileSource.log.compactInterval": "10",
        "spark.sql.streaming.sources.maxFilesPerTrigger": str(
            max_files_per_trigger
        ),
    }
    if state_store == "rocksdb":
        conf.update(
            {
                "spark.sql.streaming.stateStore.providerClass": (
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"
                ),
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
                    "true"
                ),
            }
        )
    return conf


_MANAGER: Optional[SparkManager] = None


def get_or_create_session(**kwargs) -> SparkSession:
    """Module-level singleton session (the reference creates one session
    per process and reuses it across continuous-mode iterations,
    ``app.py:283``)."""
    global _MANAGER
    if _MANAGER is None:
        _MANAGER = SparkManager(**kwargs)
    return _MANAGER.spark
