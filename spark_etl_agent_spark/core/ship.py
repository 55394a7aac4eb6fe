"""Ship the package to executor-side Python workers.

Any entry point that loads this package from a non-repo CWD (the driver
contract module, ``bench.py``, a notebook) has the same problem: the
driver resolves ``spark_etl_agent_spark`` via its own ``sys.path``
patch, but Arrow-batched operators (``mapInPandas`` in
``llm.multimodal``) serialize closures that reference package functions
by module name, and executor Python workers inherit neither the
driver's ``sys.path`` nor its CWD. Zipping the package once per
SparkContext and ``addPyFile``-ing it is the same mechanism a real
cluster submit uses (``--py-files``).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_ROOT = os.path.dirname(_PKG_DIR)

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``spark_etl_agent_spark`` importable on Python workers
    (idempotent per SparkContext)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    zip_base = os.path.join(
        tempfile.mkdtemp(prefix="spark_etl_agent_pkg_"), "spark_etl_agent_spark"
    )
    archive = shutil.make_archive(
        zip_base, "zip", root_dir=_REPO_ROOT, base_dir="spark_etl_agent_spark"
    )
    sc.addPyFile(archive)
    _SHIPPED.add(key)
