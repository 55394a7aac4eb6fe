"""Data sources & sinks.

The reference's durable data model is two string-addressed stores:
Redshift ``schema.table`` over JDBC (``utils/db_utils.py``) and Parquet
directories on S3A (``services/s3_service.py``). Here the system of
record is the :class:`~spark_etl_agent_spark.sources.catalog.Catalog`
(Parquet-backed managed tables — the SURVEY.md §1.5 mapping), with
:mod:`.files` for path-addressed IO in any format and :mod:`.jdbc`
keeping the reference's connector API for optional external databases.
"""

from .catalog import Catalog
from .files import FileIO

__all__ = ["Catalog", "FileIO"]
