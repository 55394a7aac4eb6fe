"""Declared query inventory.

Each module contributes ``QUERIES: dict[str, QuerySpec]``; ``registry()``
merges them. ``__spark_entry__.py`` exposes this inventory to the driver:
Spark callables via ``queries()`` and DuckDB oracle SQL via
``oracle_sql()``.
"""

from .base import QuerySpec, registry

__all__ = ["QuerySpec", "registry"]
