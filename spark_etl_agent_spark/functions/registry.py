"""SQL-callable function registration.

``register_all(spark)`` publishes the engine's reusable expressions to
the session's function registry so plain ``spark.sql`` text can use
them. Everything is registered as a *SQL macro-style* temp function
built from native expressions (``F.udf`` is deliberately absent — no
Python in the hot path; SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (argument list, native-SQL body). Bodies are pure Spark SQL
# expressions, so Catalyst inlines and codegens them like any built-in.
_SQL_FUNCTIONS = {
    # text
    "word_count": ("s STRING", "size(split(lower(s), '\\\\s+'))"),
    "norm_text": ("s STRING", "trim(regexp_replace(lower(s), '\\\\s+', ' '))"),
    "content_hash": ("s STRING", "md5(s)"),
    "bpe_est_tokens": ("s STRING", "(length(s) + 3) div 4"),
    # vectors (array<float>/array<double>)
    "vec_dot": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)",
    ),
    "vec_norm": (
        "a ARRAY<DOUBLE>",
        "sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v))",
    ),
    "cosine_sim": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) "
        "/ (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v))"
        " * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)))",
    ),
    # sets (arrays as sets)
    "jaccard": (
        "a ARRAY<STRING>, b ARRAY<STRING>",
        "CASE WHEN size(array_union(a, b)) = 0 THEN CAST(NULL AS DOUBLE) "
        "ELSE CAST(size(array_intersect(a, b)) AS DOUBLE) / size(array_union(a, b)) END",
    ),
    # dates
    "greatest_date_nullsafe": (
        "a DATE, b DATE",
        "CASE WHEN b > a THEN b ELSE a END",  # reference P10 CASE form
    ),
}


def register_all(spark: SparkSession) -> list:
    """Create all engine functions as temporary SQL functions; returns
    the registered names (idempotent — OR REPLACE)."""
    for name, (args, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) RETURNS "
            f"{_return_type(name)} RETURN {body}"
        )
    return sorted(_SQL_FUNCTIONS)


def _return_type(name: str) -> str:
    return {
        "word_count": "INT",
        "norm_text": "STRING",
        "content_hash": "STRING",
        "bpe_est_tokens": "BIGINT",
        "vec_dot": "DOUBLE",
        "vec_norm": "DOUBLE",
        "cosine_sim": "DOUBLE",
        "jaccard": "DOUBLE",
        "greatest_date_nullsafe": "DATE",
    }[name]
