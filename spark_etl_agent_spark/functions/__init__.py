"""Scalar/aggregate expression library.

Two halves:

- :mod:`.deterministic` — cross-engine-exact numeric expressions (the
  decimal-sum / scaled-integer idioms every inventory query uses so
  Spark and the DuckDB oracle agree bitwise).
- :mod:`.registry` — ``register_all(spark)`` publishes the engine's
  reusable expressions as SQL functions, so ``spark.sql`` users call
  ``jaccard(a, b)`` or ``cosine_sim(v1, v2)`` directly (the reference
  exposes no functions at all — SURVEY.md §2.8).
"""

from .deterministic import dec, dsum, dsum_expr, davg
from .registry import register_all

__all__ = ["dec", "dsum", "dsum_expr", "davg", "register_all"]
