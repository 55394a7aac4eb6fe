"""Cross-engine-deterministic numeric expressions.

Double addition is order-dependent and Spark's aggregation order is
nondeterministic across partitionings, so raw ``SUM(double)`` results
differ run-to-run in the low bits (and differ from any other engine).
The idioms here make results *bit-exact and partitioning-independent*:

- measures cast to bounded DECIMAL before aggregation (exact integer
  arithmetic in any order), surfaced as DOUBLE through exactly one
  correctly-rounded conversion;
- averages as one IEEE division of two exact operands;
- float vectors quantized to integer-valued doubles (``floor(x·1e6)``)
  whose products and small sums stay below 2^53 — exact in any order.

These are re-exported by ``queries.base`` and used by every inventory
query; they are equally the right defaults for production pipelines,
where "the nightly total changed in the 14th digit" is a real
operational nuisance at 100 TB parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col, precision: int = 12, scale: int = 4) -> Column:
    """Bounded-decimal cast for order-independent exact aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col, precision: int = 12, scale: int = 4) -> Column:
    """Exact decimal SUM surfaced as DOUBLE via one correctly-rounded
    conversion (rescaled to DECIMAL(18,s) first so the unscaled value
    stays below 2^53)."""
    return (
        F.sum(dec(col, precision, scale)).cast(f"decimal(18,{scale})").cast("double")
    )


def dsum_expr(expr: Column, scale: int = 4) -> Column:
    """:func:`dsum` for an already-built exact-decimal expression."""
    return F.sum(expr).cast(f"decimal(18,{scale})").cast("double")


def davg(col, precision: int = 12, scale: int = 4) -> Column:
    """Exact-sum average: one IEEE division of identical operands."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(dec(c, precision, scale)).cast(f"decimal(18,{scale})").cast("double")
        / F.count(c)
    )


def scaled_vec(col: Column, scale: int = 1_000_000) -> Column:
    """float array → integer-valued double array (exact dot products;
    see ``llm.similarity`` for the full argument)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * scale).cast("double"))
