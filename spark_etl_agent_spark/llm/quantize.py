"""Embedding quantization — the vector-index compression step of a
large-scale similarity stack (int8 symmetric quantization, the
"scalar quantization" tier of IVF-PQ-style indexes).

A 100 TB corpus's embedding table is itself TB-scale at float32;
serving ANN from it means quantizing: int8 cuts the index 4× and most
accelerators dot-product int8 natively. The operator is a pure
per-row projection — no shuffle, scan-bound, embarrassingly parallel —
and reports the fidelity metrics an index builder gates on (per-vector
quantization error and angular fidelity).

Determinism contract (same discipline as ``llm.similarity``):
components are first quantized to integer-valued doubles
(``floor(x·1e6)``), so the derived scale, int8 codes, error units and
dot products are all exact arithmetic on identical operands in Spark
and the DuckDB oracle — order-independent, partitioning-independent.
The angular-fidelity cosine uses the INT code vector directly (the
dequantization scale cancels inside cosine), keeping every sum exact
under 2⁵³.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization + fidelity report.

    For each vector: ``scale = max|x|/127``, ``q_i = round(x_i/scale)``
    (ties away from zero in both engines), dequantized error
    ``|q_i·scale − x_i|``. Output per vector:

    - ``n_dims``
    - ``scale`` (in micro-component units)
    - ``sum_abs_err`` / ``max_abs_err`` — error in nano units
      (micro-components × 1000), exact longs
    - ``cos_fidelity`` — cosine(original, quantized); scale cancels, so
      it is computed on exact integer dot products
    """
    x = F.transform(
        F.col(vec_col), lambda v: F.floor(v.cast("double") * 1e6).cast("double")
    )
    out = df.select(F.col(id_col), x.alias("__x"))
    absmax = F.array_max(F.transform(F.col("__x"), F.abs))
    out = out.withColumn("__scale", absmax / F.lit(127.0))
    q = F.when(
        F.col("__scale") > 0,
        F.transform(F.col("__x"), lambda v: F.round(v / F.col("__scale"))),
    ).otherwise(F.transform(F.col("__x"), lambda v: F.lit(0.0)))
    out = out.withColumn("__q", q)
    errs = F.zip_with(
        F.col("__x"),
        F.col("__q"),
        lambda a, b: F.round(
            F.abs(b * F.col("__scale") - a) * F.lit(1000.0)
        ).cast("long"),
    )
    dot_xq = F.aggregate(
        F.zip_with(F.col("__x"), F.col("__q"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dot_xx = F.aggregate(
        F.transform(F.col("__x"), lambda v: v * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dot_qq = F.aggregate(
        F.transform(F.col("__q"), lambda v: v * v),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return out.select(
        id_col,
        F.size("__x").alias("n_dims"),
        F.col("__scale").alias("scale"),
        F.aggregate(
            errs, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("sum_abs_err"),
        F.coalesce(F.array_max(errs), F.lit(0).cast("long")).alias(
            "max_abs_err"
        ),
        F.when(
            (F.col("__scale") > 0) & (dot_qq > 0),
            dot_xq / (F.sqrt(dot_xx) * F.sqrt(dot_qq)),
        ).alias("cos_fidelity"),
    )
