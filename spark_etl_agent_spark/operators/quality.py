"""Data-quality audit verbs: referential integrity at scale.

The reference's validation surface is row-count variance
(``services/jcap_pa_etl_service.py`` backup/validate); a 100 TB corpus
also needs *relationship* checks — how many child rows point at a
parent key that does not exist. This is the load-gate that catches a
partial dimension load before a silently-wrong join fans out NULLs.

Shape: ``left_anti`` join per relation (one shuffle on the FK — or zero
when the parent key set broadcasts), aggregated to a one-row summary,
results unioned. Never materializes the orphan rows to the driver; for
the remediation path, call :func:`orphans` to get the rows themselves
as a DataFrame and sink them.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no matching parent key (NULL FKs are not
    orphans — they are counted separately by the audit)."""
    return child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )


def referential_audit(
    relations: List[Tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """One summary row per (name, child, child_key, parent, parent_key)
    relation: child row count, NULL-FK count, orphan count.

    Each relation costs one anti-join over the child; Spark plans a
    broadcast anti-join whenever the distinct parent key set is small
    (the usual dimension case), so the common audit is shuffle-free on
    the fact side.
    """
    out = None
    for name, child, child_key, parent, parent_key in relations:
        n_orphans = (
            orphans(child, child_key, parent, parent_key)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("relation"), F.col("n").alias("n_orphans"))
        )
        base = child.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_child_rows"),
            F.sum(
                F.when(F.col(child_key).isNull(), 1).otherwise(0)
            ).cast("long").alias("n_null_fk"),
        )
        piece = base.join(n_orphans, on="relation", how="inner")
        out = piece if out is None else out.unionByName(piece)
    return out
