"""Privacy-preserving publication: k-anonymity cell suppression.

A published dataset is k-anonymous over a quasi-identifier (QI) tuple
when every distinct QI combination is shared by at least k rows — the
standard bar before releasing per-group statistics derived from user
data (a group of 3 users' account balances is traceable; a group of
10 000 is not). The suppression verb masks the QI cells of every row
whose group is too small, keeping the row itself (counts stay honest)
while removing its re-identifying combination.

Scale shape: one groupBy on the QI columns + one equi-join back on the
same key — the join reuses the groupBy's hash partitioning, so the
whole pass costs a single QI-keyed shuffle of the input (AQE broadcasts
the size table instead when it is small). No window over the full
table, no collect.
"""

from __future__ import annotations

import functools
import operator
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ldiversity_report(
    df: DataFrame,
    qi_cols: List[str],
    sensitive_col,
    l: int,
) -> DataFrame:
    """l-diversity audit — the k-anonymity complement: a QI group can
    be large (k-anonymous) yet still leak if every member shares the
    same sensitive value (homogeneity attack: knowing someone is IN
    the group reveals their attribute). Reports, per QI group, the row
    count, the number of DISTINCT sensitive values, and whether it
    meets the ``l`` bar. ``sensitive_col`` may be a column name or a
    Column expression (e.g. a banded version of a numeric attribute).

    Scale shape: one groupBy on the QI columns with a count-distinct —
    Catalyst plans the distinct as the standard two-phase expand
    (partial per (QI, value), then per QI), so the pass costs one
    QI+value-keyed shuffle and never materializes per-group value
    sets. NULL QI values group together (they are a reportable group,
    not a drop)."""
    sens = (
        F.col(sensitive_col)
        if isinstance(sensitive_col, str)
        else sensitive_col
    )
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sens).alias("n_sensitive"),
        )
        .withColumn("meets_l", F.col("n_sensitive") >= F.lit(int(l)))
    )


def kanon_suppress(
    df: DataFrame, qi_cols: List[str], k: int, flag_col: str = "suppressed"
) -> DataFrame:
    """Mask (set to NULL) the QI columns of every row whose QI group
    has fewer than ``k`` members; append a boolean ``flag_col``.
    Column order and non-QI values are preserved; row count is
    conserved (suppression never drops rows — dropping them would bias
    every downstream aggregate).

    NULL QI values participate: ``groupBy`` already buckets NULL keys
    together, and the join back uses null-safe equality (``<=>``) so a
    row whose QI tuple contains NULL is sized, flagged, and (if its
    group is small) suppressed like any other — a plain equi-join would
    silently DROP those rows, breaking the row-conservation contract
    and leaking exactly the small, re-identifiable groups this verb
    exists to mask. Catalyst plans ``<=>`` keys as ordinary hash
    equi-join keys, so the single-shuffle scale shape is unchanged."""
    # Rename the size table's key columns before joining: `sizes` shares
    # lineage with `df`, so `df[c] <=> sizes[c]` would resolve to a
    # trivially-true self-comparison instead of a join key.
    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__gsize"))
    for c in qi_cols:
        sizes = sizes.withColumnRenamed(c, f"__qi_{c}")
    cond = functools.reduce(
        operator.and_,
        [F.col(c).eqNullSafe(F.col(f"__qi_{c}")) for c in qi_cols],
    )
    joined = df.join(sizes, cond)
    hit = F.col("__gsize") < k
    out_cols = []
    for c in df.columns:
        if c in qi_cols:
            out_cols.append(
                F.when(hit, F.lit(None)).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols, hit.alias(flag_col))
