"""Corpus scrubbing for training-data pipelines: PII redaction and
feature hashing — both pure native-expression programs (zero Python in
the hot path; ``regexp_replace`` / ``hash`` run inside whole-stage
codegen), so they cost one projection over the corpus scan.

PII redaction is the standard pre-training hygiene pass: emails, phone
numbers, SSN-shaped ids, IPv4s, and credit-card-shaped numbers are
replaced with typed placeholder tokens (``<EMAIL>`` …) so downstream
dedup/tokenization see stable text instead of high-cardinality noise.
Patterns are deliberately conservative (shaped, anchored on word
boundaries) — a scrubber that eats arbitrary digit runs destroys
numerals the model should learn.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — applied in order; earlier, more specific
# patterns run first so e.g. an email is not half-eaten by a later rule.
PII_RULES: List[Tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "credit_card",
        r"\b(?:\d[ -]?){13,16}\b",
        "<CARD>",
    ),
    (
        "phone",
        r"(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
]


def scrub_pii(col: Column, rules: List[Tuple[str, str, str]] = None) -> Column:
    """Chained ``regexp_replace`` applying every rule in order — one
    codegen'd expression, no UDF."""
    out = col
    for _, pattern, repl in rules or PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def scrub_documents(
    df: DataFrame, text_col: str = "text", keep_original: bool = False
) -> DataFrame:
    """Scrub the corpus and count what was redacted per document (the
    audit trail reviewers ask for). One projection, no UDF, no joins.

    Each rule's count is evaluated against the text AS THE RULE SEES
    IT — i.e. after every preceding rule's replacement has been
    applied — so overlapping patterns (a digit run matched by both the
    card and phone shapes) are counted exactly once, by the rule that
    actually rewrote them: the audit trail always agrees with the
    scrubbed output."""
    chained = F.col(text_col)
    counts = []
    for name, pattern, repl in PII_RULES:
        counts.append(
            F.coalesce(
                F.size(F.split(chained, pattern)) - 1, F.lit(0)
            ).alias(f"n_{name}")
        )
        chained = F.regexp_replace(chained, pattern, repl)
    scrubbed = chained
    others = [c for c in df.columns if c != text_col]
    if keep_original:
        return df.select(
            *others,
            F.col(text_col).alias(f"{text_col}_raw"),
            scrubbed.alias(text_col),
            *counts,
        )
    return df.select(*others, scrubbed.alias(text_col), *counts)


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-portable bucket id: first 8 hex chars of ``md5`` → uint32
    → ``% n_buckets``. Spark's default ``hash`` (Murmur3-32, seed 42)
    is JVM-private; this bucketing is reproducible bit-for-bit by any
    engine with md5 — the property the DuckDB oracle needs, and the
    property that keeps a stored feature table valid across engine
    versions at 100 TB (a Murmur seed change would silently re-map
    every bucket)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
    bucket_of=None,
) -> DataFrame:
    """Feature hashing (the 'hashing trick'): token → ``hash(token) mod
    D`` bucket, value = count — the fixed-width sparse representation
    for linear classifiers/dedup signals with NO vocabulary to build,
    broadcast, or keep consistent across batches (the property that
    matters at 100 TB: the featurizer is stateless).

    ``bucket_of`` (token Column → bucket Column) overrides the default
    Murmur3 bucketing; pass ``lambda t: md5_bucket(t, D)`` for an
    engine-portable layout.

    Output: (id, features map<int,int>) built by one explode + one
    groupBy(id, bucket) + one map-assembling groupBy(id) — two bounded
    shuffles on uniform keys, all native expressions."""
    from .text import words_of

    toks = df.select(
        F.col(id_col), F.explode(words_of(F.col(text_col))).alias("tok")
    )
    bucket = (
        F.pmod(F.hash("tok"), F.lit(n_features))
        if bucket_of is None
        else bucket_of(F.col("tok"))
    )
    buckets = toks.select(id_col, bucket.alias("bucket"))
    per_bucket = buckets.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_bucket.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("bucket", "cnt")))
        ).alias("features")
    )
