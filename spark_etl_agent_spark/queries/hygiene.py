"""Corpus-hygiene consumers: PII scrubbing audit, portable feature
hashing, and schema-evolution union (north-star extensions — the
reference has no text hygiene at all; its only string op is UPPER,
``/root/reference`` SURVEY.md §2.8).

The ``documents`` testdata is digit-free word soup, so the PII query
deterministically injects typed PII spans derived from ``doc_id``
arithmetic BEFORE scrubbing, and the oracle replays the identical
injection — the hash match therefore pins the scrubber's actual
replacement behavior (match spans, placeholder text, chained rule
order), not a vacuous zero-redaction pass. Injected shapes are chosen
so no natural text ambiguity exists: the base text has zero digits and
zero '@' — pinned by ``tests/test_hygiene.py::
test_documents_base_text_is_digit_and_at_free`` so a fixture
regeneration that breaks the precondition fails loudly, plus the
parity suite's non-vacuous-result assertion and the all-rules-fire
check.

Regex-dialect note: every PII pattern uses only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b``, non-capturing groups. The injected spans
are unambiguous (single viable parse), so Java's leftmost-first and
RE2's leftmost-longest agree on every match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..llm.scrub import PII_RULES, hashed_features, md5_bucket, scrub_documents
from .base import QuerySpec, fan_out, load

# ---------------------------------------------------------------------------
# pii_scrub_report
# ---------------------------------------------------------------------------

# Deterministic PII injection, keyed on doc_id arithmetic. Mirrored
# EXACTLY by _PII_ENRICH_SQL below — any edit must change both.


def _pii_enriched(doc_id, text):
    sid = doc_id.cast("string")
    four = F.lpad((doc_id % 10000).cast("string"), 4, "0")

    def when_mod(m, col):
        return F.when(doc_id % m == 0, col).otherwise(F.lit(""))

    return F.concat(
        text,
        when_mod(
            3, F.concat(F.lit(" contact user"), sid, F.lit("@example.com now"))
        ),
        when_mod(5, F.concat(F.lit(" ssn 123-45-"), four, F.lit(" ok"))),
        when_mod(13, F.lit(" pay 4111 1111 1111 1111 done")),
        when_mod(11, F.concat(F.lit(" call (555) 123-"), four, F.lit(" soon"))),
        when_mod(
            7,
            F.concat(
                F.lit(" host 10."),
                (doc_id % 90).cast("string"),
                F.lit("."),
                (doc_id % 80).cast("string"),
                F.lit("."),
                (doc_id % 70).cast("string"),
                F.lit(" up"),
            ),
        ),
    )


_PII_ENRICH_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||"
    " CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-' ||"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ok' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN"
    " ' pay 4111 1111 1111 1111 done' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call (555) 123-' ||"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' soon' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' ||"
    " CAST(doc_id % 90 AS VARCHAR) || '.' || CAST(doc_id % 80 AS VARCHAR)"
    " || '.' || CAST(doc_id % 70 AS VARCHAR) || ' up' ELSE '' END"
)


def pii_scrub_report(spark, sf_dir):
    """PII redaction audit over the (deterministically enriched) corpus:
    per-language counts of each redaction type, docs touched, and the
    net character delta of the rewrite. One enrichment+scrub projection
    (chained ``regexp_replace``, whole-stage codegen, zero Python) and
    one small groupBy — scan-bandwidth-bound at 100 TB.

    The per-rule counts come from ``llm/scrub.py::scrub_documents``'s
    audit columns, which count each rule against the text AS THAT RULE
    SEES IT (after earlier rules' replacements) — the chars_delta column
    cross-checks that both engines rewrote identical spans, not merely
    counted the same."""
    docs = load(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        "lang",
        _pii_enriched(F.col("doc_id"), F.col("text")).alias("text"),
    )
    scrubbed = scrub_documents(enriched, keep_original=True)
    any_hit = (
        F.col("n_email")
        + F.col("n_ssn")
        + F.col("n_credit_card")
        + F.col("n_phone")
        + F.col("n_ipv4")
        > 0
    ).cast("long")
    return (
        scrubbed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(any_hit).alias("docs_redacted"),
            F.sum("n_email").alias("emails"),
            F.sum("n_ssn").alias("ssns"),
            F.sum("n_credit_card").alias("cards"),
            F.sum("n_phone").alias("phones"),
            F.sum("n_ipv4").alias("ips"),
            F.sum(
                (F.length("text_raw") - F.length("text")).cast("long")
            ).alias("chars_delta"),
        )
        .orderBy("lang")
    )


def _pii_oracle_sql() -> str:
    """Chained-CTE oracle: one CTE per PII rule, each counting matches
    and rewriting the text the NEXT rule sees — the exact semantics of
    the Spark scrubber's chained audit."""
    parts = [
        "WITH s0 AS (\n"
        "  SELECT doc_id, lang, " + _PII_ENRICH_SQL + " AS t0\n"
        "  FROM documents\n)"
    ]
    prev = "t0"
    for i, (name, pattern, repl) in enumerate(PII_RULES, start=1):
        parts.append(
            f", s{i} AS (\n"
            f"  SELECT *,\n"
            f"    len(regexp_extract_all({prev}, '{pattern}')) AS n_{name},\n"
            f"    regexp_replace({prev}, '{pattern}', '{repl}', 'g') AS t{i}\n"
            f"  FROM s{i - 1}\n)"
        )
        prev = f"t{i}"
    parts.append(
        f"""
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n_email + n_ssn + n_credit_card + n_phone + n_ipv4
                     > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
  CAST(SUM(n_email) AS BIGINT) AS emails,
  CAST(SUM(n_ssn) AS BIGINT) AS ssns,
  CAST(SUM(n_credit_card) AS BIGINT) AS cards,
  CAST(SUM(n_phone) AS BIGINT) AS phones,
  CAST(SUM(n_ipv4) AS BIGINT) AS ips,
  CAST(SUM(length(t0) - length({prev})) AS BIGINT) AS chars_delta
FROM s{len(PII_RULES)}
GROUP BY lang
ORDER BY lang
"""
    )
    return "".join(parts)


PII_SCRUB_REPORT_SQL = _pii_oracle_sql()


# ---------------------------------------------------------------------------
# feature_hash_buckets
# ---------------------------------------------------------------------------

_FH_BUCKETS = 256


def feature_hash_buckets(spark, sf_dir):
    """Stateless feature hashing over the corpus with the PORTABLE md5
    bucketer, then a per-language bucket-load profile: how full is the
    fixed-width feature space, and how hot is its heaviest bucket.

    Consumes ``llm/scrub.py::hashed_features`` end-to-end (the
    map<bucket,count> representation is built, then exploded back for
    the audit) — the hash-match against the oracle pins the full
    tokenize → bucket → per-doc map pipeline, not just the counts.
    Shape: explode + two uniform groupBys + one id-keyed join to
    recover lang + one 5-row final agg. No vocabulary state anywhere —
    the property that matters for a 100 TB featurizer."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    hf = hashed_features(
        docs,
        n_features=_FH_BUCKETS,
        bucket_of=lambda t: md5_bucket(t, _FH_BUCKETS),
    )
    exploded = hf.select(
        "doc_id", F.explode("features").alias("bucket", "cnt")
    )
    with_lang = exploded.join(docs.select("doc_id", "lang"), "doc_id")
    loads = with_lang.groupBy("lang", "bucket").agg(
        F.sum("cnt").alias("load")
    )
    per_lang = loads.groupBy("lang").agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum("load").alias("n_tokens"),
        F.max("load").alias("max_bucket_tokens"),
    )
    n_docs = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        per_lang.join(n_docs, "lang")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "buckets_used",
            "max_bucket_tokens",
            (
                F.col("n_tokens").cast("double") / F.col("buckets_used")
            ).alias("avg_bucket_tokens"),
        )
        .orderBy("lang")
    )


FEATURE_HASH_BUCKETS_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
    unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents
),
b AS (
  SELECT doc_id, lang,
    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
  FROM toks
),
loads AS (
  SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS load
  FROM b GROUP BY lang, bucket
),
per_lang AS (
  SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS buckets_used,
    CAST(SUM(load) AS BIGINT) AS n_tokens,
    CAST(MAX(load) AS BIGINT) AS max_bucket_tokens
  FROM loads GROUP BY lang
),
nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM documents GROUP BY lang)
SELECT per_lang.lang, nd.n_docs, per_lang.n_tokens, per_lang.buckets_used,
  per_lang.max_bucket_tokens,
  CAST(per_lang.n_tokens AS DOUBLE) / per_lang.buckets_used
    AS avg_bucket_tokens
FROM per_lang JOIN nd USING (lang)
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# union_by_name_migration
# ---------------------------------------------------------------------------


def union_by_name_migration(spark, sf_dir):
    """Schema-evolution union: two 'generations' of the orders table
    with different column subsets (the v1 extract kept the price, the
    v2 extract kept status + priority) merged with
    ``unionByName(allowMissingColumns=True)`` — missing columns become
    typed NULLs — then audited per status group.

    This is the standing 100 TB concern the operator exists for:
    a partitioned table whose early partitions predate a schema change
    must be readable alongside the new ones without rewriting history.
    Both generation filters push down to the parquet scan; the union is
    plan-level (no shuffle); the only exchange is the final tiny agg."""
    orders = load(spark, sf_dir, "orders")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    merged = gen1.unionByName(gen2, allowMissingColumns=True)
    return (
        merged.groupBy(
            F.coalesce("o_orderstatus", F.lit("LEGACY")).alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_totalprice").alias("n_with_price"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("sum_total"),
        )
        .orderBy("status")
    )


UNION_BY_NAME_MIGRATION_SQL = """
WITH merged AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderstatus,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice,
         o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT COALESCE(o_orderstatus, 'LEGACY') AS status,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(o_totalprice) AS BIGINT) AS n_with_price,
  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
  COALESCE(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                     AS DECIMAL(18,4)) AS DOUBLE), CAST(0 AS DOUBLE))
    AS sum_total
FROM merged
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "pii_scrub_report": QuerySpec(
        "pii_scrub_report",
        pii_scrub_report,
        PII_SCRUB_REPORT_SQL,
        "PII redaction audit: per-lang counts per rule + char delta",
        ("text", "hygiene", "llm"),
    ),
    "feature_hash_buckets": QuerySpec(
        "feature_hash_buckets",
        feature_hash_buckets,
        FEATURE_HASH_BUCKETS_SQL,
        "Portable feature hashing: per-lang bucket-load profile",
        ("text", "hygiene", "llm"),
    ),
    "union_by_name_migration": QuerySpec(
        "union_by_name_migration",
        union_by_name_migration,
        UNION_BY_NAME_MIGRATION_SQL,
        "Schema-evolution unionByName across two table generations",
        ("relational", "schema-evolution"),
    ),
}


# ---------------------------------------------------------------------------
# kanon_publish_audit
# ---------------------------------------------------------------------------

_KANON_K = 55


def kanon_publish_audit(spark, sf_dir):
    """k-anonymity suppression before publication
    (``operators/privacy.py::kanon_suppress``): customers grouped by
    the quasi-identifier (region band, market segment); any group
    smaller than k=55 has its QI cells masked, and the published audit
    aggregates per (segment-or-masked, suppressed) — so small groups
    surface only as one indistinct '*' bucket while their rows still
    count. Row conservation (suppression never drops rows) is pinned
    in ``tests/test_hygiene.py``.

    One QI-keyed shuffle (groupBy + same-key join back, AQE broadcasts
    the tiny size table) + one small agg — the publication-hygiene pass
    a user-derived corpus runs before any per-group stat release."""
    from ..operators.privacy import kanon_suppress

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        (F.col("c_nationkey") % 5).alias("region_band"),
    )
    sup = kanon_suppress(cust, ["region_band", "c_mktsegment"], _KANON_K)
    return (
        sup.groupBy(
            F.coalesce("c_mktsegment", F.lit("*")).alias("segment"),
            "suppressed",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("region_band").alias("n_bands"),
            F.coalesce(dsum("c_acctbal"), F.lit(0.0)).alias("sum_acctbal"),
        )
        .orderBy("segment", "suppressed")
    )


KANON_PUBLISH_AUDIT_SQL = """
WITH qi AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
    c_nationkey % 5 AS region_band,
    COUNT(*) OVER (PARTITION BY c_nationkey % 5, c_mktsegment) AS gsize
  FROM customer
)
SELECT
  COALESCE(CASE WHEN gsize < 55 THEN NULL ELSE c_mktsegment END, '*')
    AS segment,
  gsize < 55 AS suppressed,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT CASE WHEN gsize < 55 THEN NULL
                           ELSE region_band END) AS BIGINT) AS n_bands,
  COALESCE(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4)))
                     AS DECIMAL(18,4)) AS DOUBLE), CAST(0 AS DOUBLE))
    AS sum_acctbal
FROM qi
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES["kanon_publish_audit"] = QuerySpec(
    "kanon_publish_audit",
    kanon_publish_audit,
    KANON_PUBLISH_AUDIT_SQL,
    "k-anonymity cell suppression: masked publication audit",
    ("hygiene", "privacy", "operators"),
)


# ---------------------------------------------------------------------------
# ldiversity_audit
# ---------------------------------------------------------------------------

_LDIV_L = 3


def ldiversity_audit(spark, sf_dir):
    """l-diversity audit (``operators/privacy.py::ldiversity_report``):
    a QI group that is large enough to survive k-anonymity suppression
    can still leak by homogeneity if (nearly) all its members share one
    sensitive value — knowing someone is in the group reveals their
    attribute. QI here is the finer (nation, segment) pair; the
    sensitive attribute is the account-balance hundred-band. Reports
    per QI group the row count, distinct sensitive bands, and the
    l ≥ {l} verdict; publication tooling withholds per-group stats for
    failing groups.

    One QI(+value)-keyed shuffle (two-phase count-distinct expand) —
    the second privacy gate a user-derived corpus runs before any
    per-group release, after ``kanon_publish_audit``'s size gate. The
    bar calibrates to the corpus being published: on the growing TPC-H
    fixtures distinct bands grow with group size, so the split is
    non-vacuous at the suite SF (pinned in ``tests/test_hygiene.py``)
    and saturates to all-pass at larger SFs — the consistency
    invariant (verdict == bar applied to the count) is pinned at every
    SF.""".format(l=_LDIV_L)
    from ..operators.privacy import ldiversity_report

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_band"),
    )
    return (
        ldiversity_report(cust, ["nation", "segment"], "bal_band", _LDIV_L)
        .select("nation", "segment", "n_rows", "n_sensitive", "meets_l")
        .orderBy("nation", "segment")
    )


LDIVERSITY_AUDIT_SQL = f"""
SELECT c_nationkey AS nation,
  c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 100) AS BIGINT)) AS BIGINT)
    AS n_sensitive,
  COUNT(DISTINCT CAST(floor(c_acctbal / 100) AS BIGINT)) >= {_LDIV_L}
    AS meets_l
FROM customer
GROUP BY 1, 2
ORDER BY 1, 2
"""


QUERIES["ldiversity_audit"] = QuerySpec(
    "ldiversity_audit",
    ldiversity_audit,
    LDIVERSITY_AUDIT_SQL,
    "l-diversity audit: distinct-sensitive-value bar per QI group",
    ("hygiene", "privacy", "operators"),
)


# ---------------------------------------------------------------------------
# pii_entity_linking
# ---------------------------------------------------------------------------

_EMAIL_RE = PII_RULES[0][1]


def pii_entity_linking(spark, sf_dir):
    """Privacy-preserving PII entity linking: emails are extracted,
    FINGERPRINTED (first 8 hex of md5 — the raw value is never stored),
    and the fingerprints are linked across documents — the signal a
    dedup/provenance pipeline needs ("these 40 docs cite the same
    contact") WITHOUT retaining the PII itself.

    Injection differs from ``pii_scrub_report`` on purpose: the email
    local part is ``doc_id % 37``, so entities genuinely repeat across
    documents and the linking is non-trivial (~37 entities, each in
    ~n/37·(2/3) docs). Extraction is native
    ``regexp_extract_all`` + ``transform(md5)`` — one projection, one
    explode, one bounded groupBy on the fingerprint key; no UDF, no
    raw-PII shuffle (only 8-hex fingerprints move)."""
    docs = load(spark, sf_dir, "documents")
    text = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                (F.col("doc_id") % 37).cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
    )
    prints = docs.select(
        "doc_id",
        F.transform(
            F.regexp_extract_all(text, F.lit(_EMAIL_RE), F.lit(0)),
            lambda m: F.substring(F.md5(m), 1, 8),
        ).alias("fps"),
    )
    exploded = prints.select("doc_id", F.explode("fps").alias("fp"))
    return (
        exploded.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy(F.desc("n_docs"), F.asc("fp"))
    )


PII_ENTITY_LINKING_SQL = (
    """
WITH enriched AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 3 <> 0 THEN ' contact user' ||
      CAST(doc_id % 37 AS VARCHAR) || '@example.com now' ELSE '' END AS t
  FROM documents
),
fps AS (
  SELECT doc_id,
    unnest(list_transform(regexp_extract_all(t, '"""
    + _EMAIL_RE
    + """'), m -> substr(md5(m), 1, 8))) AS fp
  FROM enriched
)
SELECT fp,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_mentions,
  CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM fps
GROUP BY fp
ORDER BY n_docs DESC, fp ASC
"""
)


QUERIES["pii_entity_linking"] = QuerySpec(
    "pii_entity_linking",
    pii_entity_linking,
    PII_ENTITY_LINKING_SQL,
    "Cross-doc PII entity linking via md5 fingerprints (raw PII never stored)",
    ("hygiene", "privacy", "llm"),
)
