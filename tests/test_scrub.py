"""PII scrubbing + feature hashing tests (llm/scrub.py)."""

from pyspark.sql import functions as F

from spark_etl_agent_spark.llm.scrub import (
    hashed_features,
    scrub_documents,
    scrub_pii,
)
from spark_etl_agent_spark.queries.base import load


def test_scrub_pii_redacts_each_type(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@example.com call (555) 123-4567 "
             "ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1 "
             "year 2024 has 365 days")],
        "doc_id long, text string",
    )
    out = df.select(scrub_pii(F.col("text")).alias("t")).collect()[0].t
    assert "<EMAIL>" in out and "example.com" not in out
    assert "<PHONE>" in out
    assert "<SSN>" in out and "123-45-6789" not in out
    assert "<CARD>" in out and "4111" not in out
    assert "<IP>" in out and "10.0.0.1" not in out
    # conservative: ordinary numerals survive
    assert "2024" in out and "365" in out


def test_scrub_documents_counts_and_keeps_schema(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and c@d.org wrote", "en"),
         (2, "no pii here at all", "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in scrub_documents(df).collect()}
    assert out[1].n_email == 2 and out[2].n_email == 0
    assert "<EMAIL>" in out[1].text and out[2].text == "no pii here at all"
    assert out[1].lang == "en"  # non-text columns pass through

    kept = scrub_documents(df, keep_original=True).columns
    assert "text_raw" in kept and "text" in kept


def test_hashed_features_stateless_and_consistent(spark, sf_dir):
    """Same text → same buckets regardless of batch/partitioning (the
    vocabulary-free property), counts equal the token counts."""
    docs = load(spark, sf_dir, "documents").limit(50)
    a = {r.doc_id: r.features for r in hashed_features(docs).collect()}
    b = {
        r.doc_id: r.features
        for r in hashed_features(docs.repartition(7)).collect()
    }
    assert a == b and a
    # total feature mass = token count per doc
    from spark_etl_agent_spark.llm.text import words_of

    toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(words_of(F.col("text"))).alias("n")
        ).collect()
    }
    for doc_id, feats in a.items():
        assert sum(feats.values()) == toks[doc_id]
        assert all(0 <= k < 1024 for k in feats)


def test_repetition_stats_flags_boilerplate(spark):
    from spark_etl_agent_spark.llm.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "click here to win " * 25),                      # degenerate
            (2, "the quick brown fox jumps over the lazy dog and then "
                "wanders far away to sleep under an old oak tree today"),
            (3, "too short"),                                    # < ngram
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].repetition_ratio > 0.5
    assert rows[2].repetition_ratio < 0.2
    assert rows[3].repetition_ratio == 0.0 and rows[3].top_ngram_count == 0


def test_repetition_stats_runs_on_corpus(spark, sf_dir):
    from spark_etl_agent_spark.llm.text import repetition_stats

    docs = load(spark, sf_dir, "documents")
    rows = repetition_stats(docs).collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r.repetition_ratio <= 1.0 + 1e-9 for r in rows)


def test_scrub_counts_agree_with_sequential_redaction(spark):
    """Overlapping rules: the card digits would also partially match the
    phone shape, but counts are evaluated on the text as each rule sees
    it (after preceding replacements), so the audit trail matches the
    actual rewrites: card=1, phone=0."""
    df = spark.createDataFrame(
        [(1, "pay 4111 1111 1111 1111 now")], "doc_id long, text string"
    )
    r = scrub_documents(df).collect()[0]
    assert r.n_credit_card == 1
    assert r.n_phone == 0
    assert "<CARD>" in r.text and "<PHONE>" not in r.text
