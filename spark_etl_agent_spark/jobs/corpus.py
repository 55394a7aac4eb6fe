"""Job 3: ``corpus_dedup_etl`` — the training-corpus cleaning workflow,
composed from the LLM-pipeline operators as a first-class orchestrated
job (the north-star extension surface run the way the reference runs
its ETL: catalog in, catalog out, count invariants, result envelope —
``services/jcap_pa_etl_service.py:40-107`` is the envelope model).

Stages, all one lazy DataFrame program except the two survivor
materializations:

1. quality gate    — length / vowel-ratio / stopword heuristics
2. exact dedup     — content-hash groupBy, min-id survivor
3. near-dup pairs  — MinHash-LSH candidates, exact-Jaccard verified
4. clustering      — connected components over the pair graph
5. survivors       — drop every cluster member except its keeper

Scale posture: stages 1-2 are scan + one uniform-key shuffle; stage 3
is the bounded band-key shuffle (llm.dedup docstring); stage 4 is
per-round bounded shuffles over the (tiny) near-dup graph only —
the full corpus never enters the iterative loop.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm import dedup as D
from ..llm.text import EN_STOPWORDS, words_of
from ..operators.graph import connected_components
from ..operators.observe import metrics_of, with_metrics
from ..operators.quality import Expectation, expectation_report, not_null
from ..sources.catalog import Catalog


def quality_gate(
    docs: DataFrame,
    min_words: int = 30,
    vowel_lo: float = 0.2,
    vowel_hi: float = 0.6,
    max_repetition: Optional[float] = None,
) -> DataFrame:
    """The corpus_quality_filter gates as a reusable stage (same
    heuristics as queries/subqueries.py::corpus_quality_filter).

    ``max_repetition`` (opt-in) additionally drops documents whose
    top-ngram coverage ratio (``llm.text.repetition_stats`` — the
    Gopher-style boilerplate signal) exceeds the bound; costs one extra
    pair of uniform-key shuffles over the gated docs only."""
    text = F.col("text")
    words = words_of(text)
    n_words = F.size(words).cast("long")
    n_vowels = (
        F.length(text) - F.length(F.regexp_replace(F.lower(text), "[aeiou]", ""))
    ).cast("long")
    vowel_ratio = n_vowels.cast("double") / F.length(text).cast("long")
    en_hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS))).cast("long")
    gated = docs.filter(
        (n_words >= min_words)
        & (vowel_ratio >= vowel_lo)
        & (vowel_ratio <= vowel_hi)
        & (en_hits >= 1)
    )
    if max_repetition is not None:
        from ..llm.text import repetition_stats

        ok = repetition_stats(gated).filter(
            F.col("repetition_ratio") <= max_repetition
        ).select("doc_id")
        gated = gated.join(ok, "doc_id", "left_semi")
    return gated


class CorpusDedupService:
    def __init__(
        self,
        catalog: Catalog,
        source_table: str = "corpus.documents",
        dest_table: str = "corpus.documents_clean",
        min_jaccard: float = 0.6,
    ) -> None:
        self.catalog = catalog
        self.source_table = source_table
        self.dest_table = dest_table
        self.min_jaccard = min_jaccard

    def run_corpus_dedup_etl(self, load_date: Optional[str] = None) -> Dict[str, Any]:
        start_time = datetime.now()
        if not load_date:
            load_date = datetime.now().strftime("%Y-%m-%d")

        docs = self.catalog.read_table(self.source_table)
        # input count observed, not counted: the metric piggybacks on
        # the contract-gate pass below instead of paying a dedicated
        # full scan of the source (operators.observe)
        docs, in_obs = with_metrics(docs, n_input=F.count(F.lit(1)))

        # contract gate BEFORE any cleaning: a batch whose keys are
        # broken must fail loudly, not flow into dedup where a NULL or
        # duplicated doc_id silently corrupts keeper selection. One
        # aggregation pass (operators.quality.expectation_report).
        contract = expectation_report(
            docs,
            [
                Expectation("doc_id not null", not_null("doc_id")),
                Expectation("text not null", not_null("text")),
            ],
            unique_keys=["doc_id"],
        ).collect()  # bounded: one row per rule
        failed_rules = [r.rule for r in contract if not r.passed]
        if failed_rules:
            raise RuntimeError(
                f"source contract violated: {failed_rules} "
                f"(table {self.source_table})"
            )
        n_input = int(metrics_of(in_obs)["n_input"])

        gated = quality_gate(docs).cache()
        uniq = None
        try:
            n_after_quality = gated.count()

            # exact dedup: keep the min doc_id of each identical content
            exact_keepers = (
                D.exact_dedup_groups(gated)
                .select(F.col("keeper_id").alias("doc_id"))
            )
            uniq = gated.join(exact_keepers, "doc_id", "left_semi").cache()
            n_after_exact = uniq.count()

            # near-dup pairs among the unique docs, Jaccard-verified
            pairs = D.jaccard_verify(
                uniq, D.lsh_candidate_pairs(D.minhash_signatures(uniq))
            ).filter(F.col("jaccard") >= self.min_jaccard).select("id_a", "id_b")

            # clusters → drop everything but each cluster's min-id keeper
            cc = connected_components(pairs)
            dropped = cc.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias("doc_id")
            )
            survivors = uniq.join(dropped, "doc_id", "left_anti").withColumn(
                "load_date", F.lit(load_date)
            )

            self.catalog.write_table(survivors, self.dest_table, mode="overwrite")
            n_survivors = self.catalog.get_table_count(self.dest_table)
            if n_input > 0 and n_survivors == 0:
                raise RuntimeError("corpus dedup produced zero survivors")
        finally:
            if uniq is not None:
                uniq.unpersist()
            gated.unpersist()

        end_time = datetime.now()
        return {
            "status": "Success",
            "rows_processed": n_survivors,
            "start_time": start_time,
            "end_time": end_time,
            "duration_seconds": (end_time - start_time).total_seconds(),
            "source_table": self.source_table,
            "destination_table": self.dest_table,
            "load_date": load_date,
            "n_input": n_input,
            "n_after_quality": n_after_quality,
            "n_after_exact_dedup": n_after_exact,
            "n_dropped_neardup": n_after_exact - n_survivors,
            "min_jaccard": self.min_jaccard,
        }
