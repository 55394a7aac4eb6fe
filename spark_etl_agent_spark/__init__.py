"""spark_etl_agent_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference ETL agent
(Madhunil/spark-etl-agent, surveyed in SURVEY.md) as an idiomatic Spark
DataFrame/SQL engine:

- all query semantics execute in Spark/Catalyst (the reference pushed its
  one analytical query down to Redshift; see SURVEY.md §2, reference
  ``services/jcap_pa_etl_service.py:176-227``),
- the orchestration surface (job registry, result envelopes, validation
  verbs, variance alerting, continuous loop; reference ``app.py``,
  ``services/job_service.py``) is rebuilt with the same names and keys,
- plus the LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal columns) designed for 100 TB scale.

Nothing in this package is copied from the reference; citations in
docstrings are for behavioral parity checking only.
"""

__version__ = "0.1.0"
