"""webscrap_datapipeline_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the data-processing semantics of the
reference repo ``TheCardist/WebScrap_DataPipeline`` (an incremental
scrape→change-detect→transform→load ETL pipeline), re-expressed as lazy
Spark DataFrame plans, plus the LLM-data-pipeline extension surface
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout:
    session     — tuned SparkSession builder (AQE, UTC, Arrow)
    catalog     — explicit-schema readers for the test tables
    functions/  — scalar column expressions (reference §2.7 + text/vector)
    operators/  — composite relational operators (change detection, SCD,
                  dedup, similarity, as-of join, enrichment)
    sources/    — file-format readers/writers + state store
    plans/      — the oracle-checked query registry (driver contract)
    streaming/  — Structured Streaming formulations
"""

__version__ = "0.1.0"
