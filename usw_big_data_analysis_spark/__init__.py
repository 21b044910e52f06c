"""usw_big_data_analysis_spark — a PySpark-native tabular analytics & ML-pipeline engine.

Re-implements, Spark-first, the query and data-processing capability surface of
the ``Woochang4862/USW-Big-Data-Analysis`` reference (see SURVEY.md for the
operator inventory with reference citations), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, streaming) designed for
horizontal scale.

Layout
------
- ``session``    : SparkSession builder tuned for the local[32] test harness.
- ``sources``    : scans/sinks (parquet fixture tables, CSV, text, JSON).
- ``operators``  : relational/EDA operators (aggregates, crosstab, windows,
                   dedup, similarity) as reusable library functions.
- ``functions``  : scalar/expression helpers, metrics, statistical tests.
- ``plans``      : composed pipelines (metadata-driven cleaning ETL, splits).
- ``streaming``  : Structured Streaming operators over the events table.
- ``queries``    : the driver-checked query registry — one named query +
                   DuckDB oracle SQL per SURVEY.md §2 inventory row.
"""

__version__ = "0.1.0"
