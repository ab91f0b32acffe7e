"""european_public_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
``andre-dussing/european-public-data-pipeline`` (medallion ETL for Eurostat
JSON-stat time series: Bronze raw JSON -> Silver tidy Parquet -> quality gate
-> Gold warehouse), re-expressed on the Spark DataFrame/SQL engine so every
operator scales from one series to 100 TB, plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing, streaming).

Layout
------
- ``session``    SparkSession factory tuned for local testing / cluster scale
- ``tables``     star-schema + documents/embeddings/events table loaders
- ``sources``    JSON-stat 2.0 reader, partitioned blob-layout IO, JDBC sink
- ``functions``  scalar column expressions (time parsing, JSON, hashing)
- ``pipeline``   bronze/silver/gold medallion stages (the reference surface)
- ``quality``    declarative data-quality constraint library + gate
- ``operators``  relational query catalog, dedup, similarity, text, multimodal
- ``plans``      query registry mapping names -> (builder, oracle SQL)
- ``streaming``  Structured Streaming event analytics
"""

__version__ = "0.1.0"
