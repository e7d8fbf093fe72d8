"""etl_cloud_logistics_spark — a PySpark-native analytics engine.

Re-creates the query surface and data semantics of the reference project
``Lei541/etl-cloud-logistics`` (PostgreSQL + pandas + Snowflake + Lambda)
as an idiomatic Spark DataFrame/SQL engine, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for a 1000-executor / 100 TB deployment but testable on local[*].

Layout:
  session       SparkSession factory with scale-aware defaults
  catalog       explicit StructType schemas + table loaders for the testdata
  functions     scalar column helpers (dow conventions, geo distance, exact sums)
  operators     DataFrame-level algorithms (SCD2, as-of join, dedup, similarity,
                quality/QA gates)
  queries       the named query registry consumed by __spark_entry__.py
  streaming     Structured Streaming jobs mirroring the reference's Lambda path
  multimodal    binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
