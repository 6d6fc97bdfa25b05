"""etl_workflow_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
reference e-commerce analytics platform (iamnaumansafdar/etl-workflow)
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) a 100 TB training-data pipeline
needs.

Layout:
  session.py    — SparkSession factory tuned for local[32] and cluster
  catalog.py    — table registration over the parquet testdata
  schemas.py    — authoritative StructTypes (reference DDL parity)
  queries.py    — the 4 analytics queries + mutation-equivalent
  operators/    — ETL transforms, dedup, similarity, text, multimodal
  sources/      — readers (CSV/parquet) and idempotent/partitioned sinks
  streaming/    — Structured Streaming incremental aggregation
  plans/        — plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
