"""Readers — the reference's extract stage, Spark-first.

The reference chunks CSVs at 10k rows for bounded memory
(``workflow.py:29-35``) and concatenates the chunks back
(``workflow.py:39-42``). Spark's partitioned reads subsume both: a
scan is already split into ~``maxPartitionBytes`` tasks, so A1/A2/A3
collapse into one declarative read. Schemas are explicit (never
inferred) — inference costs an extra pass and types drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schemas import CSV_SCHEMAS


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    table_name: str | None = None,
    **options: str,
) -> DataFrame:
    """CSV scan with an explicit schema (A1/A2).

    ``table_name`` looks the schema up in the reference DDL registry;
    malformed rows go to ``_corrupt_record``-free PERMISSIVE nulls and
    are handled by the clean stage (B2), matching the reference's
    tolerant pandas reads.
    """
    if schema is None and table_name is not None:
        schema = CSV_SCHEMAS[table_name]
    reader = spark.read.options(header=True, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # explicit opt-in only
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def union_chunks(*chunks: DataFrame) -> DataFrame:
    """A3 ``concatenate_chunks`` equivalent — UNION ALL by name.

    With Spark reads this is usually a no-op (one DataFrame, many
    partitions); kept for multi-source ingestion parity.
    """
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c, allowMissingColumns=False)
    return out


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines scan. An explicit schema skips the inference pass
    (which reads the data TWICE — never acceptable on a 100 TB source);
    inference stays available for exploration only.
    """
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
