"""Table catalog over the parquet testdata.

The reference registers its tables in Postgres DDL
(``database-schema.sql:17-149``); here the catalog is a thin loader
that reads each parquet table once and registers it as a temp view so
both the DataFrame API and ``spark.sql`` can reach it.

Scans stay lazy — Catalyst prunes columns and pushes predicates into
the parquet reader, so "loading" all tables costs nothing until an
action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Every table the driver materializes (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        # events needs the nanos-read conf + ts conversion — route it
        # through its session-agnostic loader so a default session works
        df = events_table(spark, sf_dir) if name == "events" else spark.read.parquet(path)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single table lazily (no view registration)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper timestamp — session-agnostic.

    The parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL) unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set. Callers hand us
    arbitrary sessions (the correctness gate builds a default one), so
    set the conf at read time — it is runtime-settable — instead of
    relying on our own session factory. The session timezone is pinned
    to UTC for the same reason: epoch-derived timestamps must collect
    identically everywhere (and match the DuckDB oracle, which reads
    the nanos column as a TZ-free timestamp).
    """
    from pyspark.sql import functions as F

    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:  # pragma: no cover - static conf on odd builds
            pass

    ev = table(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":
        # integer division: epoch-nanos (~1.7e18) overflows a double's
        # 53-bit mantissa, so `/ 1000` + cast silently rounded off the
        # low microseconds; `div` truncates exactly like DuckDB's
        # nanos->micros read
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return ev
