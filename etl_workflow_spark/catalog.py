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


def _pin_session_confs(spark: SparkSession) -> None:
    """Make results session- and host-agnostic at read time.

    Callers hand us arbitrary sessions (the correctness gate builds a
    default one), so the confs results depend on are set here — both
    are runtime-settable — instead of relying on our own session
    factory:

    - ``timeZone=UTC``: date extraction from timestamp columns
      (``to_date(o_orderdate)`` etc.) must not depend on the host
      timezone, and must match the DuckDB oracle, which reads parquet
      timestamps as TZ-free values.
    - ``nanosAsLong``: the events parquet stores TIMESTAMP(NANOS),
      which Spark's vectorized reader rejects outright
      (PARQUET_TYPE_ILLEGAL) without it.
    """
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:  # pragma: no cover - static conf on odd builds
            pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single table lazily (no view registration)."""
    _pin_session_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper timestamp — session-agnostic
    (see :func:`_pin_session_confs` for the confs involved)."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    return normalize_ts(ev)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_LTZ regardless of
    how the parquet physically stored it.

    The testdata's ``events.parquet`` has appeared as two shapes
    depending on writer/reader versions:

    - ``bigint`` epoch-nanos (when ``nanosAsLong`` applies)
    - ``timestamp_ntz`` (Spark 4 reads TIMESTAMP(isAdjustedToUTC=false)
      as NTZ natively)

    Downstream operators (``unix_micros``, ``withWatermark``, window
    aggs) require TIMESTAMP_LTZ, so both shapes convert here. The
    session timezone is pinned UTC (:func:`_pin_session_confs`), so the
    NTZ→LTZ cast is a pure relabel — wall-clock values are unchanged
    and match the DuckDB oracle, which reads the same parquet TZ-free.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # integer division: epoch-nanos (~1.7e18) overflows a double's
        # 53-bit mantissa, so `/ 1000` + cast silently rounded off the
        # low microseconds; `div` truncates exactly like DuckDB's
        # nanos->micros read
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif dtype == "timestamp_ntz":
        # UTC session => relabel only; values identical to the oracle's
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_txn_table(
    spark: SparkSession,
    name: str,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Register a transactional table (``sources/txn.py``) as a temp
    view so ``spark.sql`` reaches its snapshot like any other catalog
    table. The view is PINNED to the resolved version (snapshot
    isolation extends to the SQL surface): later commits don't leak
    into running queries; re-register to move the view forward, or
    pass ``version`` for time travel.
    """
    from .sources.txn import txn_read

    df = txn_read(spark, path, version)
    df.createOrReplaceTempView(name)
    return df
