"""Data-quality operators: column profiling and constraint checks.

The warehouse-hygiene layer (the Deequ/Great-Expectations capability
re-expressed Spark-first): profile what landed, assert the invariants
the pipeline promises (PK uniqueness, FK containment, non-null keys),
and emit machine-checkable violation counts instead of log lines.

Both operators are single-pass: profiling computes every column's
statistics in ONE aggregation over one scan (multiple exact
count-distincts plan as a single Expand + shuffle — the exact tier;
swap `approx_count_distinct` in at 100 TB for one pass without the
expand multiplier), then unpivots driver-side (a fixed, column-count-
bounded list, not data). Constraint checks are aggregations/anti-joins
that never materialize the violating rows unless asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

_NUMERIC = (
    Ty.ByteType, Ty.ShortType, Ty.IntegerType, Ty.LongType,
    Ty.FloatType, Ty.DoubleType, Ty.DecimalType,
)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: row count, null count, exact distinct count,
    and numeric min/max (null for non-numeric columns). One job, one
    scan; output height = number of columns (bounded metadata, safe to
    collect or join against expectations).
    """
    names = cols or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = []
    for c in names:
        is_num = isinstance(dtypes[c], _NUMERIC)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            (F.min(c).cast("double") if is_num else F.min(F.lit(None).cast("double")))
            .alias(f"{c}__min"),
            (F.max(c).cast("double") if is_num else F.max(F.lit(None).cast("double")))
            .alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack}) AS "
            "(col_name, n, n_null, n_distinct, min_num, max_num)"
        )
    )


def profile_table_oracle(table: str, cols: list[tuple[str, bool]]) -> str:
    """DuckDB twin; ``cols`` = [(name, is_numeric), ...]."""
    parts = []
    for c, is_num in cols:
        mn = f"CAST(MIN({c}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({c}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        parts.append(f"""
            SELECT '{c}' AS col_name, COUNT(*) AS n,
                   COUNT(*) FILTER (WHERE {c} IS NULL) AS n_null,
                   COUNT(DISTINCT {c}) AS n_distinct,
                   {mn} AS min_num, {mx} AS max_num
            FROM {table}""")
    return " UNION ALL ".join(parts)


def expect_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Violations = surplus rows beyond one per key (0 when unique)."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long")
        .alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def expect_subset(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str,
    name: str,
) -> DataFrame:
    """FK containment: child keys with no parent (anti-join count).
    Null child keys are not orphans (SQL FK semantics)."""
    orphans = (
        child.select(F.col(child_col).alias("_k"))
        .where(F.col("_k").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("_k")), on="_k", how="left_anti"
        )
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def expect_non_null(df: DataFrame, col: str, name: str) -> DataFrame:
    return df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).cast("long").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def run_checks(*checks: DataFrame) -> DataFrame:
    """Union the one-row check results into the violations report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
