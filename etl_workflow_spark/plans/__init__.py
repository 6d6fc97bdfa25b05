"""Plan inspection helpers — make "is this the plan I'd want at
100 TB?" checkable in tests rather than a manual .explain() read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-initial) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in a PushedFilters list of the
    formatted plan (predicate reached the parquet scan)."""
    plan = formatted_plan(df)
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed_lines)
    return all(f in joined for f in fragments)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines — verify column pruning reached each scan."""
    plan = formatted_plan(df)
    return [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (lower = less
    data movement; broadcast exchanges are not counted)."""
    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def count_broadcasts(df: DataFrame) -> int:
    plan = physical_plan(df)
    return sum(1 for ln in plan.splitlines() if "BroadcastExchange" in ln)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_python_evals(df: DataFrame) -> int:
    """Number of Python-UDF evaluation operators (ArrowEvalPython /
    BatchEvalPython) in the physical plan. A UDF column referenced by
    both a Filter and a Project (e.g. the size()>0 pre-filter Catalyst
    infers for a plain explode) is planned as TWO eval nodes — the UDF
    runs twice per row. Operators whose UDF is the dominant cost
    assert this stays at the intended count."""
    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if "ArrowEvalPython" in ln or "BatchEvalPython" in ln
    )
