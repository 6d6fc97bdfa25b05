"""Skew-aware join/aggregation helpers.

The reference's data is skewed by construction — Pareto-distributed
orders per customer (``data-generator.py:156-171``) — and at 100 TB a
hot key turns one reducer into the job's critical path. AQE's skew-join
splitting (enabled in session.py) handles most cases at runtime; these
helpers cover the two patterns AQE can't:

  salted_aggregate   two-level aggregation for hot grouping keys
                     (partial agg on (key, salt), then final on key)
  salted_join        explode the small side × salt so a hot fact key
                     spreads over N reducers

Both are algebraic rewrites of the declarative plan — correctness is
independent of the salt factor (tested), so the factor is purely a
performance knob.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: decomposable aggregate -> (partial fn over raw rows, combine fn over partials)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts combine by summing partials
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Hot-key-safe groupBy: aggregate on (keys..., salt) first so every
    partial fits a reducer, then combine partials on the true keys.

    ``aggs`` maps output column name -> ``(fn, input_col)`` where fn is
    one of sum/count/min/max — the decomposable aggregates, exactly the
    ones the reference uses outside COUNT DISTINCT (SURVEY §2 D).
    """
    unknown = [fn for fn, _ in aggs.values() if fn not in _DECOMPOSABLE]
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {unknown}")
    salted = df.withColumn(
        "_salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the fact side gets a random salt, the
    dim side is exploded across all salt values, and the join key
    becomes (key, salt) — a hot key's rows land on ``salt_buckets``
    reducers instead of one.

    Use when the dim is too big to broadcast AND the fact has hot keys;
    otherwise prefer plain ``join`` (broadcast or AQE skew handling).

    Only ``inner`` and ``left`` are sound: the dim side is exploded
    across all ``salt_buckets``, so right/full outer joins would emit
    each unmatched dim row once per salt bucket (silent duplication).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got how={how!r}: the "
            "exploded dim side would duplicate unmatched rows "
            f"{salt_buckets}x under right/full outer semantics"
        )
    f = fact.withColumn("_salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, on=[key, "_salt"], how=how).drop("_salt")
