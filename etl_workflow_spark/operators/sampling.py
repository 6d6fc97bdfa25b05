"""Deterministic sampling for training-data pipelines.

``DataFrame.sample`` is seed-reproducible only for a fixed partitioning
— repartition the input (or rerun after a cluster resize) and the kept
set changes. Training pipelines need CONTENT-stable subsetting: the
same document is in or out of the sample regardless of layout, run, or
engine, so ablations and resumed runs see the same corpus. These
operators key the decision on a cryptographic hash of the row's id:

  deterministic_sample   keep iff sha256(salt‖key) lands below the rate
  stratified_sample      per-group rates (e.g. downsample common langs)
  split_frame            disjoint train/valid/test by hash range

All are shuffle-free filters over codegen expressions (sha2 is
JVM-side); the hash prefix comparison is done on lowercase hex strings,
which orders identically to the numeric value, so a SQL oracle can
replay the exact row set (no engine-specific RNG anywhere).

Capability analog in the reference: ``data-generator.py`` seeds numpy
(lines 12-14) so generated fixtures are reproducible — the same
property, applied to subsetting instead of generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the digest: rate resolution 2^-32, plenty.
_HEX_SPAN = 16**8


def _bucket(key: str, salt: str) -> Column:
    return F.substring(
        F.sha2(F.concat(F.lit(salt), F.col(key).cast("string")), 256), 1, 8
    )


def _thr(rate: float) -> str:
    return format(min(max(int(rate * _HEX_SPAN), 0), _HEX_SPAN - 1), "08x")


def deterministic_sample(
    df: DataFrame, rate: float, key: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Content-stable Bernoulli sample at ``rate``.

    A row is kept iff the first 32 bits of sha256(salt‖key) fall below
    rate·2^32 — independent of partitioning, run, cluster size, and
    engine. Different ``salt`` values draw independent samples.
    """
    return df.where(_bucket(key, salt) < F.lit(_thr(rate)))


def deterministic_sample_oracle(
    rate: float, table: str = "documents", key: str = "doc_id",
    salt: str = "sample",
) -> str:
    return f"""
        SELECT * FROM {table}
        WHERE substr(sha256('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
              < '{_thr(rate)}'
    """


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    rebalancing step of corpus construction (e.g. keep 10% of English,
    100% of low-resource languages). Same hash decision as
    :func:`deterministic_sample`, with the threshold chosen per group.
    """
    thr: Column = F.lit(_thr(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_thr(rate))).otherwise(thr)
    return df.where(_bucket(key, salt) < thr)


def stratified_sample_oracle(
    rates: dict[str, float],
    strata_col: str,
    table: str = "documents",
    key: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN '{_thr(r)}'"
        for v, r in sorted(rates.items())
    )
    return f"""
        SELECT * FROM {table}
        WHERE substr(sha256('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
              < (CASE {cases} ELSE '{_thr(default_rate)}' END)
    """


def split_frame(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    salt: str = "split",
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive train/valid/test split by hash range.

    Ranges partition [0, 2^32): every row lands in exactly one split,
    stable under any layout — the property randomSplit lacks (its
    result depends on partitioning). Weights are normalized.
    """
    total = sum(weights.values())
    out: dict[str, DataFrame] = {}
    lo = 0.0
    b = _bucket(key, salt)
    names = list(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name] / total
        upper = F.lit("ffffffff") if i == len(names) - 1 else F.lit(_thr(hi))
        cond = (b >= F.lit(_thr(lo))) & (b < upper) if i < len(names) - 1 else (
            b >= F.lit(_thr(lo))
        )
        out[name] = df.where(cond)
        lo = hi
    return out
