"""Input-parallelism guard for CPU-heavy per-row operators.

Parquet scan parallelism is file-split-driven: a corpus that arrives
as one (or few) small files pins every pre-shuffle stage — tokenize,
shingle, hash, explode — to that many tasks, no matter how many cores
the cluster has. The operators that do heavy per-row work route their
input through :func:`scale_partitions` first.

The repartition is GATED on the observed partition count, so it is a
local/small-input fix that costs nothing at scale: a 100 TB corpus
already arrives in tens of thousands of splits and passes through
untouched — no extra shuffle is ever added to the big-data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scale_partitions(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism iff it currently has fewer partitions than that.

    ``min_factor`` scales the target (e.g. 0.5 = settle for half the
    cores) for callers whose per-row work is lighter.
    """
    spark = df.sparkSession
    target = max(1, int(spark.sparkContext.defaultParallelism * min_factor))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
