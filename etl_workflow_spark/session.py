"""SparkSession factory.

The reference delegates all planning to Postgres (SURVEY.md §4); here
Catalyst is the only planner, so the session config is where the
100 TB-scale knobs live:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing)
* auto-broadcast for small dimension tables (the reference's dims —
  categories/products — map to part/nation/region here)
* Arrow for the Pandas-UDF escape hatch (text/multimodal operators)
* shuffle partitions sized for the local harness; on a real cluster
  AQE's coalescing makes the initial number far less critical.
"""

from __future__ import annotations

import os

# Pin BLAS to one thread BEFORE numpy first loads (OpenBLAS reads the
# env at library init). Two reasons, both measured (r14): the driver's
# quantizer fits do many small/skinny dgemms where OpenBLAS's threaded
# path costs ~9x the single-threaded one (thread-pool sync dominates a
# 2000x8 @ 8x256 multiply); and every core already runs a parallel
# Python worker under local[n] — per-worker BLAS threads oversubscribe
# the box at scale exactly the same way. setdefault: a deployment that
# wants threaded BLAS can still set the env itself.
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-workflow-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster the caller passes the real master / lets spark-submit set it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- planner ----------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # -- python interop ---------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # one BLAS thread per Python worker on real executors too (the
        # local-mode workers inherit the driver env set above)
        .config(
            "spark.executorEnv.OPENBLAS_NUM_THREADS",
            os.environ["OPENBLAS_NUM_THREADS"],
        )
        # -- scan sizing: 128 MiB splits are the right grain for a
        #    1000-executor cluster reading 100 TB of parquet ------------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # zstd for every parquet sink: ~20-30% smaller than snappy at
        # comparable CPU — at 100 TB that is tens of TB of storage and
        # shuffle-read bandwidth; readers are codec-transparent.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # -- local-harness hygiene --------------------------------------
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # ANSI off: the reference tolerates bad rows (pandas coercion);
        # try_* functions are still used where division can hit zero.
        .config("spark.sql.ansi.enabled", "false")
        # Stable timezone for timestamp <-> date conversions so results
        # match the DuckDB oracle regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert (catalog.events_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate duplicates the generator's input
        # expression into a pre-explode Filter (size(expr)>0 AND
        # isnotnull(expr)); whole-stage codegen does NOT eliminate the
        # copy across the Filter/Project boundary, so every explode of
        # a COMPUTED array (tokenize/shingle/n-gram — this engine's
        # bread and butter) evaluated its split/zip/hash chain twice
        # per row. Measured r15: the n-gram shingle pass dropped
        # 1.33 s → 0.78 s at sf0.1 with the rule excluded; results are
        # unchanged by construction (the rule only ADDS semantically
        # implied filters). The lost upside — pushing emptiness checks
        # toward the scan — is negligible for corpus text (rows are
        # overwhelmingly non-empty), at any scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
