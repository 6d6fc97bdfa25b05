"""Sinks — the reference's load stage re-expressed for immutable storage.

The reference's write modes (SURVEY.md §2 A4-A7, J1-J4):

  ON CONFLICT DO NOTHING   -> idempotent_append (left-anti vs existing keys)
  TRUNCATE + INSERT        -> overwrite
  DELETE today + INSERT    -> partition overwrite (replaceWhere-style)
  UPDATE ... SET           -> conditional-projection rewrite
  updated_at triggers      -> stamp_updated_at in the write path

Postgres "first writer wins" becomes "existing wins" — documented
divergence (SURVEY §7.4 risk 3): an idempotent re-run never changes
rows already present.

Scale notes: facts are written partitioned by a date column so date
predicates prune partitions (the analog of the reference's yearly
RANGE partitions, database-schema.sql:91-116); dynamic partition
overwrite touches only the partitions present in the incoming batch —
the 100 TB-safe version of DELETE+INSERT for CURRENT_DATE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stamp_updated_at(df: DataFrame) -> DataFrame:
    """J3: the BEFORE UPDATE trigger (database-schema.sql:234-257)
    becomes a write-path column."""
    return df.withColumn("updated_at", F.current_timestamp())


def overwrite(df: DataFrame, path: str) -> None:
    """A5: TRUNCATE-and-reload (workflow.py:86-96) — also the
    materialized-view refresh path (A7): recompute + overwrite."""
    df.write.mode("overwrite").parquet(path)


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Existence via the Hadoop FS for the path's scheme — correct on
    HDFS/S3/local alike, where ``os.path.exists`` only sees the local
    filesystem and silently reports a remote table as missing."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    evolve_schema: bool = False,
) -> int:
    """A4/J4: INSERT ... ON CONFLICT DO NOTHING (workflow.py:188-205).

    New rows are deduped on the conflict keys (min-first deterministic
    winner via dropDuplicates after an orderBy-free plan: duplicates
    within the batch keep an arbitrary-but-single row, matching
    Postgres's "first in batch wins" as closely as a parallel engine
    can), then anti-joined against the existing table so re-runs are
    no-ops. Returns the number of rows actually appended.

    Scale shape: when the (deduped) batch is small — the steady-state
    ingest case — its keys broadcast and pre-filter the existing side
    with a shuffle-free semi-join, so the anti-join's build side is
    bounded by the batch and the existing table is only ever SCANNED
    (key columns, pruned), never shuffled. A bulk backfill above the
    gate falls back to the plain key-column anti-join (one shuffle on
    the keys), never an OOM-prone broadcast of a huge batch.

    Unified mutation surface: a transactional target (``sources.txn``)
    commits through ``txn_append`` — snapshot-isolated, atomic,
    replay-idempotent by the same key anti-join — like
    :func:`merge_into` and :func:`update_rows`.
    """
    from .txn import latest_version, txn_append

    if latest_version(spark, path) is not None:
        # txn_append rejects unknown source columns loudly (a typo'd
        # column must not vanish from committed rows); pass
        # evolve_schema=True to widen the table instead
        return txn_append(
            spark, path, df, keys=list(keys), evolve_schema=evolve_schema
        )
    if evolve_schema:
        # a plain parquet dir can't evolve safely: appending files with
        # a different schema makes later schema inference footer-order
        # dependent — honor the flag only where a manifest records the
        # schema, fail loudly everywhere else
        raise ValueError(
            "evolve_schema requires a transactional table "
            "(create it with txn_create)"
        )

    deduped = df.dropDuplicates(list(keys)).persist()
    out = deduped
    try:
        n_batch = deduped.count()
        if _hadoop_exists(spark, path):
            existing = spark.read.parquet(path).select(*keys)
            if n_batch <= 1_000_000:
                hot = existing.join(
                    F.broadcast(deduped.select(*keys)),
                    on=list(keys),
                    how="left_semi",
                )
                out = deduped.join(
                    F.broadcast(hot), on=list(keys), how="left_anti"
                )
            else:
                out = deduped.join(existing, on=list(keys), how="left_anti")
            # the anti-join output is consumed by count() and write()
            out = out.persist()
        appended = out.count()
        if appended:
            out.write.mode("append").parquet(path)
    finally:
        if out is not deduped:
            out.unpersist()
        deduped.unpersist()
    return appended


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "date",
    mode: str = "overwrite",
) -> None:
    """Partitioned fact write — the analog of the reference's yearly
    RANGE partitions on orders.order_date. Date filters then prune at
    the directory level (plus parquet min/max skipping inside files).
    """
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def overwrite_partitions(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str = "date"
) -> None:
    """J2: the idempotent incremental slice — DELETE WHERE date=X then
    INSERT (database-schema.sql:202-231) becomes dynamic partition
    overwrite: only partitions present in ``df`` are replaced.

    The frame is hash-repartitioned by the partition column first: one
    writer task covers many partition values instead of the planner
    fanning out one task per value (2,399 date dirs took 2,399 tiny
    tasks = ~35s of the e2e gate at sf0.01), and at scale it is the
    standard small-files guard — each partition dir gets one file, not
    one per upstream task.
    """
    (
        df.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def update_rows(
    spark: SparkSession,
    path: str,
    key_col: str,
    key_value,
    updates: dict[str, object],
) -> int:
    """J1: UPDATE ... WHERE key = value (app.py:201-207) without a
    mutable store, stamping updated_at on touched rows. Returns rows
    matched.

    THE unified mutation entry point together with :func:`merge_into`:
    when ``path`` is a transactional table (``sources.txn``, detected
    by its ``_txnlog``), the update commits through the manifest log —
    snapshot-isolated readers, ``ConcurrentWriteError`` on a racing
    commit — so a txn table can never be mutated non-atomically by
    accident. Plain parquet paths fall back to the staged rename-swap
    below, whose single-writer/no-concurrent-reader contract
    (SCALE.md §9b) then applies; create concurrent-reader tables with
    ``txn_create``.
    """
    if not updates:
        raise ValueError("At least one field must be provided")

    from .txn import latest_version, txn_read, txn_replace_where

    if latest_version(spark, path) is not None:
        target = txn_read(spark, path)
        is_target = F.col(key_col) == F.lit(key_value)
        touched = target.filter(is_target)
        matched = touched.count()
        if matched == 0:
            return 0
        # literals stay UNCAST: the txn layer's commit-time enforcement
        # widens safe literals (int into bigint) implicitly and raises
        # on lossy drift (string/3.7 into a numeric column) — a blind
        # pre-cast here would non-ANSI-launder bad values into NULL or
        # truncation, the exact poison the enforcement exists to stop
        for col_name, value in updates.items():
            touched = touched.withColumn(col_name, F.lit(value))
        evolve = "updated_at" not in target.columns
        touched = touched.withColumn("updated_at", F.current_timestamp())
        # replace_where, NOT merge: a merge is keyed (dropDuplicates on
        # key_col), so N matching rows under a non-unique key would
        # collapse to one while `matched` still reported N — replace
        # swaps the exact row set and preserves multiplicity, same as
        # the parquet branch below
        txn_replace_where(
            spark, path, is_target, touched, evolve_schema=evolve
        )
        return matched

    df = spark.read.parquet(path)
    is_target = F.col(key_col) == F.lit(key_value)
    matched = df.filter(is_target).count()
    if matched == 0:
        return 0
    for col_name, value in updates.items():
        df = df.withColumn(
            col_name, F.when(is_target, F.lit(value)).otherwise(F.col(col_name))
        )
    if "updated_at" in df.columns:
        df = df.withColumn(
            "updated_at",
            F.when(is_target, F.current_timestamp()).otherwise(F.col("updated_at")),
        )
    else:
        df = df.withColumn(
            "updated_at", F.when(is_target, F.current_timestamp())
        )
    _swap_staged(spark, path, df)
    return matched


def _swap_staged(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_by: list[str] | None = None,
) -> None:
    """Materialize ``df`` beside ``path`` and swap it in via renames.

    Parquet can't overwrite a path while reading it — stage once, then
    swap directories with filesystem renames (metadata-only on
    HDFS/local). Swap via rename so a crash mid-sequence never leaves
    the live path empty: live -> ._old, staged -> live, then drop
    ._old; every step before the old-dir delete is recoverable (either
    the live path or ._old still holds the previous data, ._staged
    holds the new). Assumes NO concurrent readers (see update_rows).
    ``partition_by`` keeps the staged copy's directory layout identical
    to a partitioned live table (a later dynamic-partition writer
    expects it).
    """
    tmp = path.rstrip("/") + "._staged"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    htmp = jvm.org.apache.hadoop.fs.Path(tmp)
    hold = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "._old")
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hold) and not fs.delete(hold, True):
        raise IOError(f"could not clear stale {hold}")
    if not fs.rename(hpath, hold):
        raise IOError(f"rename {path} -> {hold} failed")
    if not fs.rename(htmp, hpath):
        # roll back so the table stays readable at its original path
        if not fs.rename(hold, hpath):
            raise IOError(
                f"rename {tmp} -> {path} failed AND rollback failed: the "
                f"live path is missing; previous data is recoverable at "
                f"{hold}, new data at {tmp}"
            )
        raise IOError(f"rename {tmp} -> {path} failed (rolled back)")
    if not fs.delete(hold, True):
        # the swap itself committed — the table at `path` already holds
        # the new data, so report success and leave the stale ._old for
        # the next run's pre-swap cleanup instead of masking the commit
        # behind an exception (a caller retry would be wrong here)
        import warnings

        warnings.warn(
            f"cleanup of {hold} failed after a successful swap; "
            f"stale dir will be cleared on the next update",
            RuntimeWarning,
            stacklevel=2,
        )


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: Sequence[str],
    partition_col: str | None = None,
) -> tuple[int, int]:
    """Parquet-native MERGE INTO: WHEN MATCHED THEN UPDATE (the source
    row wins), WHEN NOT MATCHED THEN INSERT.

    The vanilla-parquet analog of a Delta/Iceberg MERGE — the upsert
    upgrade of the reference's ON CONFLICT DO NOTHING
    (``database-schema.sql`` conflict clauses; ``idempotent_append``
    keeps the do-nothing semantics). Table formats remain the right
    answer for concurrent writers; this path needs none of their
    runtime dependencies.

    For a ``partition_col``-partitioned target only AFFECTED partitions
    are rewritten: those holding currently-matched target rows (the
    key's old location) plus the source rows' partitions (its new
    location — an update may move a row across partitions). A narrow
    key+partition scan finds them (partition pruning + min/max
    skipping); untouched partitions are never read or written. The
    merged slice is localCheckpoint-ed before the dynamic overwrite so
    the write never reads the files it replaces. Unpartitioned targets
    stage the full merge and swap atomically.

    ``source`` must contain every target column; duplicate source keys
    are collapsed (single arbitrary winner) before merging. Returns
    ``(updated, inserted)``.

    Like :func:`update_rows`, this is the unified entry point: a
    transactional target (``sources.txn``) routes through the
    manifest-log commit (atomic, snapshot-isolated, safe under
    concurrent readers); only plain parquet paths take the staged-swap
    below with its single-writer contract.
    """
    keys = list(keys)

    from .txn import latest_version, txn_merge_into

    if latest_version(spark, path) is not None:
        return txn_merge_into(spark, path, source.dropDuplicates(keys), keys)

    # existence via the Hadoop FS for the path's scheme, NOT
    # os.path.exists: on HDFS/S3 a local-FS check always says "missing"
    # and the create branch would overwrite the table with only the
    # source rows, silently dropping every unmatched target row
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        src = source.dropDuplicates(keys).persist()
        inserted = src.count()
        writer = src.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(path)
        src.unpersist()
        return (0, inserted)

    target = spark.read.parquet(path)
    src = source.dropDuplicates(keys).select(*target.columns).persist()
    n_src = src.count()

    if partition_col is None:
        kept = target.join(src.select(*keys), on=keys, how="left_anti")
        updated = target.count() - kept.count()
        _swap_staged(spark, path, kept.unionByName(src))
        src.unpersist()
        return (updated, n_src - updated)

    affected = [
        r[0]
        for r in (
            target.join(src.select(*keys), on=keys, how="left_semi")
            .select(partition_col)
            .union(src.select(partition_col))
            .distinct()
            .collect()
        )
    ]
    sub = target.where(F.col(partition_col).isin(affected))
    kept = sub.join(src.select(*keys), on=keys, how="left_anti")
    n_sub = sub.count()
    merged = kept.unionByName(src).localCheckpoint(eager=True)
    updated = n_sub - (merged.count() - n_src)
    (
        merged.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    # Dynamic overwrite only replaces partitions PRESENT in the output:
    # a partition emptied by a cross-partition key move has no output
    # rows, so its stale files would silently survive — clear those
    # directories explicitly. Directories are matched by LISTING the
    # table and unescaping each dir name with Spark's own
    # unescapePathName, not by formatting f"{col}={str(p)}": Spark
    # escapes special characters (space, %, =, ...) in partition dir
    # names, so raw str() formatting would miss those dirs and stale
    # files would reappear as duplicate keys on read.
    present = {r[0] for r in merged.select(partition_col).distinct().collect()}
    emptied_strs = {
        "__HIVE_DEFAULT_PARTITION__" if p is None else str(p)
        for p in affected
        if p not in present
    }
    if emptied_strs:
        prefix = partition_col + "="
        try:
            unescape = (
                jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName
            )
        except Exception:  # pragma: no cover - shaded/renamed utils
            unescape = lambda s: s  # noqa: E731 - unescaped fallback
        for status in fs.listStatus(hpath):
            name = status.getPath().getName()
            if not name.startswith(prefix):
                continue
            if unescape(name[len(prefix):]) in emptied_strs:
                fs.delete(status.getPath(), True)
    src.unpersist()
    return (updated, n_src - updated)


def update_rows_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    key_col: str,
    key_value,
    updates: dict[str, object],
) -> int:
    """J1 at scale: key-based UPDATE over a date/range-partitioned
    parquet table, rewriting ONLY the partitions that contain the key.

    ``update_rows`` rewrites the whole table (fine for dims, ruinous
    for a 100 TB fact). This is the parquet-native analog of a
    Delta/Iceberg MERGE: (1) a narrow scan of (key, partition) finds
    the affected partitions — partition pruning + parquet min/max
    skipping make this cheap; (2) only those partitions are re-projected
    and dynamically overwritten. Untouched partitions are never read or
    written. Returns rows matched.
    """
    if not updates:
        raise ValueError("At least one field must be provided")
    df = spark.read.parquet(path)
    is_target = F.col(key_col) == F.lit(key_value)
    affected = [
        r[0]
        for r in df.filter(is_target).select(partition_col).distinct().collect()
    ]
    if not affected:
        return 0
    part = df.filter(F.col(partition_col).isin(affected))
    matched = part.filter(is_target).count()
    for col_name, value in updates.items():
        part = part.withColumn(
            col_name, F.when(is_target, F.lit(value)).otherwise(F.col(col_name))
        )
    if "updated_at" in part.columns:
        part = part.withColumn(
            "updated_at",
            F.when(is_target, F.current_timestamp()).otherwise(F.col("updated_at")),
        )
    # detach from the source files before overwriting them (micro-batch
    # sized: one partition's rows, not the table)
    part = part.localCheckpoint(eager=True)
    (
        part.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return matched


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
    **options: str,
) -> None:
    """A8: CSV export sink (ref ``data-generator.py:307-311,326-330``
    writes each generated table to a headered CSV).

    Distributed by default — one CSV part per partition, the only shape
    that scales (a 100 TB export must not funnel through one task).
    ``single_file=True`` coalesces to a single part for small,
    human-consumed exports, the closest analog of the reference's
    one-file-per-table layout.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(header=str(header).lower(), **options).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | Sequence[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    Bucketing is the 100 TB join strategy the reference's B-tree FK
    indexes (database-schema.sql:119-121,136-137) map to: two tables
    bucketed on the same key with the same bucket count join with ZERO
    shuffle — each task reads matching bucket files from both sides —
    and bucket-local sorting removes the sort step of the merge join.
    Re-aggregations on the bucket key also skip their exchange.
    Composite keys (e.g. the LSH index's ``(band, bucket)``) bucket on
    the tuple; joins on exactly those keys read the table in place.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table_name)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
    **options: str,
) -> None:
    """JSON-lines export sink — the interchange format of LLM-corpus
    tooling. Same fan-out contract as :func:`write_csv`: one part per
    partition unless ``single_file`` coalesces a small export."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(**options).json(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping layout: range-partition by ``sort_cols`` then sort
    within each output file, so parquet row-group min/max stats become
    DISJOINT ranges and point/range predicates skip whole files.

    This is the vanilla-parquet analog of the reference's B-tree
    indexes (database-schema.sql:62-63,86-88) and of Delta's
    OPTIMIZE ZORDER for the single-dimension case: a filter on the
    leading sort column reads O(matching files), not the table.
    ``repartitionByRange`` samples the data to build balanced ranges —
    one extra exchange at write time buys every later scan's skipping.
    """
    cols = [F.col(c) for c in sort_cols]
    out = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    bits_per_col: int = 6,
    quantile_error: float = 0.01,
) -> None:
    """Multi-column data-skipping layout (Delta ``OPTIMIZE ZORDER``
    analog): rows sort by the bit-interleaving of each column's
    quantile-bucket rank, so parquet min/max stats stay narrow on
    EVERY z-column at once — a linear sort (:func:`write_sorted`)
    skips only on its leading column.

    Bucketing is rank-based (``approxQuantile`` split points, a
    driver-side array of ``2^bits_per_col - 1`` doubles per column),
    not equal-width, so skewed value distributions still spread across
    buckets. Bucket assignment compiles to a chain of
    ``(col >= boundary)::int`` adds and the interleave to
    shiftleft/or — all whole-stage codegen, no UDFs; the only
    data-moving step is the same single range exchange
    ``write_sorted`` pays. 2×6 bits = 4096 z-cells, plenty of
    resolution for any realistic file count per partition.

    Numeric z-columns only (rank of a string would need a global sort);
    date/timestamp callers pass ``unix_date``/``unix_timestamp``
    projections.
    """
    staged = zorder_staged(df, zorder_cols, bits_per_col, quantile_error)
    out = (
        staged.repartitionByRange(num_files, "_zval")
        if num_files
        else staged.repartitionByRange("_zval")
    )
    out.sortWithinPartitions("_zval").drop("_zval").write.mode(mode).parquet(path)


def zorder_staged(
    df: DataFrame,
    zorder_cols: Sequence[str],
    bits_per_col: int = 6,
    quantile_error: float = 0.01,
) -> DataFrame:
    """``df`` plus a ``_zval`` column — the bit-interleaved z-value of
    the quantile-bucket ranks of ``zorder_cols`` (the arrangement key
    behind :func:`write_zordered`, exposed so transactional compaction
    can sort by it before its own manifest-committed write)."""
    if not (1 <= bits_per_col * len(zorder_cols) <= 62):
        raise ValueError("bits_per_col × columns must fit a long")
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    staged = df.select(
        "*", *[F.col(c).cast("double").alias(f"_z_{c}") for c in zorder_cols]
    )
    # one pass computes every column's split points (approxQuantile
    # takes a column list), not one scan per z-column
    all_splits = staged.stat.approxQuantile(
        [f"_z_{c}" for c in zorder_cols], probs, quantile_error
    )
    bucket_cols = []
    for c, splits in zip(zorder_cols, all_splits):
        # strictly increasing boundaries (ties collapse buckets, fine)
        uniq = sorted(set(splits))
        b = F.lit(0)
        for s in uniq:
            b = b + (F.col(f"_z_{c}") >= F.lit(s)).cast("int")
        bucket_cols.append(b.alias(f"_zb_{c}"))
    staged = staged.select("*", *bucket_cols)
    # interleave: bit i of column j lands at position i*ncols + j,
    # so equal prefixes of the z-value bound ALL columns' buckets
    ncols = len(zorder_cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(zorder_cols):
        for i in range(bits_per_col):
            bit = F.shiftright(F.col(f"_zb_{c}"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), i * ncols + j)
            )
    return staged.withColumn("_zval", z).drop(
        *[f"_z_{c}" for c in zorder_cols], *[f"_zb_{c}" for c in zorder_cols]
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_files: int = 1,
) -> int:
    """Small-files compaction: rewrite a parquet table so each
    partition holds ``target_files`` files (default 1).

    Streaming sinks and per-task writers accrete many small files;
    at scale the NameNode/listing and per-file open costs dominate
    scans long before data size does. Partitioned tables rewrite via
    dynamic partition overwrite (history untouched beyond present
    partitions); unpartitioned tables stage + rename-swap. Same
    single-writer contract as the other mutators (SCALE.md 9b).
    Returns the number of files after compaction.
    """
    df = spark.read.parquet(path)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if partition_col:
        (
            df.repartition(target_files, F.col(partition_col))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        _swap_staged(spark, path, df.coalesce(target_files))
    n = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
    return n
