"""Transactional parquet tables via a version-manifest log.

The reference gets snapshot isolation for free from Postgres
transactions (``database-schema.sql:202-231``, ``app.py:201-216``).
Vanilla parquet has none: the rename-swap mutation path in
``writers.py`` is correct for a single writer but a concurrent reader
can list a half-swapped table (documented in SCALE.md §9b). This
module closes that gap with the standard manifest-log pattern
(the public Delta/Iceberg core idea, minus their runtimes):

  path/
    _txnlog/00000000000000000001.json   one manifest per version
    _data/<uuid>/                       immutable data dirs

A manifest is the COMPLETE table state at that version: a list of
``{"dir": <uuid>, "partitions": [values] | null}`` entries. Commits
write data to a fresh ``_data/<uuid>/`` dir, stage the next manifest
to a temp name, and publish it with a single atomic rename to
``_txnlog/<version+1>.json``. Hadoop rename-to-existing fails, so two
concurrent committers race on the same version and exactly one wins —
optimistic concurrency, surfaced as :class:`ConcurrentWriteError`.

Readers resolve the latest manifest ONCE and then read only the
immutable dirs it lists: a reader started at version N is never
affected by a commit of N+1 (snapshot isolation), and old versions
stay time-travel-readable until :func:`txn_vacuum` drops them.

Scale notes: a partitioned commit replaces only the partition VALUES
it carries — untouched partitions keep their existing entry, so a
merge writes O(affected) data and the manifest grows by one entry,
not one per partition. Reads apply partition pruning inside each
entry dir (hive layout + an ``isin`` filter on the partition column).
The manifest itself is a few KB of JSON per version — driver-side by
design, like Delta's log replay.
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_txnlog"
_DATA_DIR = "_data"
_NULL_PARTITION = "__NULL__"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this transaction targeted."""


# ------------------------------------------------------------ fs plumbing


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs


def _hpath(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(p.rstrip("/") for p in parts))


def _read_file(jvm, fs, hpath) -> str:
    # commons-io ships on Spark's classpath; py4j passes arrays by
    # value, so a Java read(byte[]) could never fill a Python buffer
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _write_file(fs, hpath, content: str) -> None:
    stream = fs.create(hpath, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


# ------------------------------------------------------------ manifest log


def _version_name(v: int) -> str:
    return f"{v:020d}.json"


def _list_numbered(fs, hdir) -> list[int]:
    """Sorted integer names of the ``<int>.json`` marker files in a
    directory (dot-prefixed temp files skipped) — the shared listing
    rule of the manifest log and the feed cursor."""
    if not fs.exists(hdir):
        return []
    out = []
    for status in fs.listStatus(hdir):
        name = status.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _list_versions(spark: SparkSession, path: str) -> list[int]:
    jvm, fs = _fs(spark, path)
    return _list_numbered(fs, _hpath(jvm, path, _LOG_DIR))


def latest_version(spark: SparkSession, path: str) -> int | None:
    """Highest committed version, or None for a missing/empty table."""
    versions = _list_versions(spark, path)
    return versions[-1] if versions else None


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    jvm, fs = _fs(spark, path)
    return json.loads(
        _read_file(
            jvm, fs, _hpath(jvm, path, _LOG_DIR, _version_name(version))
        )
    )


class AtomicPublish:
    """THE atomic-publish primitive behind every commit-shaped write:
    the txn log's ``_commit``, the training-set manifest replacement,
    and the ``_extend.lock`` single-writer guard all route through the
    installed instance, so a deployment makes ALL of them honest on an
    object store by overriding ONE class (e.g. with S3 conditional
    PUT / ``If-None-Match`` or GCS ``if-generation-match`` calls).
    Install with :func:`set_publish_hook`; the default implements the
    best the Hadoop filesystem API offers (see method docstrings).
    """

    def rename_no_overwrite(self, spark: SparkSession, jvm, src, dst) -> None:
        """Rename that REFUSES an existing destination, atomically
        where the filesystem can promise it.

        ``FileSystem.rename`` on the LOCAL filesystem delegates to
        POSIX rename(2), which silently OVERWRITES an existing
        destination — two racing committers could both "win" and one
        manifest would vanish. ``FileContext.rename(..., Rename.NONE)``
        implements the no-overwrite contract on local and HDFS;
        filesystems with no AbstractFileSystem binding (e.g. bare
        s3a) fall back to ``FileSystem.rename``, whose semantics
        there are the store's own — deployments on such stores
        install a conditional-put hook (:func:`set_publish_hook`),
        exactly as Delta requires a LogStore.

        Raises :class:`ConcurrentWriteError` when the destination
        exists."""
        from py4j.protocol import Py4JJavaError

        try:
            rename_enum = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                dst.toUri(), spark.sparkContext._jsc.hadoopConfiguration()
            )
            opts = spark.sparkContext._gateway.new_array(rename_enum, 1)
            opts[0] = rename_enum.NONE
            fc.rename(src, dst, opts)
            return
        except Py4JJavaError as e:
            msg = str(e)
            if "FileAlreadyExistsException" in msg:
                raise ConcurrentWriteError(
                    f"destination {dst} already exists"
                ) from None
            if "UnsupportedFileSystemException" not in msg:
                raise
        # no AbstractFileSystem for this scheme: FileSystem.rename
        # fallback (check-then-put — the hook exists to replace this)
        fs = dst.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(dst) or not fs.rename(src, dst):
            raise ConcurrentWriteError(f"destination {dst} already exists")

    def create_exclusive(self, spark: SparkSession, fs, path) -> bool:
        """Create-if-absent marker (the lock-file primitive). Exclusive
        on HDFS/local via ``createNewFile``; check-then-put on plain
        S3A — same hook, same fix."""
        return bool(fs.createNewFile(path))


_DEFAULT_PUBLISH = AtomicPublish()
_publish_hook: AtomicPublish | None = None


def set_publish_hook(hook: AtomicPublish | None) -> AtomicPublish | None:
    """Install (or, with ``None``, uninstall) a deployment-specific
    :class:`AtomicPublish`; returns the previously installed hook.
    Affects every commit-shaped write in the package."""
    global _publish_hook
    prev = _publish_hook
    _publish_hook = hook
    return prev


def _publisher() -> AtomicPublish:
    return _publish_hook or _DEFAULT_PUBLISH


def _rename_no_overwrite(spark: SparkSession, jvm, src, dst) -> None:
    _publisher().rename_no_overwrite(spark, jvm, src, dst)


def _commit(spark: SparkSession, path: str, version: int, manifest: dict) -> None:
    """Publish ``manifest`` as ``version`` with one no-overwrite rename
    (see :func:`_rename_no_overwrite`), so concurrent committers
    targeting the same version serialize: the loser raises
    ConcurrentWriteError and must re-read the new latest version and
    retry its transaction.
    """
    jvm, fs = _fs(spark, path)
    log = _hpath(jvm, path, _LOG_DIR)
    fs.mkdirs(log)
    final = _hpath(jvm, path, _LOG_DIR, _version_name(version))
    if fs.exists(final):
        raise ConcurrentWriteError(
            f"version {version} of {path} already committed"
        )
    tmp = _hpath(jvm, path, _LOG_DIR, f".tmp-{uuid.uuid4().hex}.json")
    _write_file(fs, tmp, json.dumps(manifest, sort_keys=True))
    try:
        _rename_no_overwrite(spark, jvm, tmp, final)
    except ConcurrentWriteError:
        fs.delete(tmp, False)
        raise ConcurrentWriteError(
            f"lost the commit race for version {version} of {path}"
        ) from None


def _partition_cond(pcol: str, values: list[str]):
    """The read/affected filter for a recorded partition-value list:
    Spark ``cast('string')`` equality plus the NULL sentinel — the ONE
    encoding used everywhere (write-side recording, read filters,
    conflict pruning). Mixing this with Python ``str()`` was a silent
    row-loss bug class: str(True) is 'True' but Spark casts to 'true',
    and fractional timestamps stringify differently."""
    vals = [p for p in values if p != _NULL_PARTITION]
    cond = F.col(pcol).cast("string").isin(vals)
    if _NULL_PARTITION in values:
        cond = cond | F.col(pcol).isNull()
    return cond


def _write_data(
    df: DataFrame, path: str, partition_col: str | None,
    arranged: bool = False,
    stats_cols: Sequence[str] | None = None,
    types: dict | None = None,
) -> tuple[str, list[str] | None, dict | None]:
    """Write an immutable data dir; return (dir name, partition
    values, stats).

    ``stats_cols`` (r15, guide §1.2): per-column [min, max] key stats
    are collected DURING the write via ``DataFrame.observe`` — the
    observed rows ARE the written rows (stronger than the old
    read-back against non-deterministic lineage), min/max/isnull are
    idempotent under task retries, and the commit saves one full
    column-pruned re-scan of the freshly written dir (at 100 TB, a
    re-read of every byte just written). The returned ``stats`` dict
    mirrors :func:`_dir_stats` exactly (same usable-type filter, same
    ``_stats_value`` rendering, entries only when both bounds are
    non-NULL). Returned as ``None`` — caller must fall back to
    :func:`_dir_stats` — when the partition column is itself a stats
    column: its WRITTEN form maps ``''`` to the hive default
    partition (read back as NULL), so observed pre-write values could
    record a bound readers never see.

    Partitioned data is repartitioned by the partition column first so
    each partition dir gets one file instead of one per upstream task
    (the small-files guard, same as overwrite_partitions) — unless
    ``arranged`` says the caller already laid out the frame (sorted /
    z-ordered compaction), in which case repartitioning again would
    destroy the clustering the caller just paid for.

    The recorded partition values are derived from the WRITTEN LAYOUT
    (never from ``df``'s possibly non-deterministic lineage, which
    could evaluate differently twice; the files are the single source
    of truth the manifest describes). For a string-typed partition
    column the hive directory NAMES are that layout — one filesystem
    listing, zero extra Spark jobs (r14: the read-back scan +
    distinct/collect cost one full job per partitioned commit). Spark
    writes each value with ``escapePathName`` (every escape is a
    ``%XX`` ASCII sequence, so ``unquote`` is its exact inverse) and
    writes NULL **and empty-string** values as the hive default
    partition — identical to what the old read-back recorded, since
    parquet partition parsing maps both to NULL. Non-string partition
    columns keep the read-back-and-cast path: their dir-name
    rendering (timestamps, decimals) need not match
    ``cast('string')``.
    """
    d = uuid.uuid4().hex
    target = f"{path.rstrip('/')}/{_DATA_DIR}/{d}"

    obs = None
    obs_cols: list[str] = []
    stats: dict | None = None
    if stats_cols:
        if partition_col is not None and partition_col in stats_cols:
            stats = None  # caller falls back to _dir_stats
        else:
            dtypes = dict(types or {}) or dict(df.dtypes)
            obs_cols = [
                c for c in stats_cols
                if str(dtypes.get(c, "")).startswith(_STATS_PREFIXES)
                and not str(dtypes.get(c, "")).startswith("interval")
            ]
            if obs_cols:
                from pyspark.sql import Observation

                obs = Observation()
                df = df.observe(
                    obs,
                    *[
                        a
                        for i, c in enumerate(obs_cols)
                        for a in (
                            F.min(c).alias(f"__mn{i}"),
                            F.max(c).alias(f"__mx{i}"),
                        )
                    ],
                )
            stats = {}

    def _obs_stats() -> dict:
        if obs is None:
            return {}
        row = obs.get
        out = {}
        for i, c in enumerate(obs_cols):
            mn = _stats_value(row[f"__mn{i}"])
            mx = _stats_value(row[f"__mx{i}"])
            if mn is not None and mx is not None:
                out[c] = [mn, mx]
        return out

    if partition_col:
        out = df if arranged else df.repartition(F.col(partition_col))
        (
            out.write.mode("errorifexists")
            .partitionBy(partition_col)
            .parquet(target)
        )
        if stats is not None:
            stats = _obs_stats()
        if df.schema[partition_col].dataType.simpleString() == "string":
            from urllib.parse import unquote

            jvm, fs = _fs(df.sparkSession, target)
            prefix = f"{partition_col}="
            parts = []
            for status in fs.listStatus(_hpath(jvm, target)):
                name = status.getPath().getName()
                if not (status.isDirectory() and name.startswith(prefix)):
                    continue
                raw = name[len(prefix):]
                parts.append(
                    _NULL_PARTITION
                    if raw == "__HIVE_DEFAULT_PARTITION__"
                    else unquote(raw)
                )
            return d, sorted(parts), stats
        written = (
            df.sparkSession.read.schema(df.schema)
            .option("basePath", target)
            .parquet(target)
        )
        parts = [
            _NULL_PARTITION if r[0] is None else r[0]
            for r in written.select(
                F.col(partition_col).cast("string")
            ).distinct().collect()
        ]
        return d, sorted(parts), stats
    df.write.mode("errorifexists").parquet(target)
    if stats is not None:
        stats = _obs_stats()
    return d, None, stats


# ------------------------------------------------------------ key stats

# Types whose min/max survive a JSON round-trip with an order-preserving
# representation: numbers stay numbers; date/timestamp stringify to a
# fixed-width form whose lexicographic order IS chronological order.
# DECIMAL is excluded (its string form is not order-preserving), as are
# boolean/binary/complex — entries simply carry no stats for such keys
# and are never pruned on them.
_STATS_PREFIXES = (
    "tinyint", "smallint", "int", "bigint",
    "float", "double", "string", "date", "timestamp",
)


def _stats_value(v):
    if v is None or isinstance(v, (int, float, str)):
        return v
    return str(v)  # date / datetime -> ISO-ordered string


def _batch_key_stats(
    df: DataFrame, cols: list[str], pcol: str | None
) -> tuple[dict, list[str] | None, bool]:
    """One aggregation pass: per-column [min, max] for the stats-able
    ``cols``, the batch's distinct partition values when ``pcol`` is
    given (pass it ONLY when the partition column is itself a key —
    the collect_set is wasted work otherwise), and whether ANY key
    column holds a NULL (range pruning is unsound for NULL-keyed rows:
    min/max ignore them, but the null-safe anti-join must still see
    every entry that might hold a NULL twin). Driver traffic is
    2×|cols| scalars + the partition list.
    """
    dtypes = dict(df.dtypes)
    usable = [
        c for c in cols
        if c in dtypes and dtypes[c].startswith(_STATS_PREFIXES)
        and not dtypes[c].startswith("interval")
    ]
    aggs = []
    for i, c in enumerate(usable):
        aggs.append(F.min(c).alias(f"__mn{i}"))
        aggs.append(F.max(c).alias(f"__mx{i}"))
    for i, c in enumerate(cols):
        if c in dtypes:
            aggs.append(
                F.max(F.col(c).isNull().cast("int")).alias(f"__kn{i}")
            )
    if pcol is not None:
        aggs.append(
            F.collect_set(F.col(pcol).cast("string")).alias("__pv")
        )
        aggs.append(
            F.max(F.col(pcol).isNull().cast("int")).alias("__pnull")
        )
    if not aggs:
        return {}, None, False
    row = df.agg(*aggs).collect()[0]
    stats = {}
    for i, c in enumerate(usable):
        mn = _stats_value(row[f"__mn{i}"])
        mx = _stats_value(row[f"__mx{i}"])
        if mn is not None and mx is not None:
            stats[c] = [mn, mx]
    has_null_keys = any(
        row[f"__kn{i}"] for i, c in enumerate(cols) if c in dtypes
    )
    parts = None
    if pcol is not None:
        parts = sorted(set(row["__pv"] or []))
        if row["__pnull"]:
            parts.append(_NULL_PARTITION)
    return stats, parts, has_null_keys


def _dir_stats(
    spark: SparkSession, path: str, d: str, cols: list[str],
    columns: list[str], types: dict,
) -> dict:
    """[min, max] per stats-able column of a freshly-written data dir —
    a column-pruned scan of data still in page cache. Reads under the
    RECORDED schema: hive re-inference would type a numeric-looking
    string partition value as int, recording stats the later
    string-typed batch comparisons can never range-prune against."""
    target = f"{path.rstrip('/')}/{_DATA_DIR}/{d}"
    ddl = ", ".join(f"`{c}` {types.get(c, 'string')}" for c in columns)
    written = (
        spark.read.schema(ddl).option("basePath", target).parquet(target)
    )
    return _batch_key_stats(written, cols, None)[0]


def _may_intersect(
    entry: dict,
    keys: list[str],
    batch_stats: dict,
    batch_parts: list[str] | None,
) -> bool:
    """False only when the entry PROVABLY shares no key with the batch:
    disjoint partition-value sets, or a key column whose [min, max]
    ranges don't overlap. Entries without stats (pre-stats history,
    non-stats-able types) are always read — pruning is an optimization,
    never a correctness gamble.

    Range disjointness on ANY key column is sufficient: a composite-key
    match needs equality on every column. Callers must pass
    ``batch_parts`` ONLY when the partition column is itself one of the
    keys — otherwise an equal key can live in a different partition and
    partition pruning would silently skip the conflict."""
    if batch_parts is not None and entry.get("partitions") is not None:
        if not set(entry["partitions"]) & set(batch_parts):
            return False
    estats = entry.get("stats") or {}
    for c in keys:
        if c in estats and c in batch_stats:
            e_mn, e_mx = estats[c]
            b_mn, b_mx = batch_stats[c]
            try:
                if e_mx < b_mn or e_mn > b_mx:
                    return False
            except TypeError:  # mixed-type residue: keep the entry
                continue
    return True


# ---------------------------------------------------------- schema rules

# Lossless widenings a writer may carry implicitly (int literals into a
# bigint column, etc.). Everything else — notably string→number, whose
# non-ANSI cast silently NULLs bad rows — must fail loudly BEFORE the
# commit: a mistyped dir is durable and poisons every later read.
_SAFE_WIDEN = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    ("date", "timestamp"),
}


def _evolved_schema(
    m: dict, source: DataFrame, evolve_schema: bool
) -> tuple[list[str], dict]:
    """The table's (columns, types) after applying ``source`` under the
    shared evolution rule: new source columns extend the schema when
    ``evolve_schema``, otherwise they raise — one rule for append,
    merge, and replace_where."""
    out_columns = list(m["columns"])
    out_types = dict(m.get("types") or {})
    extra = [f for f in source.schema.fields if f.name not in out_columns]
    if evolve_schema:
        for f in extra:
            out_columns.append(f.name)
            out_types[f.name] = f.dataType.simpleString()
    elif extra:
        raise ValueError(
            f"source columns {[f.name for f in extra]} not in table "
            f"schema; pass evolve_schema=True to add them"
        )
    return out_columns, out_types


def _null_fill(df: DataFrame, out_columns: list[str], out_types: dict) -> DataFrame:
    """Extend ``df`` with typed-NULL columns for every schema column it
    lacks (the read side of ADD COLUMN: history and narrow batches see
    the evolved columns as NULL)."""
    for c in out_columns:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(out_types.get(c, "string")))
    return df


def _conform_types(src: DataFrame, out_types: dict) -> DataFrame:
    """Align ``src`` to the manifest's recorded column types: identical
    types pass, lossless widenings cast implicitly, anything else
    raises. Without this a drifted batch (string v into a bigint
    column) would COMMIT as-is and break every subsequent read."""
    for f in src.schema.fields:
        want = out_types.get(f.name)
        have = f.dataType.simpleString()
        if want is None or have == want:
            continue
        if have == "void":
            # a typeless NULL literal (F.lit(None) is void) casts
            # losslessly to ANY recorded type — without this,
            # update_rows(updates={field: None}) raises on txn tables
            # while the plain-parquet branch sets NULL fine
            src = src.withColumn(f.name, F.col(f.name).cast(want))
            continue
        if (have, want) in _SAFE_WIDEN:
            src = src.withColumn(f.name, F.col(f.name).cast(want))
        else:
            raise ValueError(
                f"source column {f.name} has type {have}; table "
                f"records {want} — cast explicitly (implicit casts "
                f"are limited to lossless widenings)"
            )
    return src


# ------------------------------------------------------------ public API


def txn_create(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_col: str | None = None,
    stats_cols: Sequence[str] | None = None,
) -> int:
    """Create a transactional table at version 1; errors if one exists.

    ``stats_cols`` (typically the table's conflict-check keys) records
    per-column [min, max] on the initial entry so later
    ``txn_append(keys=...)`` calls can range-prune it out of their
    anti-join."""
    if latest_version(spark, path) is not None:
        raise ValueError(f"transactional table already exists at {path}")
    col_types = {
        f.name: f.dataType.simpleString() for f in df.schema.fields
    }
    d, parts, wstats = _write_data(
        df, path, partition_col,
        stats_cols=list(stats_cols) if stats_cols else None,
        types=col_types,
    )
    manifest = {
        "partition_col": partition_col,
        # original column order: hive-layout reads move the partition
        # column to the end, so reads re-select this order
        "columns": list(df.columns),
        # DDL types so evolved-away or missing columns can be NULL-cast
        "types": col_types,
        "entries": [],
    }
    if partition_col and not parts:
        # empty partitioned create: partitionBy of zero rows writes no
        # schema-bearing part file, so referencing the dir would brick
        # every read ("unable to infer schema") — commit ZERO entries
        # (the merge/replace_where rule); txn_read rebuilds the empty
        # frame from the manifest schema, and the fileless staged dir
        # is swept by the next txn_vacuum
        _commit(spark, path, 1, manifest)
        return 1
    entry: dict = {"dir": d, "partitions": parts}
    if stats_cols:
        # stats observed during the write itself (the observed rows ARE
        # the written rows); the read-back fallback only fires when the
        # partition column is itself a stats column (see _write_data)
        stats = wstats if wstats is not None else _dir_stats(
            spark, path, d, list(stats_cols),
            manifest["columns"], manifest["types"],
        )
        if stats:
            entry["stats"] = stats
    manifest["entries"] = [entry]
    _commit(spark, path, 1, manifest)
    return 1


def _read_entries(
    spark: SparkSession,
    path: str,
    m: dict,
    entries: list[dict],
    columns: list[str] | None = None,
) -> DataFrame:
    """Union the given manifest entries' immutable dirs, projected to
    ``columns`` (default: the full manifest column list). The column
    projection reaches each parquet scan — the key-pruned anti-join in
    :func:`txn_append` reads ONLY key columns of ONLY the entries whose
    stats may intersect the batch."""
    cols = list(columns) if columns is not None else list(m["columns"])
    types = m.get("types") or {}
    # every entry reads under the MANIFEST's schema: columns an old
    # entry lacks (pre-evolution history) come back as typed NULL, and
    # — critically — the partition column keeps its RECORDED type
    # instead of being re-inferred from hive dir names (a string
    # partition value '01' would otherwise come back as int 1 and the
    # value filter below would silently hide the rows)
    ddl = ", ".join(
        f"`{c}` {types.get(c, 'string')}" for c in m["columns"]
    )
    pcol = m["partition_col"]
    if not entries:
        return spark.createDataFrame([], ddl).select(*cols)
    frames = []
    for e in entries:
        d = f"{path.rstrip('/')}/{_DATA_DIR}/{e['dir']}"
        sub = spark.read.schema(ddl).option("basePath", d).parquet(d)
        if pcol is not None and e["partitions"] is not None:
            sub = sub.where(_partition_cond(pcol, e["partitions"]))
        frames.append(sub)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select(*cols)


def txn_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve ONE manifest, then union its immutable
    dirs. Commits that land after this call never affect the returned
    frame (old dirs are immutable until vacuumed past this version)."""
    v = latest_version(spark, path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no transactional table at {path}")
    m = _read_manifest(spark, path, v)
    return _read_entries(spark, path, m, m["entries"])


def txn_append(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: Sequence[str] | None = None,
    evolve_schema: bool = False,
) -> int:
    """INSERT — with ``keys``, INSERT ... ON CONFLICT DO NOTHING: rows
    whose key already exists in the base snapshot are dropped before
    the commit, so micro-batch replays converge (the transactional
    twin of ``writers.idempotent_append``, which auto-routes here for
    txn targets). Appends ONE immutable data dir and one manifest
    entry; existing data is read only for the key anti-join (key
    columns, pruned) and never rewritten. Entries' partition lists are
    read-side filters, not exclusive claims, so an appended entry adds
    rows without shadowing prior entries. Returns rows appended; an
    empty effective batch commits nothing. Raises
    :class:`ConcurrentWriteError` if another commit wins the version
    race (re-read and retry).

    The conflict check's cost stays FLAT as table history grows: each
    entry's manifest carries per-key [min, max] stats recorded at write
    time, and the anti-join reads only the key columns of only the
    entries whose ranges may intersect the batch (plus, when the
    partition column is itself a key, only entries sharing a partition
    value). A streaming sink appending monotone keys (event ids,
    timestamps) therefore probes O(1) recent entries per batch instead
    of re-scanning the whole table's keys — the manifest-side analog of
    the reference's one index probe per conflict check
    (``database-schema.sql:62-63``)."""
    base_v = latest_version(spark, path)
    if base_v is None:
        raise FileNotFoundError(
            f"no transactional table at {path}; use txn_create first"
        )
    m = _read_manifest(spark, path, base_v)
    pcol = m["partition_col"]
    # shared evolution rule (new columns extend / extras raise), then
    # NULL-fill table columns the source lacks (evolve mode only) and
    # enforce recorded column types before anything becomes durable
    out_columns, out_types = _evolved_schema(m, source, evolve_schema)
    src = _null_fill(source, out_columns, out_types) if evolve_schema else source
    src = _conform_types(src.select(*out_columns), out_types)
    schema_grew = out_columns != m["columns"]
    stats: dict = {}
    if keys:
        keys = list(keys)
        src = src.dropDuplicates(keys)
    # eager checkpoint BEFORE any action: the stats aggregation, the
    # prune decision, the anti-join, the count, and the data-dir write
    # must all see the SAME rows — a non-deterministic source (landing
    # dir mid-ingest, rand() sampling) re-evaluated per action would
    # otherwise let the written keys diverge from the stats/anti-join
    # that vouched for them, silently breaking exactly-once
    src = src.localCheckpoint(eager=True)
    if keys:
        # one agg pass over the (small, now-pinned) batch: key ranges +
        # partition values — reused twice, to prune the existing-keys
        # read AND as the new entry's recorded stats. The partition
        # list is only computed when pruning can legally use it (pcol
        # among the keys) — a per-minute sink must not pay a dead
        # collect_set forever.
        stats, bparts, has_null_keys = _batch_key_stats(
            src, keys, pcol if (pcol is not None and pcol in keys) else None
        )
        if has_null_keys:
            # min/max ignore NULLs, so range pruning cannot see a NULL
            # twin sitting in an otherwise-disjoint entry — read
            # everything for this (rare) batch shape
            candidates = list(m["entries"])
        else:
            candidates = [
                e for e in m["entries"]
                if _may_intersect(e, keys, stats, bparts)
            ]
        existing = _read_entries(spark, path, m, candidates, columns=keys)
        # NULL-SAFE key equality: dropDuplicates above already treats
        # NULL keys as equal, and a replayed micro-batch must converge
        # for NULL-keyed rows too — plain equality would re-append them
        # on every replay (NULL = NULL is unknown in a join predicate)
        s, ex = src.alias("__s"), existing.alias("__e")
        cond = None
        for k in keys:
            c = F.col(f"__s.{k}").eqNullSafe(F.col(f"__e.{k}"))
            cond = c if cond is None else cond & c
        # both anti-join inputs are immutable (checkpointed batch,
        # version-pinned entry dirs), so count and write below replay
        # it identically; checkpoint the result anyway to evaluate the
        # existing-keys read once, not once per action
        src = s.join(ex, on=cond, how="left_anti").localCheckpoint(
            eager=True
        )
    n = src.count()
    manifest = dict(m)
    manifest["columns"] = out_columns
    manifest["types"] = out_types
    if n == 0:
        if schema_grew:
            # a replayed evolving batch may dedup to empty: the schema
            # change must still commit (mergeSchema semantics — a
            # consumer told "the column exists as of this batch" reads
            # it as typed NULL), just with no new data dir
            manifest["entries"] = list(m["entries"])
            _commit(spark, path, base_v + 1, manifest)
        return 0
    d, parts, _ = _write_data(src, path, pcol)
    new_entry = {"dir": d, "partitions": parts}
    if stats:
        new_entry["stats"] = stats
    manifest["entries"] = list(m["entries"]) + [new_entry]
    _commit(spark, path, base_v + 1, manifest)
    return n


def txn_merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: Sequence[str],
    evolve_schema: bool = False,
    strict_source: bool = False,
) -> tuple[int, int]:
    """MERGE with snapshot isolation: WHEN MATCHED UPDATE (source row
    wins), WHEN NOT MATCHED INSERT — same semantics and return value
    as ``writers.merge_into``, but readers of the previous version are
    never disturbed and a concurrent commit raises
    :class:`ConcurrentWriteError` instead of corrupting the table.

    Duplicate SOURCE keys collapse to one arbitrary winner (the
    ``writers.merge_into`` contract); ``strict_source=True`` instead
    raises — the Delta posture ("multiple source rows matched"),
    for callers whose duplicate keys indicate an upstream bug. Rows
    needing multiplicity-preserving replacement belong in
    :func:`txn_replace_where`.

    Partitioned targets rewrite only AFFECTED partition values: the
    new data dir carries them, surviving entries lose them from their
    ``partitions`` list (dropping entries that end up empty), so
    unaffected data is neither read nor rewritten.

    ``evolve_schema=True`` (the mergeSchema analog) appends source
    columns missing from the table: the manifest's column list grows,
    surviving entries simply lack the new columns and read as NULL —
    no historical data is rewritten for an ADD COLUMN.
    """
    keys = list(keys)
    base_v = latest_version(spark, path)
    if base_v is None:
        raise FileNotFoundError(
            f"no transactional table at {path}; use txn_create first"
        )
    m = _read_manifest(spark, path, base_v)
    pcol = m["partition_col"]
    target = txn_read(spark, path, base_v)
    out_columns, out_types = _evolved_schema(m, source, evolve_schema)
    target = _null_fill(target, out_columns, out_types)
    # try/finally: _commit raises ConcurrentWriteError BY DESIGN on a
    # lost version race, and the documented retry loop re-enters this
    # function — releases must not sit after the raise or every lost
    # race leaks one cached copy of the source
    src = _conform_types(
        source.dropDuplicates(keys).select(*out_columns), out_types
    ).persist()
    kept = None
    try:
        # ONE agg over the persisted source: row count plus (for
        # partitioned targets) its distinct partition values — the r13
        # code paid a second full pass for the values inside the
        # affected-partition collect (r14)
        src_aggs = [F.count(F.lit(1)).alias("__n")]
        if pcol is not None:
            src_aggs.append(
                F.collect_set(F.col(pcol).cast("string")).alias("__sp")
            )
            src_aggs.append(
                F.max(F.col(pcol).isNull().cast("int")).alias("__snull")
            )
        srow = src.agg(*src_aggs).collect()[0]
        n_src = int(srow["__n"])
        if strict_source and source.count() != n_src:
            raise ValueError(
                "source has duplicate rows per key; merge would pick an "
                "arbitrary winner (pass strict_source=False to accept, "
                "or use txn_replace_where for multiplicity-preserving "
                "writes)"
            )
        if n_src == 0:
            # no-op merge: committing would add an entry whose data dir
            # has no files (unreadable) — an empty source changes no
            # DATA. A schema evolution must still commit (mergeSchema
            # metadata semantics, same as txn_append's empty-batch
            # path), else a replayed evolving merge that dedups to
            # empty silently drops the promised column-add.
            if out_columns != m["columns"]:
                _commit(
                    spark,
                    path,
                    base_v + 1,
                    dict(
                        m,
                        columns=out_columns,
                        types=out_types,
                        entries=list(m["entries"]),
                    ),
                )
            return (0, 0)

        if pcol is None:
            kept = target.join(src.select(*keys), on=keys, how="left_anti")
            # matched SOURCE keys (a non-unique-key target collapses N
            # rows into one source row; counting removals would yield
            # updated > n_src and negative inserts)
            updated = src.join(target, on=keys, how="left_semi").count()
            d, parts, wstats = _write_data(
                kept.unionByName(src), path, None,
                stats_cols=keys, types=out_types,
            )
            entry: dict = {"dir": d, "partitions": parts}
            stats = wstats if wstats is not None else _dir_stats(
                spark, path, d, keys, out_columns, out_types
            )
            if stats:
                entry["stats"] = stats
            manifest = {
                "partition_col": None,
                "columns": out_columns,
                "types": out_types,
                "entries": [entry],
            }
            _commit(spark, path, base_v + 1, manifest)
            return (updated, n_src - updated)

        # ONE inner join answers both driver questions the r13 code
        # asked with two separate semi-joins (r14): which target
        # partitions hold a matched row (collect_set over the join),
        # and how many SOURCE keys matched (countDistinct over the
        # join — src is key-deduped, so distinct matched key tuples
        # ARE matched source rows; key equality drops NULL-keyed rows
        # exactly as the semi-joins did). "Matched source keys", not
        # rows removed: a non-unique-key target collapses N rows into
        # the one source row (the keyed merge contract), and counting
        # removals would report updated > n_src and a negative insert
        # count. Restricting the updated-count to affected partitions
        # was never load-bearing — every matched target row sits in an
        # affected partition by construction.
        mrow = (
            target.select(
                *keys, F.col(pcol).cast("string").alias("__p")
            )
            .join(src.select(*keys), on=keys, how="inner")
            .agg(
                F.countDistinct(*keys).alias("__u"),
                F.collect_set("__p").alias("__tp"),
                F.max(F.col("__p").isNull().cast("int")).alias("__tnull"),
            )
            .collect()[0]
        )
        affected = set(mrow["__tp"] or []) | set(srow["__sp"] or [])
        if mrow["__tnull"] or srow["__snull"]:
            affected.add(_NULL_PARTITION)
        updated = int(mrow["__u"] or 0)
        sub = target.where(_partition_cond(pcol, sorted(affected)))
        kept = sub.join(src.select(*keys), on=keys, how="left_anti")
        # kept is consumed exactly once (the write below), so it needs
        # neither a persist nor the materializing count the r13 code
        # paid — one full anti-join pass saved per partitioned merge
        # (r14); its inputs (version-pinned dirs, the persisted src)
        # are immutable, so the single evaluation is deterministic
        d, parts, wstats = _write_data(
            kept.unionByName(src), path, pcol,
            stats_cols=keys, types=out_types,
        )
        entries = []
        for e in m["entries"]:
            if e["partitions"] is None:
                remaining = None
            else:
                remaining = [p for p in e["partitions"] if p not in affected]
                if not remaining:
                    continue
            entries.append(dict(e, partitions=remaining))
        new_entry: dict = {"dir": d, "partitions": parts}
        stats = wstats if wstats is not None else _dir_stats(
            spark, path, d, keys, out_columns, out_types
        )
        if stats:
            new_entry["stats"] = stats
        entries.append(new_entry)
        _commit(
            spark,
            path,
            base_v + 1,
            {
                "partition_col": pcol,
                "columns": out_columns,
                "types": out_types,
                "entries": entries,
            },
        )
        return (updated, n_src - updated)
    finally:
        src.unpersist()
        if kept is not None:
            kept.unpersist()  # no-op for the unpartitioned (lazy) branch


def txn_replace_where(
    spark: SparkSession,
    path: str,
    condition,
    replacement: DataFrame | None,
    evolve_schema: bool = False,
) -> tuple[int, int]:
    """Atomic DELETE WHERE ``condition`` + INSERT ``replacement`` — the
    replaceWhere analog generalized to arbitrary predicates, and the
    row-level mutation primitive :func:`txn_merge_into` cannot express:
    a merge is keyed (``dropDuplicates`` on the key), so N existing
    rows sharing a key collapse to one; replace_where swaps an exact
    row SET for another, preserving multiplicity.

    Rows where ``condition`` is NULL are kept (SQL DELETE semantics).
    ``replacement=None`` means pure DELETE. Returns
    ``(rows_deleted, rows_inserted)``; a no-op (nothing matched, empty
    replacement) commits nothing.

    Scale shape: partitioned targets rewrite only partitions holding a
    matching row or receiving a replacement row — same
    affected-partition machinery as merge; everything else keeps its
    entry untouched. Raises :class:`ConcurrentWriteError` on a lost
    version race (wrap in :func:`txn_retry`).
    """
    base_v = latest_version(spark, path)
    if base_v is None:
        raise FileNotFoundError(
            f"no transactional table at {path}; use txn_create first"
        )
    m = _read_manifest(spark, path, base_v)
    pcol = m["partition_col"]
    target = txn_read(spark, path, base_v)
    out_columns = list(m["columns"])
    out_types = dict(m.get("types") or {})
    if replacement is not None:
        out_columns, out_types = _evolved_schema(m, replacement, evolve_schema)
        target = _null_fill(target, out_columns, out_types)
        replacement = _conform_types(
            replacement.select(*out_columns), out_types
        )

    hit = F.coalesce(condition, F.lit(False))
    # the rewritten entry re-records stats for whatever columns the
    # table tracks (union across existing entries) — an unstatted
    # rewrite would force every later keyed append to scan it forever
    # and poison the next compaction's stats carry-through
    tracked = sorted(
        set().union(*[set((e.get("stats") or {}).keys())
                      for e in m["entries"]])
    ) if m["entries"] else []

    def _entry_with_stats(d: str, parts, wstats=None) -> dict:
        e: dict = {"dir": d, "partitions": parts}
        if tracked:
            s = wstats if wstats is not None else _dir_stats(
                spark, path, d, tracked, out_columns, out_types
            )
            if s:
                e["stats"] = s
        return e

    def _commit_schema_only() -> None:
        # nothing to delete or insert, but the replacement carried a
        # schema evolution: commit the metadata change (mergeSchema
        # semantics — same as the append/merge empty paths)
        if out_columns != m["columns"]:
            _commit(
                spark,
                path,
                base_v + 1,
                dict(
                    m,
                    columns=out_columns,
                    types=out_types,
                    entries=list(m["entries"]),
                ),
            )

    repl = (
        replacement.persist() if replacement is not None else None
    )
    kept = None
    try:
        n_ins = repl.count() if repl is not None else 0

        if pcol is None:
            # ONE counting pass (total + survivors together) instead of
            # the r13 kept.count() + target.count() pair (r14); kept is
            # then consumed exactly once (the write), so it stays lazy
            row = target.agg(
                F.count(F.lit(1)).alias("__n"),
                F.count(F.when(~hit, 1)).alias("__k"),
            ).collect()[0]
            n_kept = int(row["__k"])
            deleted = int(row["__n"]) - n_kept
            kept = target.where(~hit)
            if deleted == 0 and n_ins == 0:
                _commit_schema_only()
                return (0, 0)
            # an all-rows delete commits ZERO entries (a data dir with
            # no files would be unreadable); txn_read rebuilds the
            # empty frame from the manifest schema
            entries = []
            if n_kept + n_ins > 0:
                out = kept if repl is None else kept.unionByName(repl)
                d, parts, wstats = _write_data(
                    out, path, None,
                    stats_cols=tracked or None, types=out_types,
                )
                entries = [_entry_with_stats(d, parts, wstats)]
            _commit(
                spark,
                path,
                base_v + 1,
                {
                    "partition_col": None,
                    "columns": out_columns,
                    "types": out_types,
                    "entries": entries,
                },
            )
            return (deleted, n_ins)

        # ONE pass over the target: per-partition (rows, hit rows)
        # counts — the collected frame is partition-cardinality-
        # bounded. The r13 code paid two passes (the hit-partition
        # distinct/collect, then a count agg over the affected slice);
        # all three driver numbers fall out of this one (r14):
        # affected = partitions holding a hit (hit rows live nowhere
        # else), deleted = total hits, and n_kept = surviving rows of
        # exactly the affected partitions.
        pstats = (
            target.groupBy(F.col(pcol).cast("string").alias("__p"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.count(F.when(hit, 1)).alias("__h"),
            )
            .collect()
        )
        enc = {
            (_NULL_PARTITION if r["__p"] is None else r["__p"]): (
                int(r["__n"]), int(r["__h"])
            )
            for r in pstats
        }
        affected = {p for p, (_, h) in enc.items() if h > 0}
        if repl is not None:
            rrow = repl.agg(
                F.collect_set(F.col(pcol).cast("string")).alias("__rp"),
                F.max(F.col(pcol).isNull().cast("int")).alias("__rn"),
            ).collect()[0]
            affected |= set(rrow["__rp"] or [])
            if rrow["__rn"]:
                affected.add(_NULL_PARTITION)
        if not affected:
            _commit_schema_only()
            return (0, 0)
        deleted = sum(h for _, h in enc.values())
        n_kept = sum(
            n - h for p, (n, h) in enc.items() if p in affected
        )
        sub = target.where(_partition_cond(pcol, sorted(affected)))
        kept = sub.where(~hit)
        entries = []
        for e in m["entries"]:
            if e["partitions"] is None:
                remaining = None
            else:
                remaining = [p for p in e["partitions"] if p not in affected]
                if not remaining:
                    continue
            # surviving entries keep their stats: the original-dir range
            # is a superset of the filtered view — conservative-sound
            entries.append(dict(e, partitions=remaining))
        if n_kept + n_ins > 0:  # all-affected-rows delete -> no new dir
            out = kept if repl is None else kept.unionByName(repl)
            d, parts, wstats = _write_data(
                out, path, pcol,
                stats_cols=tracked or None, types=out_types,
            )
            entries.append(_entry_with_stats(d, parts, wstats))
        _commit(
            spark,
            path,
            base_v + 1,
            {
                "partition_col": pcol,
                "columns": out_columns,
                "types": out_types,
                "entries": entries,
            },
        )
        return (deleted, n_ins)
    finally:
        if repl is not None:
            repl.unpersist()
        if kept is not None:
            kept.unpersist()


def txn_delete(
    spark: SparkSession, path: str, condition
) -> int:
    """DELETE WHERE ``condition`` (NULL-evaluating rows kept), as one
    atomic version. Returns rows deleted."""
    deleted, _ = txn_replace_where(spark, path, condition, None)
    return deleted


def txn_retry(
    fn,
    attempts: int = 5,
    backoff_sec: float = 0.2,
):
    """Bounded optimistic-concurrency retry: run ``fn()`` again when it
    loses a commit race (:class:`ConcurrentWriteError`), with
    exponential backoff, re-raising after ``attempts`` tries.

    Safe for every mutation in this module BY CONSTRUCTION: each one
    re-reads ``latest_version`` at entry, so a retry transacts against
    the snapshot that beat it — the documented "re-read and retry"
    contract, finally packaged. Key-conditioned ops (``txn_append``
    with keys, ``txn_merge_into``) are idempotent across retries: the
    anti-join/merge re-evaluates against the new snapshot, so a retry
    after a racer inserted the same keys appends nothing twice.
    """
    import time

    last: ConcurrentWriteError | None = None
    for i in range(max(1, attempts)):
        try:
            return fn()
        except ConcurrentWriteError as e:
            last = e
            if i < attempts - 1:
                time.sleep(backoff_sec * (2 ** i))
    raise last


def txn_maintain(
    spark: SparkSession,
    path: str,
    max_entries: int = 64,
    target_files: int = 1,
    vacuum_keep_versions: int | None = None,
    vacuum_min_age_sec: float = 3600.0,
) -> int | None:
    """Auto-compaction policy: when the CURRENT manifest lists more
    than ``max_entries`` data-dir entries, rewrite the snapshot into
    one (:func:`txn_compact`) and return the new version; otherwise
    None. A per-minute streaming sink adds one entry per micro-batch —
    without a bound, every read unions hundreds of dirs. Readers
    pinned to older versions are unaffected (their dirs survive until
    :func:`txn_vacuum`). Caller wraps in :func:`txn_retry` if other
    writers may race.

    ``vacuum_keep_versions`` additionally bounds DISK growth after a
    compaction: old versions' dirs otherwise accrete until someone
    vacuums. It is opt-in — retention is a policy decision (time
    travel ends at the horizon you set), and the age guard still
    protects in-flight writers — pick a horizon no reader outlives."""
    v = latest_version(spark, path)
    if v is None:
        return None
    if len(_read_manifest(spark, path, v)["entries"]) <= max_entries:
        return None
    new_v = txn_compact(spark, path, target_files=target_files)
    if vacuum_keep_versions is not None:
        txn_vacuum(
            spark,
            path,
            keep_versions=vacuum_keep_versions,
            min_age_sec=vacuum_min_age_sec,
        )
    return new_v


def txn_history(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, oldest first (time travel via txn_read)."""
    return _list_versions(spark, path)


def txn_vacuum(
    spark: SparkSession,
    path: str,
    keep_versions: int = 2,
    min_age_sec: float = 3600.0,
) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and any
    data dir no surviving manifest references. Returns removed dirs.

    Run only when no reader is pinned to a vacuumed version — the same
    retention contract as Delta's VACUUM.

    ``min_age_sec`` keeps unreferenced dirs YOUNGER than the cutoff: a
    concurrent writer stages its data dir BEFORE committing the
    manifest that references it, so an age-blind vacuum could delete
    an in-flight commit's data out from under it (the same uncommitted-
    file retention Delta's VACUUM applies). Set it above your longest
    write job; 0 only when no writer can be running.
    """
    import time as _time

    versions = _list_versions(spark, path)
    if not versions:
        return []
    # The dir sweep runs even when no manifest is droppable: a prior
    # vacuum may have dropped manifests whose dirs were then too young
    # to delete, and crashed writers leave staged dirs no manifest ever
    # references — an early return here would strand both forever once
    # the version count sits at its post-vacuum steady state.
    k = max(1, keep_versions)  # the latest version is never droppable
    keep = versions[-k:]
    drop = versions[: len(versions) - len(keep)]
    live = set()
    for v in keep:
        for e in _read_manifest(spark, path, v)["entries"]:
            live.add(e["dir"])
    jvm, fs = _fs(spark, path)
    removed = []
    cutoff_ms = (_time.time() - min_age_sec) * 1000.0
    data = _hpath(jvm, path, _DATA_DIR)
    if fs.exists(data):
        for status in fs.listStatus(data):
            name = status.getPath().getName()
            if name not in live and status.getModificationTime() < cutoff_ms:
                fs.delete(status.getPath(), True)
                removed.append(name)
    for v in drop:
        fs.delete(_hpath(jvm, path, _LOG_DIR, _version_name(v)), False)
    return removed


def txn_compact(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    sort_cols: Sequence[str] | None = None,
    zorder_cols: Sequence[str] | None = None,
) -> int:
    """OPTIMIZE analog: rewrite the CURRENT snapshot into one fresh
    entry with ``target_files`` files per partition value, committed as
    a new version. Readers of older versions are untouched (their dirs
    survive until :func:`txn_vacuum`); a racing writer loses the
    version race and retries as usual. Returns the new version.

    ``sort_cols`` (OPTIMIZE ... with linear sort) or ``zorder_cols``
    (OPTIMIZE ZORDER — see ``writers.write_zordered`` for the
    rank-interleave construction) additionally arrange the rewritten
    rows so parquet row-group min/max stats become narrow on the named
    columns: point/range predicates on them skip whole row groups of a
    compacted transactional table. Partitioned tables arrange WITHIN
    each partition value (the Delta per-partition semantics).
    """
    if sort_cols and zorder_cols:
        raise ValueError("pass sort_cols or zorder_cols, not both")
    base_v = latest_version(spark, path)
    if base_v is None:
        raise FileNotFoundError(f"no transactional table at {path}")
    m = _read_manifest(spark, path, base_v)
    if not m["entries"]:
        return base_v  # fully-deleted table: nothing to rewrite
    pcol = m["partition_col"]
    snap = txn_read(spark, path, base_v)
    arranged = False
    drop_z = False
    order: list = []
    if zorder_cols:
        from .writers import zorder_staged

        snap = zorder_staged(snap, list(zorder_cols))
        order = [F.col("_zval")]
        drop_z = True
    elif sort_cols:
        order = [F.col(c) for c in sort_cols]
    if order:
        arranged = True
        if pcol:
            # cluster per partition value: partition dirs split the
            # tasks' output anyway, so sort pcol first to keep each
            # task's rows contiguous per partition
            snap = snap.repartition(target_files, F.col(pcol))
            snap = snap.sortWithinPartitions(F.col(pcol), *order)
        else:
            snap = snap.repartitionByRange(target_files, *order)
            snap = snap.sortWithinPartitions(*order)
        if drop_z:
            snap = snap.drop("_zval")
    elif pcol:
        snap = snap.repartition(target_files, F.col(pcol))
    else:
        snap = snap.coalesce(target_files)
    d, parts, _ = _write_data(snap, path, pcol, arranged=arranged)
    entry: dict = {"dir": d, "partitions": parts}
    # Stats carry through compaction: columns every pre-compaction
    # entry has stats for merge WITHOUT a scan ([min of mins, max of
    # maxes] — a superset of the live rows, conservative-sound); any
    # column only SOME entries cover is recomputed from the freshly
    # written dir instead — one statsless entry (a keyless create, a
    # replace_where rewrite) must not strip the whole table's stats,
    # or auto-compaction would silently degrade every later keyed
    # append back to full-table conflict scans.
    merged: dict = {}
    per_entry = [set((e.get("stats") or {}).keys()) for e in m["entries"]]
    wanted = set.union(*per_entry)
    shared = set.intersection(*per_entry)
    for c in shared:
        los = [e["stats"][c][0] for e in m["entries"]]
        his = [e["stats"][c][1] for e in m["entries"]]
        try:
            merged[c] = [min(los), max(his)]
        except TypeError:
            continue
    partial = sorted(wanted - set(merged))
    if partial:
        merged.update(
            _dir_stats(
                spark, path, d, partial,
                m["columns"], m.get("types") or {},
            )
        )
    if merged:
        entry["stats"] = merged
    _commit(
        spark,
        path,
        base_v + 1,
        {
            "partition_col": pcol,
            "columns": m["columns"],
            "types": m.get("types") or {},
            "entries": [entry],
        },
    )
    return base_v + 1


def txn_changes(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two versions (the CDF analog): the
    row-level diff keyed by ``keys``, tagged ``_change_type`` in
    {'insert', 'update_postimage', 'delete'}.

    Computed from the two snapshots (full-outer semantics via
    anti/semi joins), so it needs no per-commit change files — the
    manifest log already preserves both endpoints until vacuum. At
    scale the joins shuffle on the key columns only; updates compare
    shared non-key columns null-safely, so a rewrite that didn't
    change a row's values does NOT emit a change row (value-level CDF,
    stricter than file-level diffs). Deleted rows carry their OLD
    values, NULL-extended to the newer schema.

    Partitioned tables are diffed over AFFECTED PARTITION VALUES only:
    a value served by the same immutable dirs in both manifests holds
    bit-identical rows on both sides, so only entries carrying a value
    whose contribution set changed are read at all — a feed window
    over a daily-partitioned table costs O(changed days), not
    O(table). Cross-partition key moves stay correct (both the losing
    and gaining value's contributions change, so both sides are read).
    ``keys`` must identify a row (the keyed-mutation discipline this
    module maintains); rows duplicated across partitions under one key
    are outside the CDC contract.
    """
    keys = list(keys)
    new_v = latest_version(spark, path) if to_version is None else to_version
    m_old = _read_manifest(spark, path, from_version)
    m_new = _read_manifest(spark, path, new_v)
    pcol = m_new["partition_col"]
    pruned = (
        pcol is not None
        and m_old["partition_col"] == pcol
        and all(
            e["partitions"] is not None
            for e in m_old["entries"] + m_new["entries"]
        )
    )
    if pruned:
        # Manifest-driven pruning: a partition value whose CONTRIBUTION
        # SET — the dirs (immutable) serving it — is identical in both
        # manifests holds bit-identical rows on both sides and can emit
        # no change row, so the diff below needs only the values whose
        # contributions differ, and only the ENTRIES carrying such a
        # value are opened at all. A feed over a daily-partitioned
        # table therefore costs O(changed days), not O(table) — without
        # this, every txn_feed window re-joined both FULL snapshots.
        def _contrib(m: dict) -> dict[str, frozenset]:
            out: dict[str, set] = {}
            for e in m["entries"]:
                for p in e["partitions"]:
                    out.setdefault(p, set()).add(e["dir"])
            return {p: frozenset(s) for p, s in out.items()}

        co, cn = _contrib(m_old), _contrib(m_new)
        hit = {p for p in set(co) | set(cn) if co.get(p) != cn.get(p)}
        affected = sorted(hit)

        def _touched(m: dict) -> list[dict]:
            return [
                e for e in m["entries"] if set(e["partitions"]) & hit
            ]

        old = _read_entries(spark, path, m_old, _touched(m_old)).where(
            _partition_cond(pcol, affected)
        )
        new = _read_entries(spark, path, m_new, _touched(m_new)).where(
            _partition_cond(pcol, affected)
        )
    else:
        old = _read_entries(spark, path, m_old, m_old["entries"])
        new = _read_entries(spark, path, m_new, m_new["entries"])
    for c in new.columns:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast(dict(new.dtypes)[c]))
    old = old.select(*new.columns)

    inserts = new.join(old.select(*keys), on=keys, how="left_anti").select(
        F.lit("insert").alias("_change_type"), *new.columns
    )
    deletes = old.join(new.select(*keys), on=keys, how="left_anti").select(
        F.lit("delete").alias("_change_type"), *new.columns
    )
    value_cols = [c for c in new.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    changed = None
    for c in value_cols:
        neq = ~F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
        changed = neq if changed is None else (changed | neq)
    upd = n.join(o, on=keys)
    if changed is not None:
        upd = upd.where(changed)
    else:  # key-only table: an "update" cannot change anything
        upd = upd.where(F.lit(False))
    updates = upd.select(
        F.lit("update_postimage").alias("_change_type"),
        *keys,
        *[F.col(f"n.{c}").alias(c) for c in value_cols],
    )
    return inserts.unionByName(deletes).unionByName(updates)


def _read_cursor(spark: SparkSession, cursor_path: str) -> int | None:
    """Highest version marker in the cursor DIRECTORY, or None.

    A plain FILE at ``cursor_path`` is the legacy single-file cursor
    format: its JSON version is honored (silently reading it as None
    would reset the consumer to first-call state — the exact
    data-loss mode the directory format exists to prevent). A
    ``.legacy`` sibling is the migration parking spot — consulted
    whenever the directory holds no marker yet, so no crash point in
    the migration ever leaves the consumer cursorless."""
    jvm, fs = _fs(spark, cursor_path)
    hp = _hpath(jvm, cursor_path)
    if fs.exists(hp):
        if fs.getFileStatus(hp).isFile():
            return int(json.loads(_read_file(jvm, fs, hp))["version"])
        markers = _list_numbered(fs, hp)
        if markers:
            return markers[-1]
    legacy = _hpath(jvm, cursor_path.rstrip("/") + ".legacy")
    if fs.exists(legacy):
        return int(json.loads(_read_file(jvm, fs, legacy))["version"])
    return None


def txn_feed_advance(
    spark: SparkSession, cursor_path: str, version: int
) -> None:
    """Persist the consumer's cursor AFTER its processing of the
    :func:`txn_feed` window is durably done — advancing first would
    turn a crash into silent data loss; advancing after gives
    at-least-once with an idempotent replay window.

    The cursor is a directory of version marker files published by
    atomic rename (the manifest-log pattern): there is NO window where
    no cursor exists — a delete-then-rename file swap could crash
    in between and silently reset the consumer to first-call state,
    whose full-snapshot replay never delivers the deletes it skipped.
    Older markers are pruned best-effort after the new one lands. A
    legacy single-FILE cursor at this path is migrated crash-safely:
    renamed aside (atomic) so :func:`_read_cursor` can still fall back
    to it at every intermediate crash point, then superseded by a
    marker carrying max(legacy, this advance) — a stale consumer
    advancing to an OLDER version than the legacy cursor recorded must
    not regress it (the directory format's max-marker monotonicity)."""
    jvm, fs = _fs(spark, cursor_path)
    hp = _hpath(jvm, cursor_path)
    legacy = _hpath(jvm, cursor_path.rstrip("/") + ".legacy")
    version = int(version)
    if fs.exists(hp) and fs.getFileStatus(hp).isFile():
        if not fs.rename(hp, legacy):
            raise IOError(f"could not stage legacy cursor {cursor_path}")
    if fs.exists(legacy):
        version = max(
            version, int(json.loads(_read_file(jvm, fs, legacy))["version"])
        )
    fs.mkdirs(hp)
    final = _hpath(jvm, cursor_path, _version_name(version))
    if not fs.exists(final):
        tmp = _hpath(jvm, cursor_path, f".tmp-{uuid.uuid4().hex}.json")
        _write_file(fs, tmp, json.dumps({"version": version}))
        if not fs.rename(tmp, final):
            fs.delete(tmp, False)
            if not fs.exists(final):  # a racer advancing is fine
                raise IOError(f"could not publish cursor {cursor_path}")
    fs.delete(legacy, False)  # marker published; parking spot done
    for v in _list_numbered(fs, hp):
        if v < version:
            fs.delete(_hpath(jvm, cursor_path, _version_name(v)), False)


def txn_feed(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    cursor_path: str,
) -> tuple[DataFrame, int]:
    """Incremental consumption of a transactional table — the
    startingVersion/CDF-consumer pattern with a persisted cursor:
    returns ``(changes, latest_version)`` where ``changes`` is the
    value-level feed (:func:`txn_changes`) since the version the
    cursor last recorded, or the FULL current snapshot tagged
    ``insert`` on first call. Process the frame, then call
    :func:`txn_feed_advance` with the returned version; crashing
    before the advance replays the same window (at-least-once — the
    feed is a deterministic function of two immutable snapshots, so
    replays are idempotent for any idempotent consumer, e.g. the
    CDC-driven matview refresh in ``operators/etl.py``).

    Scale: nothing is re-scanned but the two snapshot endpoints; the
    cursor is a tiny directory of version markers (atomic rename
    publish — see :func:`txn_feed_advance`). An empty window returns
    an empty frame with the full CDF schema.
    """
    versions = _list_versions(spark, path)  # one log listing per call
    latest = versions[-1] if versions else None
    if latest is None:
        raise FileNotFoundError(f"no transactional table at {path}")
    last = _read_cursor(spark, cursor_path)
    if last is None:
        snap = txn_read(spark, path, latest)
        return (
            snap.select(
                F.lit("insert").alias("_change_type"), *snap.columns
            ),
            latest,
        )
    if last == latest:
        empty = txn_read(spark, path, latest).where(F.lit(False))
        return (
            empty.select(
                F.lit("insert").alias("_change_type"), *empty.columns
            ),
            latest,
        )
    if last > latest:
        raise ValueError(
            f"cursor at version {last} is ahead of table version "
            f"{latest} — was the table restored/recreated under the "
            f"consumer?"
        )
    if last not in versions:
        raise ValueError(
            f"cursor version {last} was vacuumed from {path} — the "
            f"retention horizon passed this consumer; re-bootstrap "
            f"(clear the cursor for a full-snapshot first call) and "
            f"size txn_vacuum keep_versions above the slowest "
            f"consumer's lag"
        )
    return txn_changes(spark, path, list(keys), last, latest), latest


def txn_restore(spark: SparkSession, path: str, version: int) -> int:
    """RESTORE analog: roll the table back to ``version`` by committing
    a NEW version whose manifest replays the old one — history moves
    forward only (the rolled-back versions stay readable until
    :func:`txn_vacuum`), so concurrent readers never see the log
    shrink, and a racing writer loses the ordinary version race.
    Returns the new version number.
    """
    versions = _list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no transactional table at {path}")
    if version not in versions:
        raise ValueError(
            f"version {version} not in table history {versions}"
        )
    m = _read_manifest(spark, path, version)
    new_v = versions[-1] + 1
    _commit(spark, path, new_v, m)
    return new_v
