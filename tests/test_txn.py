"""Manifest-log transactional tables: snapshot isolation, optimistic
concurrency, partition-selective merge, time travel, vacuum.

The contract under test is the one SCALE.md §9b promises: a reader
that resolved a version is never affected by later commits, exactly
one of two racing committers wins, and a partitioned merge rewrites
only the partition values it touches (reference analog: Postgres
transactional DML, database-schema.sql:202-231).
"""

from __future__ import annotations

import glob
import os

import pytest

from etl_workflow_spark.sources import txn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    assert txn.txn_create(spark, path, df) == 1
    assert _rows(txn.txn_read(spark, path)) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError):
        txn.txn_create(spark, path, df)


def test_merge_upsert_and_history(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    src = spark.createDataFrame([(2, 21), (3, 30)], ["id", "v"])
    assert txn.txn_merge_into(spark, path, src, ["id"]) == (1, 1)
    assert _rows(txn.txn_read(spark, path)) == [(1, 10), (2, 21), (3, 30)]
    assert txn.txn_history(spark, path) == [1, 2]


def test_snapshot_isolation_old_version_unchanged(spark, tmp_path):
    """A frame resolved at version 1 must keep returning version-1 data
    after version 2 commits — the property the rename-swap path cannot
    provide."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    pinned = txn.txn_read(spark, path, version=1)
    txn.txn_merge_into(
        spark, path, spark.createDataFrame([(1, 99)], ["id", "v"]), ["id"]
    )
    assert _rows(pinned) == [(1, 10)]                     # pre-resolved
    assert _rows(txn.txn_read(spark, path, version=1)) == [(1, 10)]
    assert _rows(txn.txn_read(spark, path)) == [(1, 99)]  # latest


def test_commit_race_exactly_one_winner(spark, tmp_path):
    """Two committers targeting the same next version: the second
    rename hits an existing manifest and raises instead of clobbering."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    m = txn._read_manifest(spark, path, 1)
    txn._commit(spark, path, 2, m)  # writer A wins version 2
    with pytest.raises(txn.ConcurrentWriteError):
        txn._commit(spark, path, 2, m)  # writer B must lose
    assert txn.txn_history(spark, path) == [1, 2]


def test_partitioned_merge_rewrites_only_affected(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "2024-01", 10), (2, "2024-02", 20), (3, "2024-03", 30)],
            ["id", "month", "v"],
        ),
        partition_col="month",
    )
    v1_dir = txn._read_manifest(spark, path, 1)["entries"][0]["dir"]
    before = set(
        glob.glob(os.path.join(path, "_data", v1_dir, "month=2024-03", "*"))
    )

    src = spark.createDataFrame(
        [(2, "2024-02", 21), (4, "2024-01", 40)], ["id", "month", "v"]
    )
    assert txn.txn_merge_into(spark, path, src, ["id"]) == (1, 1)
    assert _rows(txn.txn_read(spark, path)) == [
        (1, "2024-01", 10),
        (2, "2024-02", 21),
        (3, "2024-03", 30),
        (4, "2024-01", 40),
    ]
    m2 = txn._read_manifest(spark, path, 2)
    # the surviving entry still points at the ORIGINAL dir, narrowed to
    # the untouched partition; its files were not rewritten
    survivors = [e for e in m2["entries"] if e["dir"] == v1_dir]
    assert survivors and survivors[0]["partitions"] == ["2024-03"]
    after = set(
        glob.glob(os.path.join(path, "_data", v1_dir, "month=2024-03", "*"))
    )
    assert after == before


def test_partitioned_merge_moves_row_across_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "2024-01", 10), (2, "2024-02", 20)], ["id", "month", "v"]
        ),
        partition_col="month",
    )
    src = spark.createDataFrame([(1, "2024-02", 11)], ["id", "month", "v"])
    assert txn.txn_merge_into(spark, path, src, ["id"]) == (1, 0)
    assert _rows(txn.txn_read(spark, path)) == [
        (1, "2024-02", 11),
        (2, "2024-02", 20),
    ]


def test_txn_read_prunes_partitions(spark, tmp_path):
    """A partition predicate over txn_read must prune at the directory
    level inside each entry dir (hive layout + PartitionFilters), not
    scan the whole table — the property that keeps snapshot reads
    O(touched partitions) at scale."""
    from etl_workflow_spark.plans import formatted_plan

    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"2024-{m:02d}", i) for m in (1, 2, 3) for i in range(m, 10)],
            ["id", "month", "v"],
        ),
        partition_col="month",
    )
    q = txn.txn_read(spark, path).where("month = '2024-02'")
    plan = formatted_plan(q)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("2024-02" in ln or "month" in ln for ln in pf)
    assert _rows(q) == sorted((i, "2024-02", i) for i in range(2, 10))


def test_vacuum_drops_unreferenced_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    for v in (11, 12, 13):
        txn.txn_merge_into(
            spark, path, spark.createDataFrame([(1, v)], ["id", "v"]), ["id"]
        )
    assert txn.txn_history(spark, path) == [1, 2, 3, 4]
    # min_age_sec=0: everything here is seconds old; production keeps
    # the default so an in-flight writer's staged dir survives
    removed = txn.txn_vacuum(spark, path, keep_versions=2, min_age_sec=0)
    assert len(removed) == 2  # versions 1 and 2's dirs
    assert txn.txn_history(spark, path) == [3, 4]
    # surviving versions still read
    assert _rows(txn.txn_read(spark, path, version=3)) == [(1, 12)]
    assert _rows(txn.txn_read(spark, path)) == [(1, 13)]
    live = {
        e["dir"]
        for v in (3, 4)
        for e in txn._read_manifest(spark, path, v)["entries"]
    }
    on_disk = set(os.listdir(os.path.join(path, "_data")))
    assert on_disk == live


def test_txn_compact_collapses_entries_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], ["id", "grp", "v"]
        ),
        partition_col="grp",
    )
    for oid, grp, v in [(3, "a", 30), (4, "b", 40), (5, "a", 50)]:
        txn.txn_merge_into(
            spark,
            path,
            spark.createDataFrame([(oid, grp, v)], ["id", "grp", "v"]),
            ["id"],
        )
    before = sorted(tuple(r) for r in txn.txn_read(spark, path).collect())
    assert len(txn._read_manifest(
        spark, path, txn.latest_version(spark, path))["entries"]) > 1

    new_v = txn.txn_compact(spark, path)
    m = txn._read_manifest(spark, path, new_v)
    assert len(m["entries"]) == 1
    assert sorted(
        tuple(r) for r in txn.txn_read(spark, path).collect()
    ) == before
    # pre-compaction snapshot still time-travels
    assert sorted(
        tuple(r) for r in txn.txn_read(spark, path, version=new_v - 1).collect()
    ) == before


def test_merge_schema_evolution_adds_column_without_rewrite(spark, tmp_path):
    """evolve_schema=True appends a source-only column; untouched
    partitions' files are NOT rewritten and read the new column as
    NULL (ADD COLUMN is metadata-only for historical data)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], ["id", "grp", "v"]
        ),
        partition_col="grp",
    )
    v1_dir = txn._read_manifest(spark, path, 1)["entries"][0]["dir"]
    before = set(
        glob.glob(os.path.join(path, "_data", v1_dir, "grp=b", "*"))
    )

    src = spark.createDataFrame(
        [(1, "a", 11, "note-1"), (3, "a", 30, "note-3")],
        ["id", "grp", "v", "note"],
    )
    assert txn.txn_merge_into(
        spark, path, src, ["id"], evolve_schema=True
    ) == (1, 1)
    got = _rows(txn.txn_read(spark, path))
    assert got == [
        (1, "a", 11, "note-1"),
        (2, "b", 20, None),       # historical row: NULL-extended
        (3, "a", 30, "note-3"),
    ]
    after = set(
        glob.glob(os.path.join(path, "_data", v1_dir, "grp=b", "*"))
    )
    assert after == before  # grp=b never rewritten
    # and without the flag, an extra column is an error (no silent drop)
    with pytest.raises(Exception):
        txn.txn_merge_into(
            spark,
            path,
            spark.createDataFrame([(9, "a", 1, "x", True)],
                                  ["id", "grp", "v", "note", "flag"]),
            ["id"],
        )


def test_txn_changes_reports_value_level_diff(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)], ["id", "grp", "v"]
        ),
        partition_col="grp",
    )
    # v2: update id=2, insert id=4; id=1 is "touched" by the affected-
    # partition rewrite but its VALUES are unchanged -> no change row
    txn.txn_merge_into(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 21), (4, "a", 40)], ["id", "grp", "v"]
        ),
        ["id"],
    )
    changes = {
        (r["_change_type"], r["id"]): (r["grp"], r["v"])
        for r in txn.txn_changes(spark, path, ["id"], 1, 2).collect()
    }
    assert changes == {
        ("update_postimage", 2): ("a", 21),
        ("insert", 4): ("a", 40),
    }


def test_txn_changes_detects_deletes_via_compacted_rewrite(spark, tmp_path):
    """A full-rewrite commit that drops a key must surface as a delete
    carrying the OLD values."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    # manual "delete" commit: rewrite without id=2
    d, parts = txn._write_data(
        spark.createDataFrame([(1, 10)], ["id", "v"]), path, None
    )
    m = txn._read_manifest(spark, path, 1)
    txn._commit(spark, path, 2, {**m, "entries": [
        {"dir": d, "partitions": parts}]})
    rows = {
        (r["_change_type"], r["id"], r["v"])
        for r in txn.txn_changes(spark, path, ["id"], 1, 2).collect()
    }
    assert rows == {("delete", 2, 20)}


def test_txn_restore_rolls_forward_to_old_snapshot(spark, tmp_path):
    path = str(tmp_path / "restore_tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    txn.txn_create(spark, path, df1)
    txn.txn_merge_into(
        spark, path,
        spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"]),
        ["id"],
    )
    v_before = txn.latest_version(spark, path)
    restored_v = txn.txn_restore(spark, path, 1)
    assert restored_v == v_before + 1
    # latest snapshot == version-1 snapshot, and history only grew
    now = {(r["id"], r["v"]) for r in txn.txn_read(spark, path).collect()}
    assert now == {(1, "a"), (2, "b")}
    # the rolled-back version is still time-travel readable
    mid = {(r["id"], r["v"]) for r in txn.txn_read(spark, path, v_before).collect()}
    assert mid == {(1, "a"), (2, "B"), (3, "c")}
    assert txn.txn_history(spark, path) == [1, 2, restored_v]


def test_txn_restore_unknown_version_raises(spark, tmp_path):
    path = str(tmp_path / "restore_bad")
    txn.txn_create(spark, path, spark.createDataFrame([(1, "a")], ["id", "v"]))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        txn.txn_restore(spark, path, 99)


def test_unified_merge_into_routes_txn_tables_through_the_log(spark, tmp_path):
    """writers.merge_into on a transactional target must commit through
    the manifest log (version bump, snapshot isolation) — one mutation
    API, no accidental staged-swap on a txn table."""
    from etl_workflow_spark.sources.writers import merge_into

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    src = spark.createDataFrame([(2, 21), (3, 30)], ["id", "v"])
    assert merge_into(spark, path, src, ["id"]) == (1, 1)
    assert txn.txn_history(spark, path) == [1, 2]
    assert _rows(txn.txn_read(spark, path)) == [(1, 10), (2, 21), (3, 30)]
    # the pre-merge snapshot is untouched — the swap path would have
    # rewritten the live dir in place
    assert _rows(txn.txn_read(spark, path, version=1)) == [(1, 10), (2, 20)]


def test_update_rows_txn_sets_column_to_null(spark, tmp_path):
    """ADVICE r8: updates={field: None} must set NULL on a txn table —
    F.lit(None) is void-typed and a typeless NULL casts losslessly to
    the recorded type; previously _conform_types raised while the
    plain-parquet branch of the same unified entry point set NULL fine."""
    from etl_workflow_spark.sources.writers import update_rows

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    assert update_rows(spark, path, "id", 2, {"v": None}) == 1
    got = {r.id: r.v for r in txn.txn_read(spark, path).collect()}
    assert got == {1: 10, 2: None}
    # recorded column type is unchanged by the NULL write
    assert dict(txn.txn_read(spark, path).dtypes)["v"] == "bigint"


def test_unified_update_rows_routes_txn_tables_through_the_log(spark, tmp_path):
    from etl_workflow_spark.sources.writers import update_rows

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    assert update_rows(spark, path, "id", 2, {"v": 99}) == 1
    assert update_rows(spark, path, "id", 7, {"v": 1}) == 0  # no match, no commit
    assert txn.txn_history(spark, path) == [1, 2]
    got = {r.id: (r.v, r.updated_at) for r in txn.txn_read(spark, path).collect()}
    assert got[1][0] == 10 and got[1][1] is None
    assert got[2][0] == 99 and got[2][1] is not None


def test_txn_append_insert_if_absent_and_replay(spark, tmp_path):
    """txn_append with keys is ON CONFLICT DO NOTHING: existing keys
    drop, replays converge, each effective append is one version, and
    the pre-append snapshot stays readable."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    batch = spark.createDataFrame([(2, 99), (3, 30), (3, 31)], ["id", "v"])
    n = txn.txn_append(spark, path, batch, keys=["id"])
    assert n == 1  # id 2 exists; ids 3,3 dedupe to one row
    assert txn.txn_history(spark, path) == [1, 2]
    got = {r.id: r.v for r in txn.txn_read(spark, path).collect()}
    assert got[1] == 10 and got[2] == 20 and got[3] in (30, 31)
    # replay: nothing appended, no version burned
    assert txn.txn_append(spark, path, batch, keys=["id"]) == 0
    assert txn.txn_history(spark, path) == [1, 2]
    assert _rows(txn.txn_read(spark, path, version=1)) == [(1, 10), (2, 20)]


def test_unified_idempotent_append_routes_txn_tables(spark, tmp_path):
    from etl_workflow_spark.sources.writers import idempotent_append

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    batch = spark.createDataFrame([(1, 11), (2, 20)], ["id", "v"])
    assert idempotent_append(spark, batch, path, ["id"]) == 1
    assert txn.txn_history(spark, path) == [1, 2]
    assert _rows(txn.txn_read(spark, path)) == [(1, 10), (2, 20)]


def test_txn_append_partitioned_adds_entry_without_shadowing(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "p"]),
        partition_col="p",
    )
    n = txn.txn_append(
        spark,
        path,
        spark.createDataFrame([(3, "a"), (4, "c")], ["id", "p"]),
        keys=["id"],
    )
    assert n == 2
    got = sorted((r.id, r.p) for r in txn.txn_read(spark, path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "a"), (4, "c")]


def test_stream_txn_append_exactly_once(spark, tmp_path):
    """A real availableNow stream committing through txn_append: every
    row lands exactly once, each effective micro-batch is one atomic
    version, and re-running the whole stream over the same files
    appends nothing."""
    from etl_workflow_spark.streaming.incremental import stream_txn_append

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    ).repartition(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(100, "seed")], ["id", "v"])
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream_txn_append(stream, path, str(tmp_path / ckpt), ["id"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt1")
    rows = txn.txn_read(spark, path).collect()
    assert len(rows) == 21 and len({r.id for r in rows}) == 21
    versions_after_first = txn.txn_history(spark, path)
    assert len(versions_after_first) >= 2  # seed + >=1 batch commit

    # fresh checkpoint, same files: the key anti-join keeps the table
    # identical and burns no versions
    run("ckpt2")
    assert len(txn.txn_read(spark, path).collect()) == 21
    assert txn.txn_history(spark, path) == versions_after_first


def test_lost_race_merge_releases_persists(spark, tmp_path, monkeypatch):
    """txn_merge_into persists its source (and kept rows); a lost
    commit race raises ConcurrentWriteError BY DESIGN, and the retry
    loop re-enters — the try/finally must release the persists on the
    raise path or every lost race leaks one cached copy."""
    from tests.test_neardup import _non_checkpoint_persists

    spark.catalog.clearCache()
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )

    def losing_commit(spark_, path_, version, manifest):
        raise txn.ConcurrentWriteError("simulated lost race")

    monkeypatch.setattr(txn, "_commit", losing_commit)
    src = spark.createDataFrame([(1, 11), (2, 20)], ["id", "v"])
    with pytest.raises(txn.ConcurrentWriteError):
        txn.txn_merge_into(spark, path, src, ["id"])
    assert _non_checkpoint_persists(spark) == []

    # partitioned branch persists `kept` too
    monkeypatch.undo()
    ppath = str(tmp_path / "tp")
    txn.txn_create(
        spark,
        ppath,
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["id", "p", "v"]),
        partition_col="p",
    )
    monkeypatch.setattr(txn, "_commit", losing_commit)
    with pytest.raises(txn.ConcurrentWriteError):
        txn.txn_merge_into(
            spark,
            ppath,
            spark.createDataFrame([(1, "a", 11)], ["id", "p", "v"]),
            ["id"],
        )
    assert _non_checkpoint_persists(spark) == []


def test_txn_retry_recovers_from_lost_races(spark, monkeypatch):
    """txn_retry re-runs the transaction after ConcurrentWriteError (up
    to the attempt bound) and re-raises once exhausted."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise txn.ConcurrentWriteError("lost race")
        return "committed"

    assert txn.txn_retry(flaky, attempts=5, backoff_sec=0.0) == "committed"
    assert calls["n"] == 3

    calls["n"] = 0
    with pytest.raises(txn.ConcurrentWriteError):
        txn.txn_retry(flaky, attempts=2, backoff_sec=0.0)
    assert calls["n"] == 2


def test_stream_txn_append_survives_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """A commit race mid-stream (e.g. a parallel compaction winning the
    version) must not kill the streaming query: the sink retries and
    the table still ends exactly-once."""
    from etl_workflow_spark.streaming import incremental as inc

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    ).repartition(3).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(100, "seed")], ["id", "v"])
    )

    real_append = txn.txn_append
    fails = {"left": 2}

    def racing_append(*args, **kwargs):
        if fails["left"] > 0:
            fails["left"] -= 1
            raise txn.ConcurrentWriteError("simulated racer won")
        return real_append(*args, **kwargs)

    monkeypatch.setattr(
        "etl_workflow_spark.sources.txn.txn_append", racing_append
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        inc.stream_txn_append(stream, path, str(tmp_path / "ckpt"), ["id"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert fails["left"] == 0  # the race actually happened
    rows = txn.txn_read(spark, path).collect()
    assert len(rows) == 7 and len({r.id for r in rows}) == 7


def test_stream_txn_append_auto_compacts_entry_growth(spark, tmp_path):
    """A long-running sink adds one manifest entry per micro-batch;
    the auto-compaction policy keeps the entry count bounded while a
    reader pinned to an old version is unaffected."""
    from etl_workflow_spark.streaming.incremental import stream_txn_append

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "id long, v string"
    ).repartition(12).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(100, "seed")], ["id", "v"])
    )
    pinned = txn.txn_read(spark, path, version=1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_txn_append(
            stream, path, str(tmp_path / "ckpt"), ["id"],
            auto_compact_entries=3,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    v = txn.latest_version(spark, path)
    entries = txn._read_manifest(spark, path, v)["entries"]
    # every batch past 3 entries triggers a compact back to 1, so the
    # steady-state count stays within policy + 1 in-flight batch
    assert len(entries) <= 4, f"{len(entries)} entries survived the policy"
    rows = txn.txn_read(spark, path).collect()
    assert len(rows) == 13 and len({r.id for r in rows}) == 13
    assert _rows(pinned) == [(100, "seed")]  # old version untouched


def test_replace_where_deletes_and_inserts_atomically(spark, tmp_path):
    """replace_where swaps an exact row SET: matching rows go, the
    replacement arrives, NULL-evaluating rows are kept (SQL DELETE
    semantics), all in one version."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, None)], "id long, v long"
        ),
    )
    from pyspark.sql import functions as F

    deleted, inserted = txn.txn_replace_where(
        spark,
        path,
        F.col("v") < 15,  # NULL v -> condition NULL -> row kept
        spark.createDataFrame([(9, 90), (9, 90)], "id long, v long"),
    )
    assert (deleted, inserted) == (1, 2)
    assert _rows(txn.txn_read(spark, path)) == [
        (2, 20), (3, None), (9, 90), (9, 90)]
    assert txn.txn_history(spark, path) == [1, 2]


def test_replace_where_partitioned_rewrites_only_affected(spark, tmp_path):
    """Partitions with no matching/replacement row keep their original
    data dir — the affected-partition contract of merge."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            ["id", "p", "v"],
        ),
        partition_col="p",
    )
    from pyspark.sql import functions as F

    m1 = txn._read_manifest(spark, path, 1)
    deleted, inserted = txn.txn_replace_where(
        spark, path, F.col("p") == "a",
        spark.createDataFrame([(7, "a", 70)], ["id", "p", "v"]),
    )
    assert (deleted, inserted) == (1, 1)
    m2 = txn._read_manifest(spark, path, 2)
    # the original entry survives, stripped of 'a'; one new entry
    surviving = [e for e in m2["entries"] if e["dir"] == m1["entries"][0]["dir"]]
    assert surviving and sorted(surviving[0]["partitions"]) == ["b", "c"]
    assert _rows(txn.txn_read(spark, path)) == [
        (2, "b", 20), (3, "c", 30), (7, "a", 70)]


def test_txn_delete_all_rows_leaves_readable_empty_table(spark, tmp_path):
    """Deleting every row must not commit an unreadable empty data dir:
    the manifest ends with zero entries and reads as an empty frame
    with the original schema."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    from pyspark.sql import functions as F

    assert txn.txn_delete(spark, path, F.lit(True)) == 2
    empty = txn.txn_read(spark, path)
    assert empty.count() == 0
    assert empty.columns == ["id", "v"]
    # and the table accepts new rows afterwards
    txn.txn_append(spark, path, spark.createDataFrame([(5, 50)], ["id", "v"]))
    assert _rows(txn.txn_read(spark, path)) == [(5, 50)]


def test_update_rows_txn_preserves_duplicate_key_rows(spark, tmp_path):
    """ADVICE r7: update_rows on a txn table with a NON-unique key must
    update all N matching rows in place (like the parquet branch), not
    collapse them to one through the keyed merge."""
    from etl_workflow_spark.sources.writers import update_rows

    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "x", 10), (1, "y", 20), (2, "z", 30)],
            ["id", "tag", "v"],
        ),
    )
    matched = update_rows(spark, path, "id", 1, {"v": 99})
    assert matched == 2
    rows = txn.txn_read(spark, path).select("id", "tag", "v").collect()
    got = sorted((r.id, r.tag, r.v) for r in rows)
    assert got == [(1, "x", 99), (1, "y", 99), (2, "z", 30)]
    # updated_at stamped on the touched rows only
    stamped = {
        r.tag: r.updated_at is not None
        for r in txn.txn_read(spark, path).collect()
    }
    assert stamped == {"x": True, "y": True, "z": False}


# ------------------------------------------------------------ key stats


def test_append_records_and_prunes_on_key_stats(spark, tmp_path):
    """Each append records its key [min, max]; a later batch's conflict
    anti-join provably skips entries with disjoint ranges while a
    genuinely overlapping batch still dedups correctly."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]),
        stats_cols=["id"],
    )
    txn.txn_append(
        spark, path,
        spark.createDataFrame([(10, "j"), (11, "k")], ["id", "v"]),
        keys=["id"],
    )
    m = txn._read_manifest(spark, path, 2)
    assert m["entries"][0]["stats"]["id"] == [1, 2]
    assert m["entries"][1]["stats"]["id"] == [10, 11]

    # disjoint batch: every entry is provably prunable
    stats, _, _ = txn._batch_key_stats(
        spark.createDataFrame([(100, "z")], ["id", "v"]), ["id"], None
    )
    cand = [e for e in m["entries"]
            if txn._may_intersect(e, ["id"], stats, None)]
    assert cand == []

    # overlapping batch: only the intersecting entry is read, and the
    # conflict with id=10 is still caught
    stats2, _, _ = txn._batch_key_stats(
        spark.createDataFrame([(10, "dup"), (12, "new")], ["id", "v"]),
        ["id"], None,
    )
    cand2 = [e for e in m["entries"]
             if txn._may_intersect(e, ["id"], stats2, None)]
    assert [e["dir"] for e in cand2] == [m["entries"][1]["dir"]]
    n = txn.txn_append(
        spark, path,
        spark.createDataFrame([(10, "dup"), (12, "new")], ["id", "v"]),
        keys=["id"],
    )
    assert n == 1  # id=10 dropped via the pruned anti-join
    assert sorted(r.id for r in txn.txn_read(spark, path).collect()) == [
        1, 2, 10, 11, 12]


def test_entries_without_stats_are_always_read(spark, tmp_path):
    """Pre-stats history (or non-stats-able key types) must never be
    pruned: conflicts in a stats-less entry are still caught."""
    path = str(tmp_path / "t")
    txn.txn_create(  # no stats_cols -> entry carries no stats
        spark, path, spark.createDataFrame([(1, "a")], ["id", "v"])
    )
    m = txn._read_manifest(spark, path, 1)
    assert "stats" not in m["entries"][0]
    n = txn.txn_append(
        spark, path,
        spark.createDataFrame([(1, "dup"), (2, "new")], ["id", "v"]),
        keys=["id"],
    )
    assert n == 1


def test_partition_pruning_only_when_pcol_is_a_key(spark, tmp_path):
    """A key conflict in ANOTHER partition must still be caught when
    the partition column is not part of the key (partition pruning
    would be unsound there), and partition-value stats still encode
    NULLs correctly."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "p1", 10), (2, None, 20)], ["id", "p", "v"]
        ),
        partition_col="p",
    )
    # batch in partition p2 but with the EXISTING id=1: must be dropped
    n = txn.txn_append(
        spark, path,
        spark.createDataFrame([(1, "p2", 99), (3, None, 30)],
                              ["id", "p", "v"]),
        keys=["id"],
    )
    assert n == 1
    rows = sorted((r.id, r.p) for r in txn.txn_read(spark, path).collect())
    assert rows == [(1, "p1"), (2, None), (3, None)]

    # NULL partition round-trips through the stats encoding
    stats, parts, _ = txn._batch_key_stats(
        spark.createDataFrame([(5, None, 1), (6, "x", 2)],
                              ["id", "p", "v"]),
        ["id", "p"], "p",
    )
    assert parts is not None and txn._NULL_PARTITION in parts and "x" in parts


def test_merge_and_compact_carry_key_stats(spark, tmp_path):
    """Merge records stats on its rewritten entry; compaction merges
    entry stats without a scan (min of mins / max of maxes)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]),
        stats_cols=["id"],
    )
    txn.txn_merge_into(
        spark, path,
        spark.createDataFrame([(2, 21), (50, 500)], ["id", "v"]), ["id"]
    )
    m = txn._read_manifest(spark, path, 2)
    assert m["entries"][-1]["stats"]["id"] == [1, 50]

    txn.txn_append(
        spark, path, spark.createDataFrame([(99, 990)], ["id", "v"]),
        keys=["id"],
    )
    txn.txn_compact(spark, path)
    mc = txn._read_manifest(spark, path, txn.latest_version(spark, path))
    assert len(mc["entries"]) == 1
    assert mc["entries"][0]["stats"]["id"] == [1, 99]


def test_txn_compact_sorted_produces_narrow_row_groups(spark, tmp_path):
    """OPTIMIZE-with-sort analog: after txn_compact(sort_cols), the
    compacted entry's parquet row-group min/max ranges on the sort
    column are disjoint, so range predicates skip row groups."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    df = (
        spark.range(0, 4000)
        .selectExpr("id", "CAST(pmod(id * 2654435761, 4000) AS LONG) AS k")
    )
    txn.txn_create(spark, path, df)
    # several appends -> several entries, k unsorted everywhere
    for i in range(2):
        txn.txn_append(
            spark, path,
            spark.range(4000 + i * 1000, 5000 + i * 1000).selectExpr(
                "id", "CAST(pmod(id * 2654435761, 4000) AS LONG) AS k"
            ),
        )
    v = txn.txn_compact(spark, path, target_files=4, sort_cols=["k"])
    m = txn._read_manifest(spark, path, v)
    assert len(m["entries"]) == 1
    files = glob.glob(
        f"{path}/_data/{m['entries'][0]['dir']}/*.parquet"
    )
    assert len(files) >= 2
    ranges = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = [meta.schema.column(i).name
               for i in range(meta.num_columns)].index("k")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            ranges.append((st.min, st.max))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping row-group ranges {ranges}"
    # and the data survived intact
    assert txn.txn_read(spark, path).count() == 6000


def test_txn_compact_zorder_roundtrip(spark, tmp_path):
    """ZORDER compaction preserves the row set and commits one entry;
    the z-arrangement machinery itself is covered by the writers
    layout tests."""
    path = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(pmod(id * 37, 500) AS DOUBLE) AS x",
        "CAST(pmod(id * 101, 500) AS DOUBLE) AS y",
    )
    txn.txn_create(spark, path, df)
    v = txn.txn_compact(spark, path, target_files=8, zorder_cols=["x", "y"])
    m = txn._read_manifest(spark, path, v)
    assert len(m["entries"]) == 1
    out = txn.txn_read(spark, path)
    assert out.count() == 2000 and "_zval" not in out.columns
    with pytest.raises(ValueError):
        txn.txn_compact(spark, path, sort_cols=["x"], zorder_cols=["y"])


def test_txn_feed_cursor_lifecycle(spark, tmp_path):
    """First call = full snapshot as inserts; advance; empty window;
    after a merge the feed carries exactly the delta; a cursor ahead of
    the table fails loudly."""
    path = str(tmp_path / "t")
    cur = str(tmp_path / "cursor.json")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    feed, v1 = txn.txn_feed(spark, path, ["id"], cur)
    rows = sorted((r._change_type, r.id, r.v) for r in feed.collect())
    assert rows == [("insert", 1, 10), ("insert", 2, 20)] and v1 == 1
    txn.txn_feed_advance(spark, cur, v1)

    feed2, v2 = txn.txn_feed(spark, path, ["id"], cur)
    assert feed2.count() == 0 and v2 == 1

    txn.txn_merge_into(
        spark, path,
        spark.createDataFrame([(2, 21), (3, 30)], ["id", "v"]), ["id"],
    )
    feed3, v3 = txn.txn_feed(spark, path, ["id"], cur)
    rows3 = sorted((r._change_type, r.id, r.v) for r in feed3.collect())
    assert rows3 == [("insert", 3, 30), ("update_postimage", 2, 21)]
    assert v3 == 2
    # replay before advance: same window again (at-least-once)
    feed3b, _ = txn.txn_feed(spark, path, ["id"], cur)
    assert sorted(map(tuple, feed3b.collect())) == sorted(
        map(tuple, feed3.collect())
    )
    txn.txn_feed_advance(spark, cur, v3)

    txn.txn_feed_advance(spark, cur, 99)
    with pytest.raises(ValueError):
        txn.txn_feed(spark, path, ["id"], cur)


def test_merge_strict_source_rejects_duplicate_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    dup = spark.createDataFrame([(1, 11), (1, 12)], ["id", "v"])
    with pytest.raises(ValueError, match="duplicate"):
        txn.txn_merge_into(spark, path, dup, ["id"], strict_source=True)
    # default keeps the collapse-to-one contract
    upd, ins = txn.txn_merge_into(spark, path, dup, ["id"])
    assert (upd, ins) == (1, 0)


def test_txn_feed_drives_cdc_matview_refresh(spark, tmp_path):
    """End-to-end CDC loop with NO consumer-side version bookkeeping:
    the persisted txn_feed cursor supplies the refresh window, the
    matview lands exactly at the full-recompute answer, and a replay
    (crash before advance) or closed window refreshes nothing new."""
    from etl_workflow_spark.operators.etl import (
        product_sales_summary,
        refresh_product_summary_from_changes,
    )
    from etl_workflow_spark.sources.writers import overwrite

    cats = spark.createDataFrame([(1, "c")], ["category_id", "category_name"])
    prods = spark.createDataFrame(
        [(1, 1, "p1"), (2, 1, "p2")], ["product_id", "category_id", "name"]
    )
    items = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0), (2, 2, 2, 2, 20.0), (3, 3, 2, 1, 30.0)],
        ["order_item_id", "order_id", "product_id", "quantity", "total"],
    )
    orders_v1 = spark.createDataFrame(
        [(1, 10, "2024-01-01", "Delivered"),
         (2, 11, "2024-01-02", "Delivered")],
        ["order_id", "customer_id", "order_date", "status"],
    )
    orders_path = str(tmp_path / "orders_txn")
    cur = str(tmp_path / "summary_cursor.json")
    txn.txn_create(spark, orders_path, orders_v1)
    summary_path = str(tmp_path / "summary")

    # bootstrap: first feed call IS the initial snapshot; build the
    # matview from it and advance
    feed, v = txn.txn_feed(spark, orders_path, ["order_id"], cur)
    assert feed.count() == 2 and v == 1
    overwrite(
        product_sales_summary(prods, cats, items, feed.drop("_change_type")),
        summary_path,
    )
    txn.txn_feed_advance(spark, cur, v)

    txn.txn_merge_into(
        spark,
        orders_path,
        spark.createDataFrame(
            [(2, 11, "2024-01-02", "Cancelled"),
             (3, 12, "2024-01-03", "Delivered")],
            orders_v1.schema,
        ),
        ["order_id"],
    )
    last = txn._read_cursor(spark, cur)
    _, latest = txn.txn_feed(spark, orders_path, ["order_id"], cur)
    n = refresh_product_summary_from_changes(
        spark, orders_path, summary_path, prods, cats, items,
        from_version=last, to_version=latest,
    )
    assert n == 1
    txn.txn_feed_advance(spark, cur, latest)

    want = sorted(
        tuple(r)
        for r in product_sales_summary(
            prods, cats, items, txn.txn_read(spark, orders_path)
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(summary_path).collect())
    assert got == want

    # closed window via the cursor: no-op refresh
    last2 = txn._read_cursor(spark, cur)
    feed2, latest2 = txn.txn_feed(spark, orders_path, ["order_id"], cur)
    assert feed2.count() == 0 and latest2 == last2
    assert refresh_product_summary_from_changes(
        spark, orders_path, summary_path, prods, cats, items,
        from_version=last2, to_version=latest2,
    ) == 0


def test_vacuum_age_guard_spares_staged_uncommitted_dirs(spark, tmp_path):
    """An in-flight writer stages its data dir BEFORE committing the
    manifest; a concurrent vacuum must not delete a young unreferenced
    dir out from under it (the uncommitted-file retention contract)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    for v in (11, 12, 13):
        txn.txn_merge_into(
            spark, path, spark.createDataFrame([(1, v)], ["id", "v"]), ["id"]
        )
    # simulate a writer mid-commit: a staged, not-yet-referenced dir
    staged_d, _ = txn._write_data(
        spark.createDataFrame([(9, 90)], ["id", "v"]), path, None
    )
    removed = txn.txn_vacuum(spark, path, keep_versions=2)  # default age
    assert removed == []  # everything is too young to touch
    assert staged_d in set(os.listdir(os.path.join(path, "_data")))
    # age-blind mode still spares it once referenced by a commit
    m = txn._read_manifest(spark, path, 4)
    m2 = dict(m, entries=list(m["entries"]) + [
        {"dir": staged_d, "partitions": None}])
    txn._commit(spark, path, 5, m2)
    removed = txn.txn_vacuum(spark, path, keep_versions=1, min_age_sec=0)
    assert staged_d not in removed
    assert sorted((r.id, r.v) for r in txn.txn_read(spark, path).collect()) \
        == [(1, 13), (9, 90)]


def test_compact_recovers_stats_from_statsless_entries(spark, tmp_path):
    """One statsless entry (keyless create — the streaming-sink setup
    path) must not strip stats from the compacted table: columns the
    other entries track are recomputed from the written dir."""
    path = str(tmp_path / "t")
    txn.txn_create(  # NO stats_cols
        spark, path, spark.createDataFrame([(1, "a")], ["id", "v"])
    )
    txn.txn_append(
        spark, path, spark.createDataFrame([(5, "e")], ["id", "v"]),
        keys=["id"],
    )
    v = txn.txn_compact(spark, path)
    m = txn._read_manifest(spark, path, v)
    assert m["entries"][0]["stats"]["id"] == [1, 5]


def test_replace_where_rewrite_keeps_tracked_stats(spark, tmp_path):
    """update_rows/replace_where rewrites re-record stats for whatever
    columns the table tracks, so the rewritten entry stays prunable."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path,
        spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]),
        stats_cols=["id"],
    )
    from pyspark.sql import functions as F

    txn.txn_replace_where(
        spark, path, F.col("id") == 2,
        spark.createDataFrame([(7, 70)], ["id", "v"]),
    )
    m = txn._read_manifest(spark, path, 2)
    assert m["entries"][-1]["stats"]["id"] == [1, 7]


def test_append_composite_key_stats_prune_per_column(spark, tmp_path):
    """Composite keys: range disjointness on ANY key column suffices to
    prune (equality needs every column), and conflicts are still exact
    on the full key tuple."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "x", 10), (2, "y", 20)], ["id", "tag", "v"]
        ),
        stats_cols=["id", "tag"],
    )
    m = txn._read_manifest(spark, path, 1)
    assert m["entries"][0]["stats"] == {"id": [1, 2], "tag": ["x", "y"]}

    # same ids, different tag range -> provably disjoint on `tag`
    stats, _, _ = txn._batch_key_stats(
        spark.createDataFrame([(1, "zz", 1)], ["id", "tag", "v"]),
        ["id", "tag"], None,
    )
    assert not txn._may_intersect(m["entries"][0], ["id", "tag"], stats, None)

    # (1, "x") is a real conflict, (1, "z") is not: tuple-exact dedup
    n = txn.txn_append(
        spark, path,
        spark.createDataFrame(
            [(1, "x", 99), (1, "z", 30)], ["id", "tag", "v"]
        ),
        keys=["id", "tag"],
    )
    assert n == 1
    got = sorted(
        (r.id, r.tag, r.v) for r in txn.txn_read(spark, path).collect()
    )
    assert got == [(1, "x", 10), (1, "z", 30), (2, "y", 20)]


def test_stream_txn_append_partitioned_exactly_once(spark, tmp_path):
    """The exactly-once sink on a PARTITIONED txn table: entries land
    with partition values, replay appends nothing, partition pruning
    still works on the result."""
    from etl_workflow_spark.streaming.incremental import stream_txn_append

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"p{i % 3}", f"v{i}") for i in range(12)],
        "id long, p string, v string",
    ).repartition(4).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame([(100, "p0", "seed")], ["id", "p", "v"]),
        partition_col="p",
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src_dir)
        )
        q = (
            stream_txn_append(stream, path, str(tmp_path / ckpt), ["id"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    rows = txn.txn_read(spark, path).collect()
    assert len(rows) == 13 and len({r.id for r in rows}) == 13
    hist = txn.txn_history(spark, path)
    run("ck2")  # full replay, fresh checkpoint
    assert len(txn.txn_read(spark, path).collect()) == 13
    assert txn.txn_history(spark, path) == hist
    only_p1 = txn.txn_read(spark, path).where("p = 'p1'").collect()
    assert {r.p for r in only_p1} == {"p1"} and len(only_p1) == 4


def test_maintain_with_retention_bounds_disk(spark, tmp_path):
    """txn_maintain(vacuum_keep_versions=...) bounds on-disk dirs after
    compaction (age guard relaxed for the test)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(0, "s")], ["id", "v"])
    )
    for b in range(4):
        txn.txn_append(
            spark, path,
            spark.createDataFrame([(b + 1, f"v{b}")], ["id", "v"]),
            keys=["id"],
        )
    v = txn.txn_maintain(
        spark, path, max_entries=2,
        vacuum_keep_versions=2, vacuum_min_age_sec=0,
    )
    assert v is not None
    assert txn.txn_history(spark, path) == [v - 1, v]
    live = {
        e["dir"]
        for vv in (v - 1, v)
        for e in txn._read_manifest(spark, path, vv)["entries"]
    }
    assert set(os.listdir(os.path.join(path, "_data"))) == live
    assert txn.txn_read(spark, path).count() == 5


def test_vacuum_reclaims_aged_dirs_at_steady_state(spark, tmp_path):
    """A dir too young for one vacuum must be reclaimable by a LATER
    vacuum even when no manifest is droppable anymore (the
    post-vacuum steady state) — an early return would strand it."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    txn.txn_merge_into(
        spark, path, spark.createDataFrame([(1, 11)], ["id", "v"]), ["id"]
    )
    txn.txn_merge_into(
        spark, path, spark.createDataFrame([(1, 12)], ["id", "v"]), ["id"]
    )
    # vacuum 1: manifests beyond keep drop, but dirs are too young
    removed = txn.txn_vacuum(spark, path, keep_versions=2)  # default age
    assert removed == [] and txn.txn_history(spark, path) == [2, 3]
    assert len(os.listdir(os.path.join(path, "_data"))) == 3
    # vacuum 2: version count is AT keep_versions; the sweep must still
    # run and reclaim the now-eligible unreferenced dir
    removed = txn.txn_vacuum(spark, path, keep_versions=2, min_age_sec=0)
    assert len(removed) == 1
    live = {
        e["dir"]
        for v in (2, 3)
        for e in txn._read_manifest(spark, path, v)["entries"]
    }
    assert set(os.listdir(os.path.join(path, "_data"))) == live
    assert _rows(txn.txn_read(spark, path)) == [(1, 12)]


def test_feed_cursor_migrates_legacy_single_file(spark, tmp_path):
    """A legacy single-FILE cursor must be honored (not silently read
    as None — that would replay the full snapshot and lose deletes)
    and upgraded to the marker-directory format on the next advance."""
    path = str(tmp_path / "t")
    cur = str(tmp_path / "cursor.json")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    txn.txn_merge_into(  # v2: delete nothing, update id=2
        spark, path, spark.createDataFrame([(2, 21)], ["id", "v"]), ["id"]
    )
    # write an old-format cursor file pointing at version 1
    import json as _json

    jvm, fs = txn._fs(spark, cur)
    txn._write_file(fs, txn._hpath(jvm, cur), _json.dumps({"version": 1}))
    assert txn._read_cursor(spark, cur) == 1
    feed, latest = txn.txn_feed(spark, path, ["id"], cur)
    rows = sorted((r._change_type, r.id, r.v) for r in feed.collect())
    assert rows == [("update_postimage", 2, 21)] and latest == 2
    txn.txn_feed_advance(spark, cur, latest)
    assert txn._read_cursor(spark, cur) == 2
    assert not fs.getFileStatus(txn._hpath(jvm, cur)).isFile()  # upgraded
    assert not fs.exists(txn._hpath(jvm, cur + ".legacy"))  # spot cleaned

    # monotonicity through migration: a stale consumer advancing to an
    # OLDER version than a legacy cursor recorded must not regress it
    cur2 = str(tmp_path / "cursor2.json")
    txn._write_file(fs, txn._hpath(jvm, cur2), _json.dumps({"version": 2}))
    txn.txn_feed_advance(spark, cur2, 1)
    assert txn._read_cursor(spark, cur2) == 2

    # crash window: legacy parked aside but marker not yet published -
    # the cursor must still read (no first-call reset)
    cur3 = str(tmp_path / "cursor3.json")
    txn._write_file(
        fs, txn._hpath(jvm, cur3 + ".legacy"), _json.dumps({"version": 7})
    )
    assert txn._read_cursor(spark, cur3) == 7


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_txn_random_walk_matches_model(spark, tmp_path, seed):
    """Model-based check of the whole mutation surface: a seeded random
    walk of append / merge / replace_where / delete / compact /
    vacuum against a driver-side dict model — after every step the
    snapshot equals the model, and a version pinned mid-walk stays
    byte-stable until vacuumed."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(seed)
    path = str(tmp_path / f"t{seed}")

    def frame(rows):
        return spark.createDataFrame(
            [(int(k), int(v)) for k, v in rows], "id long, v long"
        )

    model = {1: 10, 2: 20}
    txn.txn_create(spark, path, frame(model.items()), stats_cols=["id"])
    pinned_version = None
    pinned_model = None

    def check():
        got = {r.id: r.v for r in txn.txn_read(spark, path).collect()}
        assert got == model, f"seed {seed}: snapshot diverged from model"

    for step in range(10):
        op = rng.choice(
            ["append", "merge", "replace", "delete", "compact", "vacuum"]
        )
        ids = [rng.randrange(0, 12) for _ in range(rng.randrange(1, 4))]
        vals = [rng.randrange(0, 1000) for _ in ids]
        rows = list(dict(zip(ids, vals)).items())
        if op == "append":
            n = txn.txn_append(spark, path, frame(rows), keys=["id"])
            fresh = [kv for kv in rows if kv[0] not in model]
            assert n == len(fresh)
            model.update(fresh)
        elif op == "merge":
            upd, ins = txn.txn_merge_into(spark, path, frame(rows), ["id"])
            assert upd == sum(1 for k, _ in rows if k in model)
            assert ins == sum(1 for k, _ in rows if k not in model)
            model.update(rows)
        elif op == "replace":
            hit = set(ids)
            deleted, inserted = txn.txn_replace_where(
                spark, path,
                F.col("id").isin([int(i) for i in hit]),
                frame(rows),
            )
            assert deleted == sum(1 for k in model if k in hit)
            assert inserted == len(rows)
            model = {k: v for k, v in model.items() if k not in hit}
            model.update(rows)
        elif op == "delete":
            n = txn.txn_delete(spark, path, F.col("id").isin(
                [int(i) for i in ids]))
            assert n == sum(1 for k in model if k in set(ids))
            model = {k: v for k, v in model.items() if k not in set(ids)}
        elif op == "compact":
            txn.txn_compact(spark, path)
        else:
            txn.txn_vacuum(spark, path, keep_versions=3, min_age_sec=0)
            if (
                pinned_version is not None
                and pinned_version
                not in txn.txn_history(spark, path)
            ):
                pinned_version = None  # horizon passed; pin released
        check()
        if step == 3:
            pinned_version = txn.latest_version(spark, path)
            pinned_model = dict(model)
        if pinned_version is not None:
            got = {
                r.id: r.v
                for r in txn.txn_read(spark, path, pinned_version).collect()
            }
            assert got == pinned_model, f"seed {seed}: pinned version drifted"


def test_feed_fails_loudly_when_cursor_vacuumed_past(spark, tmp_path):
    """A consumer slower than the vacuum horizon must get a clear
    re-bootstrap error, not a raw missing-manifest failure."""
    path = str(tmp_path / "t")
    cur = str(tmp_path / "cursor")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    _, v = txn.txn_feed(spark, path, ["id"], cur)
    txn.txn_feed_advance(spark, cur, v)
    for n in (2, 3, 4):
        txn.txn_merge_into(
            spark, path,
            spark.createDataFrame([(n, n * 10)], ["id", "v"]), ["id"],
        )
    txn.txn_vacuum(spark, path, keep_versions=2, min_age_sec=0)
    with pytest.raises(ValueError, match="vacuumed"):
        txn.txn_feed(spark, path, ["id"], cur)


def test_append_schema_evolution(spark, tmp_path):
    """evolve_schema on append: new source columns extend the table
    (history reads typed NULL, no rewrite); table columns the source
    lacks NULL-fill; strict mode still fails loudly."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    wide = spark.createDataFrame([(2, 20, "en")], ["id", "v", "lang"])
    with pytest.raises(ValueError, match="lang"):
        txn.txn_append(spark, path, wide, keys=["id"])
    assert txn.txn_append(
        spark, path, wide, keys=["id"], evolve_schema=True
    ) == 1
    got = sorted(
        (r.id, r.v, r.lang) for r in txn.txn_read(spark, path).collect()
    )
    assert got == [(1, 10, None), (2, 20, "en")]
    # narrow source after evolution: missing column NULL-fills
    assert txn.txn_append(
        spark, path, spark.createDataFrame([(3, 30)], ["id", "v"]),
        keys=["id"], evolve_schema=True,
    ) == 1
    rows = {r.id: r.lang for r in txn.txn_read(spark, path).collect()}
    assert rows == {1: None, 2: "en", 3: None}


def test_append_enforces_recorded_types(spark, tmp_path):
    """A drifted batch must fail BEFORE the commit (a mistyped dir is
    durable and breaks every later read); lossless widenings cast
    implicitly; an evolving batch that dedups to empty still commits
    the schema change."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], "id long, v long")
    )
    # string v into a bigint column: loud failure, nothing committed
    with pytest.raises(ValueError, match="type"):
        txn.txn_append(
            spark, path,
            spark.createDataFrame([(2, "oops")], "id long, v string"),
            keys=["id"],
        )
    assert txn.latest_version(spark, path) == 1
    # int v widens to bigint implicitly
    assert txn.txn_append(
        spark, path,
        spark.createDataFrame([(3, 30)], "id long, v int"),
        keys=["id"],
    ) == 1
    assert dict(txn.txn_read(spark, path).dtypes)["v"] == "bigint"
    # replayed evolving batch, all keys duplicate: schema still commits
    n = txn.txn_append(
        spark, path,
        spark.createDataFrame([(1, 11, "en")], "id long, v long, lang string"),
        keys=["id"], evolve_schema=True,
    )
    assert n == 0
    assert "lang" in txn.txn_read(spark, path).columns


def test_stream_txn_append_bootstraps_missing_table(spark, tmp_path):
    """create_if_missing: the sink creates the table from its first
    batch (keys recorded as stats columns) and a full replay with a
    fresh checkpoint appends nothing."""
    from etl_workflow_spark.streaming.incremental import stream_txn_append

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(9)], "id long, v string"
    ).repartition(3).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    path = str(tmp_path / "t")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream_txn_append(
                stream, path, str(tmp_path / ckpt), ["id"],
                create_if_missing=True,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    rows = txn.txn_read(spark, path).collect()
    assert len(rows) == 9 and len({r.id for r in rows}) == 9
    m = txn._read_manifest(spark, path, 1)
    assert "stats" in m["entries"][0]  # bootstrap recorded key stats
    hist = txn.txn_history(spark, path)
    run("ck2")
    assert len(txn.txn_read(spark, path).collect()) == 9
    assert txn.txn_history(spark, path) == hist


def test_update_rows_txn_rejects_lossy_literal_drift(spark, tmp_path):
    """A mistyped update value must fail loudly before commit, not
    non-ANSI-launder into NULL/truncation (review r8)."""
    from etl_workflow_spark.sources.writers import update_rows

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], "id long, v long")
    )
    with pytest.raises(ValueError, match="type"):
        update_rows(spark, path, "id", 1, {"v": "banana"})
    with pytest.raises(ValueError, match="type"):
        update_rows(spark, path, "id", 1, {"v": 3.7})
    assert update_rows(spark, path, "id", 1, {"v": 99}) == 1  # int widens
    assert _rows(txn.txn_read(spark, path).drop("updated_at")) == [(1, 99)]


def test_idempotent_append_evolve_requires_txn_table(spark, tmp_path):
    from etl_workflow_spark.sources.writers import idempotent_append

    path = str(tmp_path / "p")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    df.write.parquet(path)
    with pytest.raises(ValueError, match="transactional"):
        idempotent_append(spark, df, path, ["id"], evolve_schema=True)


def test_rename_no_overwrite_refuses_existing_destination(spark, tmp_path):
    """The commit rename must REFUSE an existing destination: POSIX
    rename(2) (what FileSystem.rename delegates to on the local FS)
    silently overwrites, which would let both racing committers 'win'
    and vanish one manifest."""
    import json

    jvm, fs = txn._fs(spark, str(tmp_path))
    a = txn._hpath(jvm, str(tmp_path), "a.json")
    b = txn._hpath(jvm, str(tmp_path), "b.json")
    dst = txn._hpath(jvm, str(tmp_path), "final.json")
    txn._write_file(fs, a, '{"v": 1}')
    txn._write_file(fs, b, '{"v": 2}')
    txn._rename_no_overwrite(spark, jvm, a, dst)
    with pytest.raises(txn.ConcurrentWriteError):
        txn._rename_no_overwrite(spark, jvm, b, dst)
    # the winner's content survives intact
    assert json.loads(txn._read_file(jvm, fs, dst)) == {"v": 1}


def test_append_null_keyed_rows_replay_converges(spark, tmp_path):
    """NULL-keyed rows: min/max stats ignore NULLs, so range pruning
    must stand down for a NULL-keyed batch, and the anti-join must use
    null-safe equality — otherwise every replay re-appends the NULL
    twin (NULL = NULL is unknown under plain join equality)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        stats_cols=["id"],
    )
    batch = spark.createDataFrame(
        [(None, "n"), (2, "b")], "id long, v string"
    )
    assert txn.txn_append(spark, path, batch, keys=["id"]) == 2
    # replay: the NULL-keyed row now EXISTS and must be dropped even
    # though no entry's [min,max] range can describe it
    assert txn.txn_append(spark, path, batch, keys=["id"]) == 0
    got = sorted(
        ((r.id, r.v) for r in txn.txn_read(spark, path).collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert got == [(1, "a"), (2, "b"), (None, "n")]


def test_boolean_partition_values_roundtrip(spark, tmp_path):
    """Partition values are recorded with Spark cast('string') ('true'),
    not Python str() ('True') — a mismatch between the write-side
    encoding and the read-side isin filter silently hides rows."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, True), (2, False), (3, None)],
            "id long, flag boolean",
        ),
        partition_col="flag",
    )
    assert _rows(txn.txn_read(spark, path)) == [
        (1, True), (2, False), (3, None)]
    # partition-selective merge still routes on the cast encoding
    upd, ins = txn.txn_merge_into(
        spark,
        path,
        spark.createDataFrame([(1, True)], "id long, flag boolean"),
        ["id"],
    )
    assert (upd, ins) == (1, 0)
    assert _rows(txn.txn_read(spark, path)) == [
        (1, True), (2, False), (3, None)]


def test_string_partition_values_keep_recorded_type(spark, tmp_path):
    """Entries read under the MANIFEST's schema: a string partition
    value '01' must not come back int 1 via hive dir-name re-inference
    (the value filter would then hide the row)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "01"), (2, "1"), (3, "x")], "id long, p string"
        ),
        partition_col="p",
    )
    got = txn.txn_read(spark, path)
    assert dict(got.dtypes)["p"] == "string"
    assert _rows(got) == [(1, "01"), (2, "1"), (3, "x")]


def test_empty_evolving_merge_still_commits_schema(spark, tmp_path):
    """A replayed evolving merge that dedups to empty must still commit
    the promised column-add (mergeSchema metadata semantics), not
    silently drop it."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], "id long, v long")
    )
    empty = spark.createDataFrame([], "id long, v long, note string")
    assert txn.txn_merge_into(
        spark, path, empty, ["id"], evolve_schema=True
    ) == (0, 0)
    got = txn.txn_read(spark, path)
    assert got.columns == ["id", "v", "note"]
    assert _rows(got) == [(1, 10, None)]
    assert txn.txn_history(spark, path) == [1, 2]

    # replace_where no-op with an evolving replacement: same rule
    empty2 = spark.createDataFrame([], "id long, v long, note string, z long")
    from pyspark.sql import functions as F

    assert txn.txn_replace_where(
        spark, path, F.lit(False), empty2, evolve_schema=True
    ) == (0, 0)
    assert txn.txn_read(spark, path).columns == ["id", "v", "note", "z"]


def test_merge_matched_count_with_non_unique_target_keys(spark, tmp_path):
    """updated counts MATCHED SOURCE KEYS: a target holding N rows for
    one key collapses to the one source row (the keyed-merge contract),
    and counting removals would report updated=N and a negative insert
    count."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20)], "id long, v long"
        ),
    )
    upd, ins = txn.txn_merge_into(
        spark,
        path,
        spark.createDataFrame([(1, 99), (3, 30)], "id long, v long"),
        ["id"],
    )
    assert (upd, ins) == (1, 1)
    assert _rows(txn.txn_read(spark, path)) == [
        (1, 99), (2, 20), (3, 30)]


def test_create_empty_partitioned_table_stays_readable(spark, tmp_path):
    """partitionBy of zero rows writes no schema-bearing part file —
    the create must commit ZERO entries (not a fileless dir that bricks
    every later read) and leave the table fully usable."""
    path = str(tmp_path / "t")
    empty = spark.createDataFrame([], "id long, day string, v long")
    assert txn.txn_create(spark, path, empty, partition_col="day") == 1
    got = txn.txn_read(spark, path)
    assert got.columns == ["id", "day", "v"]
    assert got.count() == 0
    # the table is not bricked: keyed appends and compaction work
    assert txn.txn_append(
        spark, path,
        spark.createDataFrame([(1, "d1", 10)], "id long, day string, v long"),
        keys=["id"],
    ) == 1
    assert _rows(txn.txn_read(spark, path)) == [(1, "d1", 10)]
    txn.txn_compact(spark, path)
    assert _rows(txn.txn_read(spark, path)) == [(1, "d1", 10)]


def test_dir_stats_use_recorded_types_not_hive_inference(spark, tmp_path):
    """Recorded entry stats read the dir under the MANIFEST schema: a
    numeric-looking string partition value must record string stats
    ('01'), not hive-re-inferred int 1 — mistyped stats silently
    disable range pruning for that entry forever (TypeError fallback
    in _may_intersect keeps it, correct but never prunable)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "01", 10), (2, "02", 20)], "id long, day string, v long"
        ),
        partition_col="day",
        stats_cols=["id", "day"],
    )
    m = txn._read_manifest(spark, path, 1)
    assert m["entries"][0]["stats"] == {"id": [1, 2], "day": ["01", "02"]}
    # a disjoint string-day batch is now provably prunable
    stats, _, _ = txn._batch_key_stats(
        spark.createDataFrame([(9, "05", 1)], "id long, day string, v long"),
        ["day"], None,
    )
    assert not txn._may_intersect(m["entries"][0], ["day"], stats, None)


@pytest.mark.parametrize("seed", [7, 31])
def test_txn_random_walk_partitioned_tricky_values(spark, tmp_path, seed):
    """Model-based walk over a PARTITIONED table whose partition values
    are the encoding traps ('01' vs '1', 'true' vs 'True', embedded
    space, NULL): after every mutation the snapshot — including the
    partition column — equals the driver-side model. This is the
    systemic net for the str()/cast('string')/hive-re-inference bug
    class: any representation mismatch between the write-side recorded
    values and a read/affected/prune filter loses or duplicates rows
    within a few steps."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(seed)
    path = str(tmp_path / f"p{seed}")
    PARTS = ["01", "1", "true", "True", "x y", None]

    def frame(rows):
        return spark.createDataFrame(
            [(int(k), p, int(v)) for k, (p, v) in rows],
            "id long, p string, v long",
        )

    def rand_rows():
        ids = {rng.randrange(0, 12) for _ in range(rng.randrange(1, 4))}
        return [(i, (rng.choice(PARTS), rng.randrange(0, 1000)))
                for i in ids]

    model = {1: ("01", 10), 2: ("True", 20), 3: (None, 30)}
    txn.txn_create(
        spark, path, frame(model.items()),
        partition_col="p", stats_cols=["id"],
    )

    def check():
        got = {r.id: (r.p, r.v)
               for r in txn.txn_read(spark, path).collect()}
        assert got == model, f"seed {seed}: snapshot diverged from model"

    for step in range(8):
        op = rng.choice(["append", "merge", "replace", "delete", "compact"])
        rows = rand_rows()
        if op == "append":
            n = txn.txn_append(spark, path, frame(rows), keys=["id"])
            fresh = [kv for kv in rows if kv[0] not in model]
            assert n == len(fresh)
            model.update(fresh)
        elif op == "merge":
            upd, ins = txn.txn_merge_into(spark, path, frame(rows), ["id"])
            assert upd == sum(1 for k, _ in rows if k in model)
            assert ins == sum(1 for k, _ in rows if k not in model)
            model.update(rows)  # may move a row ACROSS partitions
        elif op == "replace":
            # partition-predicate replace: clear one tricky value, put
            # the replacement rows wherever they say they belong
            target_p = rng.choice(PARTS)
            cond = (
                F.col("p").isNull() if target_p is None
                else F.col("p") == target_p
            )
            survivors = {k for k, pv in model.items()
                         if pv[0] != target_p}
            # replace_where preserves multiplicity (it is NOT keyed):
            # a replacement id colliding with a surviving row in some
            # other partition would legitimately duplicate it, which
            # the dict model can't express — keep ids disjoint
            repl_rows = [kv for kv in rand_rows()
                         if kv[0] not in survivors]
            deleted, inserted = txn.txn_replace_where(
                spark, path, cond, frame(repl_rows)
            )
            assert deleted == sum(
                1 for pv, _ in model.values() if pv == target_p
            )
            assert inserted == len(repl_rows)
            model = {k: pv for k, pv in model.items()
                     if pv[0] != target_p}
            model.update(repl_rows)
        elif op == "delete":
            ids = [k for k, _ in rows]
            n = txn.txn_delete(
                spark, path, F.col("id").isin([int(i) for i in ids])
            )
            assert n == sum(1 for k in model if k in set(ids))
            model = {k: pv for k, pv in model.items()
                     if k not in set(ids)}
        else:
            txn.txn_compact(spark, path)
        check()


def _brute_changes(spark, path, keys, v_old, v_new):
    """Reference diff computed from the two full snapshots driver-side
    (no pruning) — the semantics txn_changes must preserve."""
    old = {tuple(r[k] for k in keys): r.asDict()
           for r in txn.txn_read(spark, path, v_old).collect()}
    new_rows = {tuple(r[k] for k in keys): r.asDict()
                for r in txn.txn_read(spark, path, v_new).collect()}
    cols = list(txn.txn_read(spark, path, v_new).columns)
    out = []
    for k, r in new_rows.items():
        if k not in old:
            out.append(("insert", tuple(r.get(c) for c in cols)))
        else:
            o = old[k]
            if any(r.get(c) != o.get(c) for c in cols):
                out.append(
                    ("update_postimage", tuple(r.get(c) for c in cols))
                )
    for k, r in old.items():
        if k not in new_rows:
            out.append(("delete", tuple(r.get(c) for c in cols)))
    return sorted(out)


def test_txn_changes_partition_pruned_matches_full_diff(spark, tmp_path):
    """The manifest-driven affected-partition pruning must return the
    EXACT diff of the full snapshots — across merge (incl. a
    cross-partition key move), append, and delete windows."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, None, 40)],
            "id long, day string, v long",
        ),
        partition_col="day",
    )
    # window 1: merge updates d1 and MOVES id=3 from d2 to d3
    txn.txn_merge_into(
        spark, path,
        spark.createDataFrame(
            [(2, "d1", 21), (3, "d3", 31)], "id long, day string, v long"
        ),
        ["id"],
    )
    # window 2: keyed append into d2 + NULL partition
    txn.txn_append(
        spark, path,
        spark.createDataFrame(
            [(5, "d2", 50), (6, None, 60)], "id long, day string, v long"
        ),
        keys=["id"],
    )
    # window 3: predicate delete out of d1
    txn.txn_delete(spark, path, F.col("id") == 1)
    versions = txn.txn_history(spark, path)
    for v_old, v_new in zip(versions, versions[1:]):
        got = sorted(
            (r["_change_type"], (r.id, r.day, r.v))
            for r in txn.txn_changes(
                spark, path, ["id"], v_old, v_new
            ).collect()
        )
        assert got == _brute_changes(spark, path, ["id"], v_old, v_new), (
            f"window {v_old}->{v_new}"
        )
    # and the full-span window
    got = sorted(
        (r["_change_type"], (r.id, r.day, r.v))
        for r in txn.txn_changes(
            spark, path, ["id"], versions[0], versions[-1]
        ).collect()
    )
    assert got == _brute_changes(
        spark, path, ["id"], versions[0], versions[-1]
    )


def test_txn_changes_untouched_partitions_not_read(spark, tmp_path):
    """An append window over a daily-partitioned table must read only
    the touched entries: the diff's scan set excludes the untouched
    days' dirs (the O(changed days) feed contract)."""
    path = str(tmp_path / "t")
    txn.txn_create(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"d{i}", i * 10) for i in range(1, 6)],
            "id long, day string, v long",
        ),
        partition_col="day",
    )
    txn.txn_append(
        spark, path,
        spark.createDataFrame([(9, "d9", 90)], "id long, day string, v long"),
        keys=["id"],
    )
    ch = txn.txn_changes(spark, path, ["id"], 1, 2)
    rows = sorted((r["_change_type"], r.id) for r in ch.collect())
    assert rows == [("insert", 9)]
    # the plan scans ONLY the appended entry's dir: the create entry
    # serves no affected value and is pruned at the entry level
    m1 = txn._read_manifest(spark, path, 1)
    create_dir = m1["entries"][0]["dir"]
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert create_dir not in plan


# ------------------------------------------------ atomic-publish hook


def _local(p) -> str:
    """py4j hadoop Path -> plain local path."""
    s = str(p)
    return s[len("file:"):] if s.startswith("file:") else s


class _ConditionalPut(txn.AtomicPublish):
    """Object-store shaped publisher: atomic create-if-absent of the
    DESTINATION (conditional put), emulated with os.O_EXCL over the
    local paths. ``race_on`` injects a concurrent committer that wins
    the slot right before our put — AFTER _commit's exists() check has
    already passed, the exact window plain check-then-put loses."""

    def __init__(self, race_on: str | None = None):
        self.race_on = race_on
        self.raced = False

    def rename_no_overwrite(self, spark_, jvm, src, dst) -> None:
        import os

        s, d = _local(src), _local(dst)
        if self.race_on and d.endswith(self.race_on) and not self.raced:
            self.raced = True
            with open(d, "w") as f:
                f.write('{"winner": "other committer"}')
        try:
            fd = os.open(d, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise txn.ConcurrentWriteError(
                f"destination {dst} already exists"
            ) from None
        with os.fdopen(fd, "w") as out, open(s) as inp:
            out.write(inp.read())
        os.remove(s)


def test_publish_hook_detects_lost_commit_race(spark, tmp_path):
    """r8 verdict task #3: under check-then-put semantics a racing
    committer landing between _commit's exists() check and the put
    must be DETECTED — ConcurrentWriteError, never a silent
    double-commit that vanishes the winner's manifest."""
    import pytest

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
    )
    hook = _ConditionalPut(race_on=txn._version_name(2))
    prev = txn.set_publish_hook(hook)
    try:
        with pytest.raises(txn.ConcurrentWriteError):
            txn.txn_append(
                spark, path, spark.createDataFrame([(2, 20)], ["id", "v"])
            )
    finally:
        txn.set_publish_hook(prev)
    assert hook.raced
    # the winner's manifest survived untouched — we lost, they won
    assert txn.latest_version(spark, path) == 2
    log = f"{path}/_txnlog/{txn._version_name(2)}"
    with open(log) as f:
        assert "other committer" in f.read()
    # and no stray tmp manifest is left behind
    import os

    assert not [
        n for n in os.listdir(f"{path}/_txnlog") if n.startswith(".tmp-")
    ]


def test_publish_hook_happy_path_commits_through_hook(spark, tmp_path):
    """Without a race the conditional-put hook carries commits
    end-to-end: every mutation of the table publishes through it."""
    path = str(tmp_path / "t")
    hook = _ConditionalPut()
    prev = txn.set_publish_hook(hook)
    try:
        txn.txn_create(
            spark, path, spark.createDataFrame([(1, 10)], ["id", "v"])
        )
        txn.txn_append(
            spark, path, spark.createDataFrame([(2, 20)], ["id", "v"])
        )
    finally:
        txn.set_publish_hook(prev)
    got = sorted((r.id, r.v) for r in txn.txn_read(spark, path).collect())
    assert got == [(1, 10), (2, 20)]
    assert txn.txn_history(spark, path) == [1, 2]


def test_extend_lock_routes_through_publish_hook(spark, tmp_path):
    """The _extend.lock single-writer guard uses the SAME hook's
    create_exclusive — one override makes both commit shapes honest
    on an object store."""
    import pytest

    from etl_workflow_spark.operators.corpus import (
        _acquire_extend_lock, _release_extend_lock,
    )

    class RefuseAll(txn.AtomicPublish):
        def create_exclusive(self, spark_, fs, path) -> bool:
            return False

    base = str(tmp_path / "ts")
    import os

    os.makedirs(base)
    prev = txn.set_publish_hook(RefuseAll())
    try:
        with pytest.raises(RuntimeError, match="_extend.lock"):
            _acquire_extend_lock(spark, base)
    finally:
        txn.set_publish_hook(prev)
    # default hook: acquire succeeds, a second acquire is refused,
    # release unblocks
    _acquire_extend_lock(spark, base)
    with pytest.raises(RuntimeError, match="_extend.lock"):
        _acquire_extend_lock(spark, base)
    _release_extend_lock(spark, base)
    _acquire_extend_lock(spark, base)
    _release_extend_lock(spark, base)
