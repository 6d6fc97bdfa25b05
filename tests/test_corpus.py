"""One-call training-corpus materialization (`operators/corpus.py`).

Contracts under test: every stage's drop decision lands in the output
(quality fail, contamination, duplicates, mixture strata), the manifest
reports exactly what was written, shard membership/order is a pure
function of (salt, id) — two runs produce byte-identical shards — and
chunk+pack mode respects the token budget per pack.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_workflow_spark.operators import corpus as C


T1 = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "rests under a tall tree while the dog watches the quiet field"
)
T2 = (
    "a gentle rain fell on the harbor town as fishermen hauled in "
    "their heavy nets before the storm could reach the little pier"
)
T3 = (
    "engineers reviewed the failing build for hours until someone "
    "noticed that the cache key had quietly changed between releases"
)
T4 = (
    "def parse(rows): return [int(x) for x in rows if x] "
    "# keep the numeric ids and drop every empty marker from the feed"
)
T5 = (
    "print(sum(values)) is the whole report because the team only "
    "wants a single total number at the end of each batch run"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


@pytest.fixture()
def base_docs(spark):
    rows = [
        (1, T1, "web"),
        (2, T2, "web"),
        (3, T3, "web"),
        (4, T4, "code"),
        (5, T5, "code"),
        # exact duplicate of 1 -> exact-dedup loser
        (6, T1, "web"),
        # quality fail: < 5 tokens
        (7, "!!! ??? ...", "web"),
        # contaminated: contains the benchmark's 13-gram verbatim
        (8, T2 + " zeta secret benchmark answer key must never leak "
            "into the train corpus at all", "web"),
    ]
    return _docs(spark, rows)


@pytest.fixture()
def holdout(spark):
    return spark.createDataFrame(
        [(100, "zeta secret benchmark answer key must never leak into "
               "the train corpus at all indeed")],
        "doc_id long, text string",
    )


def test_materialize_end_to_end(spark, tmp_path, base_docs, holdout):
    out = str(tmp_path / "train")
    manifest = C.materialize_training_set(
        spark,
        base_docs,
        out,
        benchmark=holdout,
        num_shards=4,
        audit=True,
    )
    data, m2 = C.read_training_set(spark, out)
    assert m2 == manifest
    ids = sorted(r.doc_id for r in data.collect())
    # 7 fails quality, 8 is contaminated, 6 loses exact dedup to 1
    assert ids == [1, 2, 3, 4, 5]
    assert manifest["rows"] == 5
    assert manifest["unit"] == "documents"
    # token total matches a direct whitespace count of the survivors
    n_tok = sum(
        len(r.text.split()) for r in data.collect()
    )
    assert manifest["tokens"] == n_tok
    # per-shard counts sum to the total and shards stay within bound
    assert sum(s["rows"] for s in manifest["shards"].values()) == 5
    assert all(0 <= int(k) < 4 for k in manifest["shards"])
    # audit curve: monotone non-increasing survivor counts
    curve = manifest["stage_rows"]
    assert curve["input"] == 8
    vals = [curve[k] for k in
            ["input", "quality", "decontaminated", "deduped"]]
    assert vals == sorted(vals, reverse=True)
    # manifest file exists next to the data
    assert os.path.exists(os.path.join(out, "manifest.json"))
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["rows"] == 5


def test_materialize_is_deterministic(spark, tmp_path, base_docs):
    """Same input + same salt -> identical shard membership AND order,
    regardless of input partitioning (the layout-independence contract
    of deterministic_shuffle carried through the recipe)."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    C.materialize_training_set(spark, base_docs, a, num_shards=4)
    C.materialize_training_set(
        spark, base_docs.repartition(7), b, num_shards=4
    )
    da, ma = C.read_training_set(spark, a)
    db, mb = C.read_training_set(spark, b)
    assert ma == mb
    rows_a = sorted((r.shard, r.doc_id) for r in da.collect())
    rows_b = sorted((r.shard, r.doc_id) for r in db.collect())
    assert rows_a == rows_b


def test_mixture_targets_drop_unnamed_and_solve_rates(
    spark, tmp_path, base_docs
):
    out = str(tmp_path / "train")
    manifest = C.materialize_training_set(
        spark,
        base_docs,
        out,
        quality_filter=False,
        dedup=False,
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
    )
    data, _ = C.read_training_set(spark, out)
    by_src = {
        r.source: r.n
        for r in data.groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    # code is the binding stratum (2 rows vs 6 web): kept whole, web
    # downsampled toward 2 — shares can't be exact at tiny n, but no
    # stratum may exceed the solved keep expectation grossly
    assert set(by_src) <= {"web", "code"}
    assert by_src.get("code", 0) == 2
    rates = manifest["config"]["solved_mixture_rates"]
    assert rates["code"] == 1.0 and 0 < rates["web"] < 1


def test_chunk_pack_mode_respects_budget(spark, tmp_path, base_docs):
    out = str(tmp_path / "train")
    manifest = C.materialize_training_set(
        spark,
        base_docs,
        out,
        benchmark=None,
        chunk_tokens=8,
        pack_budget=16,
        num_shards=2,
    )
    assert manifest["unit"] == "packed_chunks"
    data, _ = C.read_training_set(spark, out)
    assert {"doc_id", "chunk_idx", "chunk_text", "n_tokens",
            "pack_id", "shard"} <= set(data.columns)
    # every pack's token total within budget (single chunks may not
    # exceed 8 <= 16, so no own-pack overflow case here)
    over = (
        data.groupBy("pack_id").sum("n_tokens")
        .where("`sum(n_tokens)` > 16").count()
    )
    assert over == 0
    # chunk rows re-assemble every surviving document exactly
    n_docs = data.select("doc_id").distinct().count()
    assert n_docs == 6  # 6 lost dedup, 7 lost quality; 8 kept (no bench)
    # PACK INTEGRITY: the shuffle unit is the pack — every chunk of a
    # pack lands in ONE shard...
    split_packs = (
        data.select("pack_id", "shard").distinct()
        .groupBy("pack_id").count().where("count > 1").count()
    )
    assert split_packs == 0
    # ...contiguously and in (doc, chunk) order within the shard file,
    # so a loader streaming one shard assembles complete sequences
    import glob as _glob

    for shard_dir in _glob.glob(os.path.join(out, "data", "shard=*")):
        rows = spark.read.parquet(shard_dir).collect()
        seen, prev = set(), None
        for r in rows:
            if r.pack_id != prev:
                assert r.pack_id not in seen  # contiguity: no recurrence
                seen.add(r.pack_id)
                prev = r.pack_id
        by_pack: dict = {}
        for r in rows:
            by_pack.setdefault(r.pack_id, []).append(
                (r.doc_id, r.chunk_idx)
            )
        for members in by_pack.values():
            assert members == sorted(members)


def test_all_rows_filtered_still_writes_a_readable_set(spark, tmp_path):
    """Zero survivors: the write produces no part files, but the
    manifest (rows/tokens 0, recorded schema) still lands and
    read_training_set returns a typed empty frame instead of a schema-
    inference crash."""
    docs = _docs(spark, [(1, "!!! ??? ...", "web"), (2, "x y", "web")])
    out = str(tmp_path / "train")
    manifest = C.materialize_training_set(
        spark, docs, out, dedup=False, num_shards=4
    )
    assert manifest["rows"] == 0
    assert manifest["tokens"] == 0
    assert manifest["shards"] == {}
    data, m2 = C.read_training_set(spark, out)
    assert m2 == manifest
    assert data.count() == 0
    assert {"doc_id", "text", "source", "shard"} <= set(data.columns)


def test_config_validation(spark, tmp_path, base_docs):
    with pytest.raises(ValueError, match="strata_col"):
        C.materialize_training_set(
            spark, base_docs, str(tmp_path / "x"), mixture={"web": 1.0}
        )
    with pytest.raises(ValueError, match="chunk_tokens"):
        C.materialize_training_set(
            spark, base_docs, str(tmp_path / "y"), pack_budget=16
        )


# ------------------------------------------------------------- extension


T6 = (
    "storage nodes report their disk health every minute so the "
    "scheduler can drain failing racks before any data is lost"
)


def test_extend_training_set_dedups_against_existing(
    spark, tmp_path, base_docs
):
    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=4, dedup_threshold=0.5
    )
    # base survivors: 1..5 (6 exact-dup loser, 7 quality fail, and 8 —
    # a superset of T2 — is a NEAR-dup of 2 at threshold 0.5)
    batch = _docs(spark, [
        (2, T2, "web"),                       # id collision -> skipped
        (20, T3, "web"),                      # exact copy of 3 -> cross-exact
        (21, T1.replace("field", "meadow"), "web"),  # near-dup of 1
        (22, T6, "web"),                      # genuinely new -> survives
        (23, "!!! ??? ...", "web"),           # quality fail
        (24, T6, "web"),                      # within-batch dup of 22
    ])
    m = C.extend_training_set(spark, batch, out, audit=True)
    data, m2 = C.read_training_set(spark, out)
    assert m2 == m
    assert m["appended_rows"] == 1
    assert m["rows"] == 6 and m["epochs"] == 2
    ids = sorted(r.doc_id for r in data.collect())
    assert ids == [1, 2, 3, 4, 5, 22]
    # audit curve records every cross-dedup stage
    curve = m["stage_rows"]
    assert curve["input"] == 6 and curve["new_ids"] == 5
    assert curve["cross_exact"] < curve["deduped_within_batch"]
    assert curve["cross_neardup"] == 1
    # shard membership is the SAME pure function of (salt, id) as the
    # original build
    from etl_workflow_spark.operators.sampling import deterministic_shuffle

    exp = deterministic_shuffle(
        batch.where("doc_id = 22"), key="doc_id",
        salt="train-v1:shuffle", num_shards=4, shard_col="shard",
    ).collect()[0]["shard"]
    got = {r.doc_id: r.shard for r in data.collect()}[22]
    assert got == exp
    # previous manifest demoted, not lost
    assert os.path.exists(os.path.join(out, "manifest.json.bak"))
    with open(os.path.join(out, "manifest.json.bak")) as fh:
        assert json.load(fh)["rows"] == 5

    # idempotent re-run: every id now exists or re-drops. The replayed
    # batch's previously-DROPPED ids (20, 21, 23, 24) re-present as
    # admitted ids below the max kept id (22), so the r10 min-id
    # interleave guard fires — a replay is exactly the case the
    # explicit opt-out documents (the recipe is deterministic, so the
    # re-processed rows re-drop identically)
    with pytest.raises(ValueError, match="interleave"):
        C.extend_training_set(spark, batch, out)
    m3 = C.extend_training_set(
        spark, batch, out, allow_interleaved_ids=True
    )
    assert m3["appended_rows"] == 0
    assert m3["rows"] == 6 and m3["epochs"] == 3


def test_extend_training_set_decontaminated_path(
    spark, tmp_path, base_docs, holdout
):
    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, benchmark=holdout, num_shards=4
    )
    dirty = _docs(spark, [
        (30, T2 + " zeta secret benchmark answer key must never leak "
              "into the train corpus at all", "web"),
        (31, T6, "web"),
    ])
    # a decontaminated set REQUIRES the benchmark at extension time
    with pytest.raises(ValueError, match="decontamination"):
        C.extend_training_set(spark, dirty, out)
    m = C.extend_training_set(spark, dirty, out, benchmark=holdout)
    assert m["appended_rows"] == 1
    data, _ = C.read_training_set(spark, out)
    ids = {r.doc_id for r in data.collect()}
    assert 31 in ids and 30 not in ids


def test_extend_training_set_guards(spark, tmp_path, base_docs):
    # chunked sets refuse extension
    chunked = str(tmp_path / "chunked")
    C.materialize_training_set(
        spark, base_docs, chunked, chunk_tokens=8, num_shards=2
    )
    with pytest.raises(ValueError, match="re-materialize"):
        C.extend_training_set(spark, _docs(spark, [(40, T6, "web")]),
                              chunked)
    # mixture sets extend since r9 — but a PRE-premix set (simulated
    # by deleting the pool) refuses with the upgrade hint, and a
    # prebuilt index is refused (its universe would be the kept
    # shards, not the pool)
    import shutil

    mixed = str(tmp_path / "mixed")
    C.materialize_training_set(
        spark, base_docs, mixed, quality_filter=False, dedup=False,
        mixture={"web": 0.5, "code": 0.5}, strata_col="source",
        num_shards=2,
    )
    # a prebuilt index is accepted but guarded against the POOL: an
    # empty index over a non-empty pool is stale and refused
    with pytest.raises(ValueError, match="stale or mis-parameterized"):
        C.extend_training_set(
            spark, _docs(spark, [(40, T6, "web")]), mixed,
            index=spark.createDataFrame(
                [], "id long, band int, bucket long"
            ),
        )
    shutil.rmtree(f"{mixed}/premix")
    with pytest.raises(ValueError, match="re-materialize once"):
        C.extend_training_set(spark, _docs(spark, [(40, T6, "web")]), mixed)
    # a set built WITHOUT decontamination refuses a benchmark
    plain = str(tmp_path / "plain")
    C.materialize_training_set(spark, base_docs, plain, num_shards=2)
    with pytest.raises(ValueError, match="WITHOUT"):
        C.extend_training_set(
            spark, _docs(spark, [(40, T6, "web")]), plain,
            benchmark=_docs(spark, [(0, T1, "x")]).select("doc_id", "text"),
        )
    # schema drift refuses
    with pytest.raises(ValueError, match="columns"):
        C.extend_training_set(
            spark,
            spark.createDataFrame([(40, T6)], "doc_id long, text string"),
            plain,
        )
    # an empty batch is a no-op epoch (idle micro-batch shape)
    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    m = C.extend_training_set(spark, empty, plain)
    assert m["appended_rows"] == 0 and m["epochs"] == 2


def test_extend_training_set_hardening(spark, tmp_path, base_docs):
    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=4, dedup_threshold=0.5
    )
    # type drift refused BEFORE any data lands
    drifted = spark.createDataFrame(
        [("40", T6, "web")], "doc_id string, text string, source string"
    )
    with pytest.raises(ValueError, match="recorded"):
        C.extend_training_set(spark, drifted, out)
    # NULL / duplicate ids refused
    with pytest.raises(ValueError, match="non-NULL"):
        C.extend_training_set(
            spark, _docs(spark, [(None, T6, "web")]), out
        )
    with pytest.raises(ValueError, match="unique"):
        C.extend_training_set(
            spark, _docs(spark, [(40, T6, "web"), (40, T3, "web")]), out
        )
    # concurrent-extension lock: a held lock refuses, and is released
    # after a successful run
    lock = os.path.join(out, "_extend.lock")
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="_extend.lock"):
        C.extend_training_set(spark, _docs(spark, [(41, T6, "web")]), out)
    os.remove(lock)
    m = C.extend_training_set(
        spark, _docs(spark, [(41, T6, "web")]), out, audit=True
    )
    assert m["appended_rows"] == 1
    assert not os.path.exists(lock)
    assert "stage_rows" in m
    # a later non-audited epoch must NOT inherit the stale audit curve
    m2 = C.extend_training_set(spark, _docs(spark, [(42, T3, "web")]), out)
    assert "stage_rows" not in m2
    with open(os.path.join(out, "manifest.json")) as fh:
        assert "stage_rows" not in json.load(fh)


def test_extend_with_prebuilt_index_and_ordered_read(
    spark, tmp_path, base_docs
):
    """A persisted LSH index gives the same result as rebuilding from
    corpus text, and ordered=True restores the exact permutation a
    single-shot build of the same rows would produce."""
    from etl_workflow_spark.operators.dedup import build_lsh_index

    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=4, dedup_threshold=0.5
    )
    existing, _ = C.read_training_set(spark, out)
    idx = build_lsh_index(existing)
    batch = _docs(spark, [
        (21, T1.replace("field", "meadow"), "web"),  # near-dup of 1
        (22, T6, "web"),
    ])
    m = C.extend_training_set(spark, batch, out, index=idx)
    assert m["appended_rows"] == 1  # 21 dropped via the prebuilt index

    # the index no longer covers the corpus (22 was appended) — the
    # staleness guard must refuse it rather than silently admit 22's
    # future near-dups
    with pytest.raises(ValueError, match="stale"):
        C.extend_training_set(
            spark, _docs(spark, [(23, T3 + " extra", "web")]), out,
            index=idx,
        )
    # same coverage/bands but DIFFERENT num_hashes: counts match, so
    # only the bucket canary can catch it — probing with it would
    # silently find no candidates
    existing2, _ = C.read_training_set(spark, out)
    bad_idx = build_lsh_index(existing2, num_hashes=64)
    with pytest.raises(ValueError, match="parameters"):
        C.extend_training_set(
            spark, _docs(spark, [(23, T3 + " extra", "web")]), out,
            index=bad_idx,
        )

    # ordered read == single-shot build of the same surviving rows
    combined = base_docs.unionByName(_docs(spark, [(22, T6, "web")]))
    fresh = str(tmp_path / "fresh")
    C.materialize_training_set(
        spark, combined, fresh, num_shards=4, dedup_threshold=0.5
    )
    # per-shard sequence of the ordered extended read must equal the
    # fresh build's per-shard FILE row order (one part file per shard
    # in a single-shot build — the written permutation itself)
    da, _ = C.read_training_set(spark, out, ordered=True)
    seq_a: dict = {}
    for r in da.collect():
        seq_a.setdefault(r.shard, []).append(r.doc_id)
    import glob as _glob

    seq_b: dict = {}
    for d in _glob.glob(os.path.join(fresh, "data", "shard=*")):
        k = int(d.rsplit("=", 1)[1])
        seq_b[k] = [r.doc_id for r in spark.read.parquet(d).collect()]
    assert seq_a == seq_b


def test_staleness_guard_catches_misparameterized_append(
    spark, tmp_path, base_docs
):
    """A maintenance APPEND of band rows built with the wrong
    parameters: coverage count and band range both match, so only the
    max-id canary (the newest epoch's doc) can expose it — min(id)
    alone always samples the oldest, provably correct build."""
    from etl_workflow_spark.operators.dedup import build_lsh_index

    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=4, dedup_threshold=0.5
    )
    C.extend_training_set(spark, _docs(spark, [(22, T6, "web")]), out)
    existing, m = C.read_training_set(spark, out)
    assert m["canary_ids"][-1] == 22  # max shingleable id is the append
    good = build_lsh_index(existing.where("doc_id != 22"))
    bad_tail = build_lsh_index(
        existing.where("doc_id = 22"), num_hashes=64
    )
    patched = good.unionByName(bad_tail)
    with pytest.raises(ValueError, match="parameters"):
        C.extend_training_set(
            spark, _docs(spark, [(23, T3 + " fresh", "web")]), out,
            index=patched,
        )


def test_extend_surfaces_crashed_manifest_replacement(
    spark, tmp_path, base_docs
):
    """live-manifest-missing-but-.bak-present (a crashed
    _replace_manifest whose restore also failed) raises a recovery
    instruction, not an opaque FileNotFoundException — and the
    instructed rename actually fixes it."""
    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=2, dedup_threshold=0.5
    )
    live = os.path.join(out, "manifest.json")
    os.rename(live, live + ".bak")
    with pytest.raises(RuntimeError, match="manifest.json.bak"):
        C.extend_training_set(spark, _docs(spark, [(30, T6, "web")]), out)
    assert not os.path.exists(os.path.join(out, "_extend.lock"))
    os.rename(live + ".bak", live)
    m = C.extend_training_set(
        spark, _docs(spark, [(30, T6, "web")]), out
    )
    assert m["appended_rows"] == 1


def test_staleness_guard_ignores_null_id_docs(spark, tmp_path):
    """A NULL-id shingle-able doc is outside the prebuilt-index
    contract (band rows key on id; countDistinct drops NULL groups) —
    it must not be counted as coverable, or a perfectly fresh index
    would be refused forever."""
    from etl_workflow_spark.operators.dedup import build_lsh_index

    out = str(tmp_path / "train")
    docs = _docs(
        spark, [(1, T1, "web"), (2, T2, "web"), (None, T3, "web")]
    )
    C.materialize_training_set(
        spark, docs, out, num_shards=2, dedup=False, quality_filter=False
    )
    existing, m = C.read_training_set(spark, out)
    assert m["shingleable"] == 2
    assert m["canary_ids"] == [1, 2]
    idx = build_lsh_index(existing.where("doc_id is not null"))
    mm = C.extend_training_set(
        spark, _docs(spark, [(9, T5, "web")]), out, index=idx
    )
    assert mm["appended_rows"] == 1


def test_staleness_guard_handles_binary_ids(spark, tmp_path):
    """Binary id columns collect as (unhashable) bytearray; the guard
    must still run — canary ids are normalized to bytes, and the
    manifest simply never records them (not JSON-safe), so the
    fallback scan path is the one exercised here."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.operators.dedup import build_lsh_index

    out = str(tmp_path / "train")
    docs = (
        _docs(spark, [(1, T1, "web"), (2, T2, "web"), (3, T3, "web")])
        .withColumn("doc_id", F.encode(F.concat(F.lit("k"), "doc_id"), "utf-8"))
    )
    C.materialize_training_set(
        spark, docs, out, num_shards=2, dedup=False, quality_filter=False
    )
    existing, m = C.read_training_set(spark, out)
    assert "canary_ids" not in m
    idx = build_lsh_index(existing)
    new = _docs(spark, [(9, T5, "web")]).withColumn(
        "doc_id", F.encode(F.concat(F.lit("k"), "doc_id"), "utf-8")
    )
    mm = C.extend_training_set(spark, new, out, index=idx)
    assert mm["appended_rows"] == 1


def test_staleness_guard_names_wrong_id_set(spark, tmp_path, base_docs):
    """An index whose coverage COUNT matches but whose id set does not
    (band rows for a different corpus/batch) is refused with a
    different-id-set diagnosis, not a hash-parameter one."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.operators.dedup import build_lsh_index

    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=2, dedup_threshold=0.5
    )
    existing, m = C.read_training_set(spark, out)
    hi = max(m["canary_ids"])
    relabeled = build_lsh_index(existing).withColumn(
        "id", F.when(F.col("id") == hi, F.lit(9999)).otherwise(F.col("id"))
    )
    with pytest.raises(ValueError, match="DIFFERENT id set"):
        C.extend_training_set(
            spark, _docs(spark, [(40, T5 + " anew", "web")]), out,
            index=relabeled,
        )


def test_shingleless_corpus_records_empty_canaries(spark, tmp_path):
    """Zero shingle-able docs -> canary_ids records [] (a valid cheap
    metadata answer), keeping future guarded extensions off the
    fallback text scan."""
    out = str(tmp_path / "train")
    docs = _docs(spark, [(1, "one two", "web"), (2, "ok", "web")])
    C.materialize_training_set(
        spark, docs, out, num_shards=2, dedup=False, quality_filter=False
    )
    _, m = C.read_training_set(spark, out)
    assert m["shingleable"] == 0
    assert m["canary_ids"] == []


# ------------------------------------------- mixture extension (r9)

T7 = (
    "for row in stream: yield normalize(row) # the ingest loop trims "
    "whitespace and lowercases every field before validation happens"
)
T8 = (
    "select count(*) from events where day = today and status = 'ok' "
    "group by source order by 1 desc limit 20 -- the daily health query"
)


def test_extend_mixture_equals_fresh_build_on_union(
    spark, tmp_path, base_docs, holdout
):
    """r8 verdict task #5: an extended mixture set equals a fresh
    build over the union corpus — file-order equality under
    ordered=True — including the case append-only cannot express:
    the batch feeds the binding stratum, rates RISE, and rows the
    original mixture dropped are re-admitted from the premix pool."""
    kwargs = dict(
        benchmark=holdout,
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
    )
    batch = _docs(spark, [(40, T7, "code"), (41, T8, "code")])
    a = str(tmp_path / "a")
    C.materialize_training_set(spark, base_docs, a, **kwargs)
    rates_before = json.loads(
        json.dumps(
            C.read_training_set(spark, a)[1]["config"][
                "solved_mixture_rates"
            ]
        )
    )
    m = C.extend_training_set(spark, batch, a, benchmark=holdout)
    b = str(tmp_path / "b")
    mb = C.materialize_training_set(
        spark, base_docs.unionByName(batch), b, **kwargs
    )
    da, ma = C.read_training_set(spark, a, ordered=True)
    db, _ = C.read_training_set(spark, b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [tuple(r) for r in db.collect()]
    # the re-solved rates equal the fresh build's, and the binding
    # stratum actually flipped (web rate rose to 1.0)
    assert (
        ma["config"]["solved_mixture_rates"]
        == mb["config"]["solved_mixture_rates"]
    )
    assert rates_before["web"] < 1.0
    assert ma["config"]["solved_mixture_rates"]["web"] == 1.0
    assert m["rows"] == mb["rows"] and m["tokens"] == mb["tokens"]
    # prebuilt POOL index path: same result, no per-call pool
    # re-shingling (the guard validates the index against the pool)
    from etl_workflow_spark.operators.dedup import build_lsh_index

    c = str(tmp_path / "c")
    C.materialize_training_set(spark, base_docs, c, **kwargs)
    pool = spark.read.parquet(f"{c}/premix")
    idx = build_lsh_index(pool)
    C.extend_training_set(spark, batch, c, benchmark=holdout, index=idx)
    dc, _ = C.read_training_set(spark, c, ordered=True)
    assert [tuple(r) for r in dc.collect()] == [
        tuple(r) for r in da.collect()
    ]


def test_extend_mixture_idempotent_rerun(spark, tmp_path, base_docs):
    """Replaying the same batch is a no-op epoch: the pool's
    insert-if-absent absorbs it and the re-derived kept set is
    unchanged (crash-recovery story: any later extension re-derives
    kept from the pool)."""
    kwargs = dict(
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
    )
    base = str(tmp_path / "t")
    C.materialize_training_set(spark, base_docs, base, **kwargs)
    batch = _docs(spark, [(40, T7, "code")])
    m1 = C.extend_training_set(spark, batch, base)
    rows1 = [
        tuple(r)
        for r in C.read_training_set(spark, base, ordered=True)[0].collect()
    ]
    m2 = C.extend_training_set(spark, batch, base)
    rows2 = [
        tuple(r)
        for r in C.read_training_set(spark, base, ordered=True)[0].collect()
    ]
    assert rows1 == rows2
    assert m2["appended_rows"] == 0
    assert m2["epochs"] == m1["epochs"] + 1


def test_extend_refuses_interleaved_ids_under_min_id_policy(
    spark, tmp_path, base_docs
):
    """r9 verdict: the min-id keep-policy equality precondition is now
    LOUD — a batch whose genuinely-new ids interleave existing ids is
    refused (extension would keep the existing copy of a cross-epoch
    dup group; a fresh union build keeps the group minimum), while a
    replayed batch, a monotone batch, the explicit opt-out, and a
    quality-policy set all pass."""
    out = str(tmp_path / "train")
    C.materialize_training_set(
        spark, base_docs, out, num_shards=4, dedup_threshold=0.5
    )
    # existing kept ids: 1..5 — id 0 interleaves below them
    inter = _docs(spark, [(0, T6, "web")])
    with pytest.raises(ValueError, match="interleave"):
        C.extend_training_set(spark, inter, out)
    # opt-out: caller asserts no shared duplicate groups
    m = C.extend_training_set(
        spark, inter, out, allow_interleaved_ids=True
    )
    assert m["appended_rows"] == 1
    # monotone batch passes the check
    fresh = (
        "completely different sentence about volcanoes, glaciers and "
        "migratory seabirds crossing the strait at dawn"
    )
    m2 = C.extend_training_set(
        spark, _docs(spark, [(50, fresh, "web")]), out
    )
    assert m2["appended_rows"] == 1
    # pure replay (all ids exist) is NOT an interleave — the anti-join
    # drops them before the check, so the empty admitted batch passes
    m3 = C.extend_training_set(spark, inter, out, )
    assert m3["appended_rows"] == 0
    # quality keep policy: id ordering is irrelevant -> no check
    qout = str(tmp_path / "trainq")
    C.materialize_training_set(
        spark,
        base_docs.withColumn("q", base_docs.doc_id * 10),
        qout, num_shards=4, dedup_threshold=0.5, keep_quality_col="q",
    )
    qb = _docs(spark, [(0, T6, "web")])
    mq = C.extend_training_set(
        spark, qb.withColumn("q", qb.doc_id * 10), qout,
    )
    assert mq["appended_rows"] == 1


def test_extend_mixture_snapshot_isolated_publish(
    spark, tmp_path, base_docs, holdout
):
    """r9 verdict task #2: the mixture kept rewrite is snapshot
    isolated — a reader holding the pre-extension manifest keeps
    streaming the OLD version's files untouched through the extension
    (no renamed/deleted files under it), a post-extension reader sees
    exactly the new version, and vacuum_training_set removes the
    superseded version (and only it)."""
    out = str(tmp_path / "snap")
    C.materialize_training_set(
        spark, base_docs, out,
        benchmark=holdout,
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
    )
    # a concurrent reader: loads the manifest NOW, collects later
    old_reader, old_manifest = C.read_training_set(spark, out)
    before = sorted(tuple(r) for r in old_reader.collect())
    assert old_manifest.get("data_dir", "data") == "data"

    batch = _docs(spark, [(40, T7, "code"), (41, T8, "code")])
    m = C.extend_training_set(spark, batch, out, benchmark=holdout)
    assert m["data_dir"].startswith("data_v")

    # the old reader's files are untouched: same rows, no crash
    assert sorted(tuple(r) for r in old_reader.collect()) == before
    # a fresh reader pins the new version and sees the extended set
    new_reader, new_manifest = C.read_training_set(spark, out)
    assert new_manifest["data_dir"] == m["data_dir"]
    assert new_reader.count() == m["rows"] > len(before)

    # vacuum removes exactly the superseded version; the live one stays
    removed = C.vacuum_training_set(spark, out)
    assert removed == ["data"]
    assert os.path.isdir(os.path.join(out, m["data_dir"]))
    assert not os.path.exists(os.path.join(out, "data"))
    still, _ = C.read_training_set(spark, out)
    assert still.count() == m["rows"]

    # a second extension supersedes the first version dir too
    batch2 = _docs(
        spark,
        [(60, "fresh words about tidal marshes and migrating cranes "
              "crossing the delta in october", "web")],
    )
    m2 = C.extend_training_set(spark, batch2, out, benchmark=holdout)
    assert m2["data_dir"] != m["data_dir"]
    removed2 = C.vacuum_training_set(spark, out)
    assert removed2 == [m["data_dir"]]


def _vdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, "
              "embedding array<double>"
    )


# well-separated base embeddings; 11/12 are semantic near-dups of each
# other (cosine ~1) with DIFFERENT text, so only the semantic tier can
# collapse them
_E1 = [1.0, 0.0, 0.0, 0.0]
_E2 = [0.0, 1.0, 0.0, 0.0]
_E3 = [0.0, 0.0, 1.0, 0.0]
_SEM_BASE = [
    (11, "a long enough sentence about rivers flowing to the delta "
         "every spring season", "web", _E1),
    (12, "completely different words describing mountain passes and "
         "winter snowfall patterns", "web", [0.999, 0.01, 0.0, 0.0]),
    (13, "the third base document talks about harbor cranes and "
         "container ships at dawn", "web", _E2),
    (14, "def load(rows): return [r for r in rows if r] # keep the "
         "non empty entries", "code", _E3),
    (15, "print(total) gives the final answer for the nightly batch "
         "report pipeline run", "code", [0.0, 0.0, 0.0, 1.0]),
]


def test_semantic_dedup_tier_in_recipe_and_extension(
    spark, tmp_path
):
    """r9 verdict task #5: the training-set recipe gains a semantic
    tier — build runs semdedup after MinHash under centroids RECORDED
    in the manifest; a mixture extension probes the premix pool's
    STORED cell assignments; extended set == fresh union build given
    the recorded clustering; drop accounting includes the semantic
    stages."""
    docs = _vdocs(spark, _SEM_BASE)
    out = str(tmp_path / "sem")
    kwargs = dict(
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
        semantic_dedup={"vec_col": "embedding", "k": 2, "threshold": 0.95},
        audit=True,
    )
    m = C.materialize_training_set(spark, docs, out, **kwargs)
    sem_cfg = m["config"]["semantic_dedup"]
    assert sem_cfg["centroids"], "build must record the trained centroids"
    assert "semantic_dedup" in m["stage_rows"]
    # 12 is a semantic near-dup of 11 (min-id keep -> 11 survives)
    data, _ = C.read_training_set(spark, out)
    ids0 = {r.doc_id for r in data.collect()}
    assert 11 in ids0 and 12 not in ids0
    # the pool carries cell assignments
    pool = spark.read.parquet(f"{out}/premix")
    assert "__semcell" in pool.columns
    assert pool.where("__semcell IS NULL").count() == 0

    batch = _vdocs(spark, [
        # semantic near-dup of existing 13 (different text) -> dropped
        (20, "unrelated phrasing about observatory domes on a clear "
             "night with telescopes", "web", [0.01, 0.999, 0.0, 0.0]),
        # within-batch semantic dup pair: 21 survives (min id), 22 drops
        (21, "fresh content about tidal pools and shore birds feeding "
             "at low tide", "web", [0.7, 0.0, 0.7, 0.0]),
        (22, "entirely different words on the same embedding for the "
             "within batch pair", "web", [0.7, 0.01, 0.7, 0.0]),
        # genuinely new -> survives
        (23, "the nightly report sums the daily totals and sorts the "
             "days in descending order", "code", [0.0, 0.5, 0.0, -0.8]),
    ])
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    curve = m2["stage_rows"]
    assert "semantic_within_batch" in curve and "cross_semantic" in curve
    assert curve["cross_semantic"] < curve["semantic_within_batch"]
    data2, _ = C.read_training_set(spark, out, ordered=True)
    ids = {r.doc_id for r in data2.collect()}
    assert 20 not in ids and 22 not in ids
    assert 21 in ids and 23 in ids

    # fresh union build under the RECORDED clustering == extension
    out_b = str(tmp_path / "sem_b")
    kwargs_b = dict(kwargs)
    kwargs_b["semantic_dedup"] = {
        "vec_col": "embedding", "k": 2, "threshold": 0.95,
        "centroids": sem_cfg["centroids"],
    }
    mb = C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, **kwargs_b
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in data2.collect()] == [
        tuple(r) for r in db.collect()
    ]
    assert m2["rows"] == mb["rows"] and m2["tokens"] == mb["tokens"]


def test_semantic_dedup_plain_path_and_null_embeddings(spark, tmp_path):
    """The non-mixture path: extension assigns the kept corpus's cells
    from the recorded centroids on the fly (documented pool-less
    trade); NULL embeddings pass through every semantic stage
    unexamined."""
    rows = _SEM_BASE + [(16, "a document with no embedding vector at "
                             "all in this corpus", "web", None)]
    docs = _vdocs(spark, rows)
    out = str(tmp_path / "plain")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2,
        semantic_dedup={"vec_col": "embedding", "k": 2},
    )
    data, _ = C.read_training_set(spark, out)
    ids = {r.doc_id for r in data.collect()}
    assert 16 in ids and 12 not in ids  # NULL passes; near-dup drops
    batch = _vdocs(spark, [
        (30, "observatory domes on a clear night with many telescopes "
             "and visitors", "web", [0.01, 0.999, 0.0, 0.0]),
        (31, "the counting job tallies the events for the current day "
             "and ranks them", "code", [0.0, 0.5, 0.0, -0.8]),
        (32, "another embedding-less row that only the lexical tiers "
             "can ever examine", "web", None),
    ])
    m2 = C.extend_training_set(spark, batch, out)
    ids2 = {r.doc_id for r in C.read_training_set(spark, out)[0].collect()}
    assert 30 not in ids2          # semantic cross-dup of 13
    assert 31 in ids2 and 32 in ids2


def test_vacuum_respects_extend_lock_and_guard_placement(
    spark, tmp_path, base_docs, holdout
):
    """Code-review regressions (r10): (a) vacuum takes the extend
    lock, so it can never delete an in-flight extension's
    not-yet-published version dir; (b) the interleave guard runs AFTER
    the within-batch stages, so a low id the quality filter drops
    anyway cannot force a false refusal; (c) a build with
    semantic_dedup over an all-NULL embedding corpus refuses instead
    of recording empty centroids."""
    out = str(tmp_path / "g")
    C.materialize_training_set(
        spark, base_docs, out,
        benchmark=holdout,
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
        num_shards=2,
    )
    # (a) a held lock blocks vacuum
    lock = os.path.join(out, "_extend.lock")
    open(lock, "w").close()
    with pytest.raises(RuntimeError, match="_extend.lock"):
        C.vacuum_training_set(spark, out)
    os.remove(lock)
    assert C.vacuum_training_set(spark, out) == []
    # and vacuum releases its own lock
    assert not os.path.exists(lock)

    # (b) on a plain set: batch holds id 0 (interleaves) that FAILS
    # quality + a monotone survivor — no refusal, survivor appends
    pout = str(tmp_path / "gp")
    C.materialize_training_set(spark, base_docs, pout, num_shards=2)
    batch = _docs(spark, [
        (0, "!!! ??? ...", "web"),
        (60, "a perfectly ordinary fresh sentence about lighthouse "
             "keepers and their long winters", "web"),
    ])
    m = C.extend_training_set(spark, batch, pout)
    assert m["appended_rows"] == 1
    ids = {r.doc_id for r in C.read_training_set(spark, pout)[0].collect()}
    assert 60 in ids and 0 not in ids

    # (c) semantic over all-NULL embeddings refuses loudly
    vd = spark.createDataFrame(
        [(1, "plenty of ordinary words to pass the quality gate with "
             "room to spare", "web", None)],
        "doc_id long, text string, source string, embedding array<double>",
    )
    with pytest.raises(ValueError, match="no non-NULL embeddings"):
        C.materialize_training_set(
            spark, vd, str(tmp_path / "nn"), num_shards=2,
            semantic_dedup={"vec_col": "embedding", "k": 2},
        )
    with pytest.raises(ValueError, match="centroids is empty"):
        C.materialize_training_set(
            spark, vd, str(tmp_path / "ec"), num_shards=2,
            semantic_dedup={"vec_col": "embedding", "centroids": []},
        )


# ---------------------------------------------------- DSIR recipe tier

_DSIR_PROSE_W = [
    "harbor", "tide", "gull", "lantern", "ferry", "quay", "mist", "sail",
]
_DSIR_CODE_W = [
    "parser", "buffer", "tuple", "index", "thread", "socket", "kernel",
    "queue",
]


def _dsir_recipe_docs(spark, start, count, words, source):
    """Deterministic two-domain corpus for the recipe's DSIR stage:
    every doc passes the quality gate (stopwords, length) and carries
    two UNIQUE tokens so the formulaic rotation never trips MinHash
    near-dup; the domain signal lives in the rotating vocab."""
    rows = []
    for g in range(start, start + count):
        a = words[g % len(words)]
        b = words[(g + 3) % len(words)]
        c = words[(g + 5) % len(words)]
        rows.append((
            g,
            f"the {a} and the {b} kept a steady {c} while "
            f"{source}{g}a {source}{g}b drifted past the old stone "
            "wall at dusk",
            source,
        ))
    return _docs(spark, rows)


def _dsir_recipe_target(spark):
    rows = [(900 + i,
             f"the {_DSIR_PROSE_W[i]} and the "
             f"{_DSIR_PROSE_W[(i + 2) % 8]} kept a steady "
             f"{_DSIR_PROSE_W[(i + 4) % 8]} through the night watch",
             "web") for i in range(8)]
    return _docs(spark, rows).select("text")


def test_dsir_tier_in_recipe_and_extension(spark, tmp_path):
    """r10 verdict task #1: the training-set recipe gains a DSIR
    selection tier — build fits the model (recorded in the manifest
    like the semantic centroids), selects n_select docs toward the
    target domain before mixture, stores per-doc weights in the
    premix pool; extension scores only the NEW batch under the
    RECORDED model and re-derives the selection over the grown pool;
    extended set == fresh union build under the recorded model; a
    salt redraw changes the selection deterministically; drop
    accounting gains a dsir stage."""
    prose = _dsir_recipe_docs(spark, 1, 10, _DSIR_PROSE_W, "web")
    code = _dsir_recipe_docs(spark, 11, 10, _DSIR_CODE_W, "code")
    docs = prose.unionByName(code)
    target = _dsir_recipe_target(spark)

    out = str(tmp_path / "dsir")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        dsir={"target": target, "n_select": 12, "buckets": 512},
    )
    cfg = m["config"]["dsir"]
    assert cfg["model"]["format"] == "spark-graft-dsir/v1"
    assert cfg["n_select"] == 12 and cfg["salt"] == "train-v1:dsir"
    # manifest (model included) survives a JSON round-trip identically
    assert json.loads(json.dumps(m)) == m
    assert m["stage_rows"]["dsir"] == 12 and m["rows"] == 12
    data, _ = C.read_training_set(spark, out)
    kept0 = {r.doc_id for r in data.collect()}
    assert "__dsir_logw_e6" not in data.columns
    # selection is target-biased: all 10 prose docs survive, the
    # remaining 2 slots go to code by Gumbel noise
    assert {i for i in kept0 if i <= 10} == set(range(1, 11))
    assert len({i for i in kept0 if i > 10}) == 2
    # the pool stores the per-doc weight for extension-time reuse
    pool = spark.read.parquet(f"{out}/premix")
    assert "__dsir_logw_e6" in pool.columns
    assert pool.where("__dsir_logw_e6 IS NULL").count() == 0

    # extension: 3 new prose docs outrank the code stragglers -> the
    # re-derived selection EVICTS them (append-only cannot express
    # this), scored under the recorded model, batch-only
    batch = _dsir_recipe_docs(spark, 30, 3, _DSIR_PROSE_W, "web")
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    assert m2["epochs"] == 2 and m2["rows"] == 12
    assert m2["stage_rows"]["dsir"] == 12
    data2, man2 = C.read_training_set(spark, out, ordered=True)
    kept2 = {r.doc_id for r in data2.collect()}
    assert {i for i in kept2 if i >= 30} == {30, 31, 32}
    assert not {i for i in kept2 if 10 < i < 30}, "code evicted"
    assert man2["data_dir"].startswith("data_v2_"), "snapshot publish"

    # fresh union build under the RECORDED model == extension
    out_b = str(tmp_path / "dsir_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        dsir={"model": cfg["model"], "n_select": 12},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in data2.collect()] == [
        tuple(r) for r in db.collect()
    ]

    # a salt redraw changes the selection deterministically (noise is
    # a pure function of (salt, id): only the near-equal-weight tail
    # re-rolls; both draws replay identically)
    out_s = str(tmp_path / "dsir_s")
    ms = C.materialize_training_set(
        spark, docs, out_s, num_shards=2,
        dsir={"model": cfg["model"], "n_select": 12, "salt": "redraw"},
    )
    assert ms["config"]["dsir"]["salt"] == "redraw"
    kept_s = {
        r.doc_id for r in C.read_training_set(spark, out_s)[0].collect()
    }
    assert kept_s != kept0
    assert {i for i in kept_s if i <= 10} == set(range(1, 11))


def test_dsir_with_mixture_composes_and_extends(spark, tmp_path):
    """DSIR + mixture in one recipe: selection runs BEFORE mixture
    (the solved proportions are the output contract), both re-derive
    from the pool on extension, and extension == fresh union build
    under the recorded model."""
    docs = _dsir_recipe_docs(
        spark, 1, 10, _DSIR_PROSE_W, "web"
    ).unionByName(_dsir_recipe_docs(spark, 11, 10, _DSIR_CODE_W, "code"))
    out = str(tmp_path / "dm")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        dsir={"target": _dsir_recipe_target(spark), "n_select": 15,
              "buckets": 512},
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
    )
    # dsir keeps all 10 web + 5 code; the code stratum binds
    assert m["stage_rows"]["dsir"] == 15
    assert m["config"]["solved_mixture_rates"]["code"] == 1.0
    batch = _dsir_recipe_docs(spark, 30, 3, _DSIR_PROSE_W, "web")
    C.extend_training_set(spark, batch, out)
    da, ma = C.read_training_set(spark, out, ordered=True)
    out_b = str(tmp_path / "dm_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        dsir={"model": m["config"]["dsir"]["model"], "n_select": 15},
        mixture={"web": 0.5, "code": 0.5},
        strata_col="source",
    )
    db, mb = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]
    assert (
        ma["config"]["solved_mixture_rates"]
        == mb["config"]["solved_mixture_rates"]
    )


def test_dsir_config_validation(spark, tmp_path):
    docs = _dsir_recipe_docs(spark, 1, 6, _DSIR_PROSE_W, "web")
    target = _dsir_recipe_target(spark)
    out = str(tmp_path / "v")
    with pytest.raises(ValueError, match="n_select"):
        C.materialize_training_set(
            spark, docs, out, dsir={"target": target}
        )
    with pytest.raises(ValueError, match="n_select"):
        C.materialize_training_set(
            spark, docs, out, dsir={"target": target, "n_select": 0}
        )
    with pytest.raises(ValueError, match="exactly ONE"):
        C.materialize_training_set(
            spark, docs, out, dsir={"n_select": 3}
        )
    with pytest.raises(ValueError, match="exactly ONE"):
        C.materialize_training_set(
            spark, docs, out,
            dsir={"target": target, "model": {"format": "x"},
                  "n_select": 3},
        )
    with pytest.raises(ValueError, match="not a dsir_fit model"):
        C.materialize_training_set(
            spark, docs, out,
            dsir={"model": {"format": "x"}, "n_select": 3},
        )


def test_qcls_tier_in_recipe_and_extension(spark, tmp_path):
    """r11: the training-set recipe gains a LEARNED quality gate —
    build fits the fastText-style classifier (recorded in the
    manifest like the DSIR model), drops rows under ``min_prob``;
    extension gates the NEW batch under the RECORDED model; extended
    set == fresh union build under the recorded model; drop
    accounting gains a qcls stage; the manifest (model included)
    survives JSON."""
    prose = _dsir_recipe_docs(spark, 1, 10, _DSIR_PROSE_W, "web")
    code = _dsir_recipe_docs(spark, 11, 10, _DSIR_CODE_W, "code")
    docs = prose.unionByName(code)
    # fit frames share the corpus sentence TEMPLATE so the filler
    # words sit on both sides (near-zero weight) and the domain vocab
    # carries the decision boundary
    pos_fit = _dsir_recipe_docs(spark, 900, 8, _DSIR_PROSE_W, "pw")
    neg_fit = _dsir_recipe_docs(spark, 950, 8, _DSIR_CODE_W, "pc")

    out = str(tmp_path / "qcls")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        qcls={"pos": pos_fit, "neg": neg_fit, "min_prob": 0.5,
              "buckets": 512},
    )
    cfg = m["config"]["qcls"]
    assert cfg["model"]["format"] == "spark-graft-qcls/v1"
    assert cfg["min_prob"] == 0.5
    assert json.loads(json.dumps(m)) == m
    assert m["stage_rows"]["qcls"] == 10 and m["rows"] == 10
    data, _ = C.read_training_set(spark, out)
    assert {r.doc_id for r in data.collect()} == set(range(1, 11))

    # extension: mixed batch, gated under the RECORDED model —
    # prose survives, code drops
    batch = _dsir_recipe_docs(spark, 30, 3, _DSIR_PROSE_W, "web") \
        .unionByName(_dsir_recipe_docs(spark, 33, 3, _DSIR_CODE_W, "code"))
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    assert m2["stage_rows"]["qcls"] == 3 and m2["epochs"] == 2
    data2, _ = C.read_training_set(spark, out, ordered=True)
    assert {r.doc_id for r in data2.collect()} == (
        set(range(1, 11)) | {30, 31, 32}
    )

    # fresh union build under the RECORDED model == extension
    out_b = str(tmp_path / "qcls_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        qcls={"model": cfg["model"], "min_prob": 0.5},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in data2.collect()] == [
        tuple(r) for r in db.collect()
    ]


def test_qcls_with_dsir_composes(spark, tmp_path):
    """qcls (row-local gate, stage 1b) composes with DSIR (global
    selection, stage 3c): the classifier narrows the pool, the
    selection then resamples within it; both models recorded; the
    extension path replays both and equals a fresh union build."""
    docs = _dsir_recipe_docs(
        spark, 1, 10, _DSIR_PROSE_W, "web"
    ).unionByName(_dsir_recipe_docs(spark, 11, 10, _DSIR_CODE_W, "code"))
    out = str(tmp_path / "qd")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        qcls={"pos": _dsir_recipe_docs(spark, 900, 8, _DSIR_PROSE_W, "pw"),
              "neg": _dsir_recipe_docs(spark, 950, 8, _DSIR_CODE_W, "pc"),
              "min_prob": 0.5, "buckets": 512},
        dsir={"target": _dsir_recipe_target(spark), "n_select": 8,
              "buckets": 512},
    )
    # the gate dropped all code BEFORE the selection: 20 -> 10 -> 8
    assert m["stage_rows"]["qcls"] == 10
    assert m["stage_rows"]["dsir"] == 8 and m["rows"] == 8
    kept = {r.doc_id
            for r in C.read_training_set(spark, out)[0].collect()}
    assert kept <= set(range(1, 11)) and len(kept) == 8

    batch = _dsir_recipe_docs(spark, 30, 3, _DSIR_PROSE_W, "web")
    C.extend_training_set(spark, batch, out)
    da, _ = C.read_training_set(spark, out, ordered=True)
    out_b = str(tmp_path / "qd_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        qcls={"model": m["config"]["qcls"]["model"], "min_prob": 0.5},
        dsir={"model": m["config"]["dsir"]["model"], "n_select": 8},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]


def test_qcls_config_validation(spark, tmp_path):
    docs = _dsir_recipe_docs(spark, 1, 6, _DSIR_PROSE_W, "web")
    pos = _dsir_recipe_docs(spark, 900, 8, _DSIR_PROSE_W, "pw")
    out = str(tmp_path / "v")
    with pytest.raises(ValueError, match="min_prob"):
        C.materialize_training_set(spark, docs, out, qcls={"pos": pos})
    with pytest.raises(ValueError, match="min_prob"):
        C.materialize_training_set(
            spark, docs, out, qcls={"pos": pos, "min_prob": 1.0}
        )
    with pytest.raises(ValueError, match="min_prob"):
        C.materialize_training_set(
            spark, docs, out, qcls={"pos": pos, "min_prob": True}
        )
    with pytest.raises(ValueError, match="exactly ONE"):
        C.materialize_training_set(
            spark, docs, out, qcls={"min_prob": 0.5}
        )
    with pytest.raises(ValueError, match="exactly ONE"):
        C.materialize_training_set(
            spark, docs, out,
            qcls={"pos": pos, "model": {"format": "x"}, "min_prob": 0.5},
        )
    with pytest.raises(ValueError, match="not a quality_classifier_fit"):
        C.materialize_training_set(
            spark, docs, out,
            qcls={"model": {"format": "x"}, "min_prob": 0.5},
        )
    with pytest.raises(ValueError, match="only meaningful"):
        C.materialize_training_set(
            spark, docs, out,
            qcls={"model": {"format": "spark-graft-qcls/v1"},
                  "neg": docs, "min_prob": 0.5},
        )


def test_extension_spreads_cross_contact_through_batch_components(
    spark, tmp_path
):
    """r11 (closing the ADVICE residual for the lexical tiers): a
    batch doc that chains to the corpus only THROUGH a within-batch
    dedup loser must still drop — the loser's universe contact
    spreads through the within-batch component, exactly as a fresh
    union build folds the whole component into the universe's group.
    X ~ Y ~ U but X !~ U: the old survivor-only probe kept X."""
    U = ("the ancient lighthouse keeper counted the ships that passed "
         "the rocky northern headland every cold morning before dawn "
         "and noted each hull number in the thick leather journal "
         "that the harbor master reviewed at the end of every long "
         "winter season")
    uw = U.split()
    yw = uw[:]
    yw[10:12] = ["tall", "cliffs"]          # Y: near-dup of U (J≈0.81)
    Y = " ".join(yw)
    xw = yw[:]
    xw[28:30] = ["worn", "canvas"]          # X: near-dup of Y, NOT of U
    X = " ".join(xw)
    base = _docs(spark, [
        (1, U, "web"),
        (2, T2, "web"),
        (3, T3, "web"),
    ])
    out = str(tmp_path / "chain")
    C.materialize_training_set(
        spark, base, out, num_shards=2, dedup_threshold=0.7
    )
    # sanity: the chain shape is real at this threshold (X-U below,
    # X-Y and Y-U above)
    from etl_workflow_spark.operators.dedup import minhash_lsh_pairs

    trio = _docs(spark, [(1, U, "w"), (50, X, "w"), (51, Y, "w")])
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(
        trio, threshold=0.7
    ).collect()}
    assert (1, 51) in pairs and (50, 51) in pairs
    assert (1, 50) not in pairs, "fixture drift: X must not touch U"

    batch = _docs(spark, [(50, X, "web"), (51, Y, "web")])
    m = C.extend_training_set(spark, batch, out, audit=True)
    assert m["appended_rows"] == 0
    ids = {r.doc_id for r in C.read_training_set(spark, out)[0].collect()}
    assert 50 not in ids and 51 not in ids
    # extension == fresh union build (the contract the spread exists
    # to preserve)
    out_b = str(tmp_path / "chain_b")
    mb = C.materialize_training_set(
        spark, base.unionByName(batch), out_b, num_shards=2,
        dedup_threshold=0.7,
    )
    db = {r.doc_id for r in C.read_training_set(spark, out_b)[0].collect()}
    assert db == ids and mb["rows"] == m["rows"]
    # the audit curve shows the spread happening in the near tier
    assert m["stage_rows"]["deduped_within_batch"] == 1   # X beat Y
    assert m["stage_rows"]["cross_neardup"] == 0          # ...then fell


def test_extension_spreads_semantic_contact_through_batch_components(
    spark, tmp_path
):
    """r11: the SEMANTIC twin of the lexical chain closure — a batch
    doc whose only corpus link runs through a within-batch SEMANTIC
    loser must still drop. Embeddings with cos(X,Y) = cos(Y,U) ≈ 0.96
    ≥ 0.95 but cos(X,U) ≈ 0.84: within-batch semdedup drops Y (min-id
    keeps X), and the old survivor-only probe kept X; spreading the
    contact through the within-batch component drops both — extension
    == fresh union build."""
    import math

    a = math.radians(16.26)  # cos a ≈ 0.960, cos 2a ≈ 0.843
    U = [1.0, 0.0, 0.0, 0.0]
    Y = [math.cos(a), math.sin(a), 0.0, 0.0]
    X = [math.cos(2 * a), math.sin(2 * a), 0.0, 0.0]
    base = _vdocs(spark, [
        (1, "the lighthouse keeper counted the passing ships from the "
            "rocky northern headland each morning", "web", U),
        (2, "a completely unrelated report about quarterly grain "
            "shipments moving through the inland depots", "web",
            [0.0, 0.0, 0.0, 1.0]),
    ])
    out = str(tmp_path / "semchain")
    kwargs = dict(
        num_shards=2,
        semantic_dedup={"vec_col": "embedding",
                        "centroids": [[1.0, 0.0, 0.0, 0.0],
                                      [0.0, 0.0, 0.0, 1.0]]},
    )
    C.materialize_training_set(spark, base, out, **kwargs)
    batch = _vdocs(spark, [
        # X: near Y only — its corpus link runs THROUGH Y
        (30, "fresh prose about orchard harvests and the long autumn "
             "ladders leaning on the trees", "web", X),
        # Y: near both X and the existing corpus doc U
        (31, "different sentences describing the evening ferry crossing "
             "and its patient passengers", "web", Y),
    ])
    m = C.extend_training_set(spark, batch, out, audit=True)
    ids = {r.doc_id for r in C.read_training_set(spark, out)[0].collect()}
    assert ids == {1, 2}, f"chained batch docs must both drop, got {ids}"
    # the curve shows the spread: within-batch kept X, the cross tier
    # then dropped it through Y's corpus contact
    assert m["stage_rows"]["semantic_within_batch"] == 1
    assert m["stage_rows"]["cross_semantic"] == 0

    # fresh union build under the same recorded clustering agrees
    out_b = str(tmp_path / "semchain_b")
    mb = C.materialize_training_set(
        spark, base.unionByName(batch), out_b, **kwargs
    )
    db = {r.doc_id for r in C.read_training_set(spark, out_b)[0].collect()}
    assert db == ids and mb["rows"] == m["rows"]


def test_training_set_report(spark, tmp_path, base_docs, holdout):
    """Data-card generator (r11): manifest-only (no data scan), recipe
    and drop accounting faithfully reflected, both output modes."""
    out = str(tmp_path / "train_report")
    manifest = C.materialize_training_set(
        spark, base_docs, out, benchmark=holdout, num_shards=4,
        audit=True,
    )
    rep = C.training_set_report(spark, out)
    rows = {(r["section"], r["key"]): r["value"] for r in rep.collect()}
    assert rows[("size", "rows")] == str(manifest["rows"])
    assert rows[("size", "tokens")] == str(manifest["tokens"])
    assert rows[("identity", "epochs")] == "1"
    assert rows[("recipe", "decontaminated")] == "True"
    assert rows[("recipe", "lexical_dedup")] == "True"
    assert ("recipe", "dsir_selection") not in rows  # not configured
    # drop accounting with per-stage deltas
    assert rows[("stages", "input")] == "8"
    assert rows[("stages", "quality")].startswith("7 (-1)")
    # markdown mode renders every section
    md = C.training_set_report(spark, out, markdown=True)
    for sec in ("identity", "size", "recipe", "stages", "integrity"):
        assert f"## {sec}" in md
    assert "**rows**: 5" in md


def test_diff_training_sets(spark, tmp_path, base_docs, holdout):
    """Snapshot membership diff (r11): extension survivors show as
    'added', a rebuilt subset shows its drops as 'removed', identical
    sets diff empty, mismatched units are refused."""
    out_a = str(tmp_path / "diff_a")
    C.materialize_training_set(
        spark, base_docs, out_a, benchmark=holdout, num_shards=4
    )
    # a second set missing docs 4 and 5, plus a new doc 9
    docs_b = base_docs.where("doc_id not in (4, 5)").unionByName(
        _docs(spark, [(9, "a perfectly ordinary fresh document about "
                          "the engine", "web")])
    )
    out_b = str(tmp_path / "diff_b")
    C.materialize_training_set(
        spark, docs_b, out_b, benchmark=holdout, num_shards=4
    )
    got = {(r["id"], r["status"])
           for r in C.diff_training_sets(spark, out_a, out_b).collect()}
    assert got == {(9, "added"), (4, "removed"), (5, "removed")}
    # identical sets: empty diff
    assert C.diff_training_sets(spark, out_a, out_a).count() == 0
    # unit mismatch refused (packed-chunk set vs document set)
    out_c = str(tmp_path / "diff_c")
    C.materialize_training_set(
        spark, base_docs, out_c, benchmark=holdout, num_shards=4,
        chunk_tokens=16, pack_budget=64,
    )
    with pytest.raises(ValueError, match="different units"):
        C.diff_training_sets(spark, out_a, out_c)


# ------------------------------------------ published page filters (r13)

_PF_WORDS = (
    "meadow", "harbor", "signal", "lantern", "granite", "willow",
    "copper", "thicket", "breeze", "saddle", "timber", "anchor",
)

_PF_JUNK_LINE = "this junk line has no terminal punctuation at all"


def _pf_line(i, j):
    w = _PF_WORDS
    a = w[(i + j) % 12]
    b = w[(i + 2 * j + 3) % 12]
    c = w[(i * 5 + j * 7 + 1) % 12]
    return (
        f"the {a} and the {b} have kept p{i}x{j} beside {c} "
        "to fill one more line of page text."
    )


def _pf_good_page(i):
    """Passes every tier; carries one junk line the c4 rewrite strips."""
    return "\n".join([_pf_line(i, j) for j in range(6)] + [_PF_JUNK_LINE])


def _pf_short_page(i):
    """Gopher-fail (32 words < 50) but c4-pass (4 lines of 8 words)."""
    w = _PF_WORDS
    return "\n".join(
        f"the {w[(i + j) % 12]} and {w[(i + j + 5) % 12]} have kept "
        f"w{j} steady."
        for j in range(4)
    )


def _pf_brace_page(i):
    """C4 page-drop: a brace line on an otherwise good page."""
    return _pf_good_page(i) + "\ncode { sample }"


def _pf_spam_page(word):
    """Compression-fail: 120 identical lines deflate to almost nothing."""
    return "\n".join(
        [f"the {word} and the {word} have kept {word} steady again."] * 120
    )


def _pf_gibberish_page(i):
    """LM-fail: stopword scaffolding around out-of-vocabulary tokens."""
    return "\n".join(
        f"the zyx{i}v{j}q and gru{i}b{j}x have nil{i}k{j}w kept "
        f"voz{i}m{j}r beside qof{i}t{j}d to end."
        for j in range(6)
    )


def _pf_reference_frames(spark):
    """The lm filter's reference corpus counts: the good-page template
    over ids 900-919, so good pages' bigrams are in-model and
    gibberish is OOV."""
    from etl_workflow_spark.operators import text as T

    ref = _docs(
        spark,
        [(i, "\n".join(_pf_line(i, j) for j in range(6)), "web")
         for i in range(900, 920)],
    )
    return (
        ref,
        T.vocab_counts(ref, lowercase=True),
        T.adjacent_bigram_counts(ref),
    )


def _pf_thresholds(spark, pages, uni, big):
    """Derive the lm/compression bounds from the REWRITTEN pages (the
    recipe scores after the c4 rewrite) and assert the separation the
    fixtures are built for, so a template drift fails here loudly."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.operators import text as T

    rewritten = T.c4_line_filter(pages).where("NOT dropped").select(
        "doc_id", F.col("kept_text").alias("text")
    )
    nll = {
        r["doc_id"]: r["avg_nll_e6"]
        for r in T.lm_score(
            rewritten, unigrams=uni, bigrams=big
        ).collect()
    }
    ratio = {
        r["doc_id"]: r["compression_ratio_e4"]
        for r in T.compression_ratio(rewritten).collect()
    }
    good = [d for d in nll if d not in (13, 14, 34, 35)]
    lm_thr = int((max(nll[d] for d in good) + min(
        nll[d] for d in nll if d in (14, 35)
    )) // 2)
    assert all(nll[d] <= lm_thr for d in good)
    assert all(nll[d] > lm_thr for d in nll if d in (14, 35))
    spam = [d for d in ratio if d in (13, 34)]
    if not spam:
        return lm_thr, None
    comp_thr = int((max(ratio[d] for d in spam)
                    + min(ratio[d] for d in good)) // 2)
    assert all(ratio[d] >= comp_thr for d in good)
    assert all(ratio[d] < comp_thr for d in spam)
    return lm_thr, comp_thr


def test_page_filters_in_recipe_and_extension(spark, tmp_path):
    """r13: the published page filters (c4 rewrite, gopher,
    compression bounds, lm threshold under a frozen reference model)
    run as recorded, drop-accounted recipe tiers; extension gates the
    new batch under the RECORDED config + snapshot; extended set ==
    fresh union rebuild; the c4 rewrite reaches the written text."""
    import zlib

    build_rows = [
        (1, _pf_good_page(1), "web"),
        (2, _pf_good_page(2), "web"),
        (3, _pf_good_page(3), "web"),
        (4, _pf_good_page(4), "web"),
        (11, _pf_short_page(11), "web"),        # gopher-fail
        (12, _pf_brace_page(12), "web"),        # c4-fail
        (13, _pf_spam_page("spam"), "web"),     # compression-fail
        (14, _pf_gibberish_page(14), "web"),    # lm-fail
    ]
    batch_rows = [
        (30, _pf_good_page(30), "web"),
        (31, _pf_good_page(31), "web"),
        (32, _pf_brace_page(32), "web"),        # c4-fail
        (33, _pf_short_page(33), "web"),        # gopher-fail
        (34, _pf_spam_page("eggs"), "web"),     # compression-fail
        (35, _pf_gibberish_page(35), "web"),    # lm-fail
    ]
    docs = _docs(spark, build_rows)
    batch = _docs(spark, batch_rows)
    _, uni, big = _pf_reference_frames(spark)
    lm_thr, comp_thr = _pf_thresholds(
        spark, docs.unionByName(batch), uni, big
    )
    pf = {
        "c4": True,
        "gopher": True,
        "compression": {"min_ratio_e4": comp_thr},
        "lm": {"max_avg_nll_e6": lm_thr, "unigrams": uni, "bigrams": big},
    }

    out = str(tmp_path / "pf")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True, page_filters=pf
    )
    cfg = m["config"]["page_filters"]
    assert cfg["c4"] == {"min_words": 5, "min_lines": 3, "rewrite": True}
    assert cfg["gopher"] is True
    assert cfg["compression"]["min_ratio_e4"] == comp_thr
    assert cfg["compression"]["zlib_version"] == zlib.ZLIB_RUNTIME_VERSION
    assert cfg["lm"] == {
        "max_avg_nll_e6": lm_thr,
        "model_dir": "lm_model",
        "smoothing": "laplace",
    }
    assert json.loads(json.dumps(m)) == m
    # drop accounting: one page per tier
    sr = m["stage_rows"]
    assert sr["input"] == 8 and sr["quality"] == 8
    assert sr["c4"] == 7 and sr["gopher"] == 6
    assert sr["compression"] == 5 and sr["lm_filter"] == 4
    assert m["rows"] == 4
    data, _ = C.read_training_set(spark, out)
    rows = data.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3, 4}
    # the c4 rewrite reached the WRITTEN corpus
    assert all(_PF_JUNK_LINE not in r["text"] for r in rows)
    assert all(r["text"] == "\n".join(
        _pf_line(r["doc_id"], j) for j in range(6)
    ) for r in rows)
    # the frozen model snapshot exists inside the set
    assert spark.read.parquet(f"{out}/lm_model/unigrams").count() > 0

    # extension: each tier drops its page under the recorded config
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    sr2 = m2["stage_rows"]
    assert sr2["c4"] == 5 and sr2["gopher"] == 4
    assert sr2["compression"] == 3 and sr2["lm_filter"] == 2
    data2, _ = C.read_training_set(spark, out, ordered=True)
    assert {r["doc_id"] for r in data2.collect()} == {1, 2, 3, 4, 30, 31}

    # fresh union rebuild under the SAME config == extension
    out_b = str(tmp_path / "pf_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        page_filters=pf,
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in data2.collect()] == [
        tuple(r) for r in db.collect()
    ]
    # the data card surfaces the recorded filters
    report = C.training_set_report(spark, out, markdown=True)
    assert "page_filters" in report and "lm_filter" in report


def test_page_filters_store_mode_snapshot_and_guards(
    spark, tmp_path, monkeypatch
):
    """r13: store-mode lm filters snapshot the stores' CURRENT merged
    counts at build — later store ingest does not drift the recorded
    gate; extensions refuse a different zlib build when compression
    bounds are recorded; config validation refuses ambiguous shapes."""
    import zlib

    from etl_workflow_spark.streaming import incremental as inc

    docs = _docs(spark, [
        (1, _pf_good_page(1), "web"),
        (2, _pf_good_page(2), "web"),
        (14, _pf_gibberish_page(14), "web"),
    ])
    ref, uni, big = _pf_reference_frames(spark)
    lm_thr, _ = _pf_thresholds(
        spark,
        docs.unionByName(_docs(spark, [(35, _pf_gibberish_page(35),
                                        "web")])),
        uni, big,
    )
    vstore = str(tmp_path / "vstore")
    bstore = str(tmp_path / "bstore")
    inc.vocab_rollup_batch(ref, vstore, 0)
    inc.bigram_rollup_batch(ref, bstore, 0)

    out = str(tmp_path / "pf_store")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2,
        page_filters={"lm": {"max_avg_nll_e6": lm_thr,
                             "vocab_store": vstore,
                             "bigram_store": bstore}},
    )
    assert m["config"]["page_filters"]["lm"]["model_dir"] == "lm_model"
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 2}

    # poison the source store AFTER the build: the gibberish corpus
    # ingests, which would legitimize id-35 pairs — but the recipe
    # scores under the FROZEN snapshot, so the extension still drops it
    inc.vocab_rollup_batch(
        _docs(spark, [(i, _pf_gibberish_page(35), "web")
                      for i in range(700, 720)]), vstore, 1,
    )
    inc.bigram_rollup_batch(
        _docs(spark, [(i, _pf_gibberish_page(35), "web")
                      for i in range(700, 720)]), bstore, 1,
    )
    C.extend_training_set(
        spark,
        _docs(spark, [(30, _pf_good_page(30), "web"),
                      (35, _pf_gibberish_page(35), "web")]),
        out,
    )
    data2, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data2.collect()} == {1, 2, 30}

    # zlib build mismatch on a compression-configured set: refused
    out2 = str(tmp_path / "pf_zlib")
    C.materialize_training_set(
        spark, docs.where("doc_id < 10"), out2, num_shards=2,
        page_filters={"compression": {"min_ratio_e4": 100}},
    )
    monkeypatch.setattr(zlib, "ZLIB_RUNTIME_VERSION", "0.0-test")
    with pytest.raises(ValueError, match="zlib"):
        C.extend_training_set(
            spark, _docs(spark, [(40, _pf_good_page(40), "web")]), out2
        )
    monkeypatch.undo()

    # config validation
    bad = [
        ({"nope": True}, "unknown page_filters keys"),
        ({"gopher": {"n_words": 1}}, "takes no parameters"),
        ({"c4": {"min_words": 0}}, "must be positive"),
        ({"compression": {"level": 6}}, "gates nothing"),
        ({"compression": {}}, "selects no filter"),
        ({"compression": {"min_ratio_e4": 9, "max_ratio_e4": 1}},
         "bounds cross"),
        ({"lm": {"max_avg_nll_e6": lm_thr}}, "exactly ONE"),
        ({"lm": {"max_avg_nll_e6": lm_thr, "unigrams": uni,
                 "bigrams": big, "vocab_store": vstore,
                 "bigram_store": bstore}}, "exactly ONE"),
        ({"lm": {"max_avg_nll_e6": 0, "unigrams": uni, "bigrams": big}},
         "positive"),
        ({}, "selects no filter"),
    ]
    for pf_bad, msg in bad:
        with pytest.raises(ValueError, match=msg):
            C.materialize_training_set(
                spark, docs, str(tmp_path / "never"), page_filters=pf_bad
            )


def test_page_filters_compose_with_mixture_pool(spark, tmp_path):
    """r13: page filters compose with the globally-selected (mixture)
    path — the batch gates through the pooled extension's recipe
    prefix, and the re-derived kept set equals a fresh union build."""
    rows = [(i, _pf_good_page(i), "web" if i % 2 else "code")
            for i in range(1, 9)]
    docs = _docs(spark, rows)
    out = str(tmp_path / "pf_mix")
    C.materialize_training_set(
        spark, docs, out, num_shards=2,
        page_filters={"c4": True, "gopher": True},
        mixture={"web": 0.5, "code": 0.5}, strata_col="source",
    )
    batch = _docs(spark, [
        (30, _pf_good_page(30), "web"),
        (31, _pf_short_page(31), "code"),       # gopher-fail
    ])
    C.extend_training_set(spark, batch, out)
    da, _ = C.read_training_set(spark, out, ordered=True)
    got = {r["doc_id"] for r in da.collect()}
    # 31 fails gopher under the recorded recipe; whether 30 survives
    # is the mixture's call — equality with the fresh build (below)
    # pins that decision either way
    assert 31 not in got
    out_b = str(tmp_path / "pf_mix_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        page_filters={"c4": True, "gopher": True},
        mixture={"web": 0.5, "code": 0.5}, strata_col="source",
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]


def test_temperature_tier_in_recipe_and_extension(spark, tmp_path):
    """r13: α-tempered stratum rebalancing (XLM-R/mT5) as a recorded
    recipe stage — mutually exclusive with explicit mixture targets;
    the alpha and solved rates land in the manifest; extensions
    re-solve the tempered shares from the grown pool and equal a
    fresh union rebuild; config validation refuses ambiguous shapes."""
    docs = _dsir_recipe_docs(spark, 1, 16, _DSIR_PROSE_W, "web") \
        .unionByName(_dsir_recipe_docs(spark, 21, 4, _DSIR_CODE_W, "code"))
    out = str(tmp_path / "temp")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        temperature=0.5, strata_col="source",
    )
    assert m["config"]["temperature"] == 0.5
    rates = m["config"]["solved_mixture_rates"]
    assert set(rates) == {"web", "code"}
    # 16/4 skew at alpha=0.5 -> code is the binding stratum (kept
    # whole), web downsamples toward the flattened share
    assert rates["code"] >= 0.999 and 0.0 < rates["web"] < 1.0
    assert json.loads(json.dumps(m)) == m
    data, _ = C.read_training_set(spark, out)
    rows = data.collect()
    assert {r.doc_id for r in rows if r.source == "code"} == {
        21, 22, 23, 24
    }
    assert 0 < sum(1 for r in rows if r.source == "web") < 16

    # extension: code batch grows the small stratum, the rates
    # re-solve from the pool, and the kept set equals a fresh rebuild
    batch = _dsir_recipe_docs(spark, 41, 6, _DSIR_CODE_W, "code")
    m2 = C.extend_training_set(spark, batch, out)
    assert m2["config"]["temperature"] == 0.5
    da, _ = C.read_training_set(spark, out, ordered=True)
    out_b = str(tmp_path / "temp_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        temperature=0.5, strata_col="source",
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]

    # validation
    with pytest.raises(ValueError, match="pass one"):
        C.materialize_training_set(
            spark, docs, str(tmp_path / "never"),
            mixture={"web": 1.0}, temperature=0.5, strata_col="source",
        )
    with pytest.raises(ValueError, match="strata_col"):
        C.materialize_training_set(
            spark, docs, str(tmp_path / "never"), temperature=0.5
        )
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        C.materialize_training_set(
            spark, docs, str(tmp_path / "never"),
            temperature=1.5, strata_col="source",
        )


def test_page_filters_kn_smoothing_tier(spark, tmp_path):
    """r13: the recipe's lm filter can gate under interpolated
    Kneser-Ney instead of Laplace — same snapshot tables, the choice
    recorded in the manifest and replayed on extension; unknown
    smoothings refused."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.operators import text as T

    docs = _docs(spark, [
        (1, _pf_good_page(1), "web"),
        (2, _pf_good_page(2), "web"),
        (14, _pf_gibberish_page(14), "web"),
    ])
    _, uni, big = _pf_reference_frames(spark)
    nll = {
        r["doc_id"]: r["avg_nll_e6"]
        for r in T.lm_score_kn(
            docs, unigrams=uni, bigrams=big
        ).collect()
    }
    thr = int((max(nll[1], nll[2]) + nll[14]) // 2)
    assert nll[1] <= thr and nll[2] <= thr and nll[14] > thr
    out = str(tmp_path / "pf_kn")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2,
        page_filters={"lm": {"max_avg_nll_e6": thr, "smoothing": "kn",
                             "unigrams": uni, "bigrams": big}},
    )
    assert m["config"]["page_filters"]["lm"]["smoothing"] == "kn"
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 2}
    # extension replays the recorded KN gate from the frozen snapshot
    C.extend_training_set(
        spark,
        _docs(spark, [(30, _pf_good_page(30), "web"),
                      (35, _pf_gibberish_page(35), "web")]),
        out,
    )
    data2, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data2.collect()} == {1, 2, 30}
    import pytest

    with pytest.raises(ValueError, match="smoothing"):
        C.materialize_training_set(
            spark, docs, str(tmp_path / "never"),
            page_filters={"lm": {"max_avg_nll_e6": thr,
                                 "smoothing": "backoff5",
                                 "unigrams": uni, "bigrams": big}},
        )


# ------------------------------------------ image perceptual dedup (r14)


def _bits_png(bits):
    """A 9×8 PNG whose stdlib-tier dHash is EXACTLY the given bit set:
    the 9×8 canvas makes the (hash_size+1)×hash_size resample the
    identity and the gray-as-RGB luma exact, so bit y*8+x is planted
    by making pixel (y,x) brighter (bit=1) or darker (bit=0) than its
    right neighbor. Full control of pairwise Hamming distances."""
    from etl_workflow_spark.operators import multimodal as M

    px = bytearray()
    for y in range(8):
        row = [100]
        for x in range(8):
            row.append(row[-1] - 10 if (y * 8 + x) in bits else row[-1] + 10)
        for v in row:
            px += bytes((v, v, v))
    return M._png_encode(9, 8, 3, bytes(px))


def _img_docs(spark, rows):
    return spark.createDataFrame(
        [(i, _pf_good_page(i), src, bytearray(p) if p is not None else None)
         for (i, src, p) in rows],
        "doc_id long, text string, source string, payload binary",
    )


_IMG_BASE = frozenset(range(0, 10))          # the corpus image
_IMG_NEAR = _IMG_BASE ^ {20, 21}             # distance 2 from base
_IMG_B = frozenset(range(30, 46))            # distinct image
_IMG_C = frozenset(range(50, 60))            # distinct image


def test_image_dedup_tier_in_recipe_and_extension(spark, tmp_path):
    """r14: image perceptual near-dup as a recorded, drop-accounted
    recipe tier — the build decodes each payload once into the set's
    fingerprint store and keeps one image per Hamming cluster;
    extensions hash only the batch, dedup within it, probe the stored
    corpus fingerprints, and equal a fresh union rebuild."""
    docs = _img_docs(spark, [
        (1, "web", _bits_png(_IMG_BASE)),
        (2, "web", _bits_png(_IMG_NEAR)),    # near-dup of 1 -> dropped
        (3, "web", _bits_png(_IMG_B)),
        (4, "web", _bits_png(_IMG_C)),
        (5, "web", None),                     # NULL payload passes
    ])
    out = str(tmp_path / "img")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        image_dedup={"max_distance": 3},
    )
    cfg = m["config"]["image_dedup"]
    assert cfg == {
        "payload_col": "payload", "method": "dhash", "hash_size": 8,
        "max_distance": 3, "quality_col": None, "allow_fake": True,
        "store_dir": "image_fps", "pillow": False,
    }
    assert json.loads(json.dumps(m)) == m
    sr = m["stage_rows"]
    assert sr["input"] == 5 and sr["deduped"] == 5
    assert sr["image_dedup"] == 4
    assert m["rows"] == 4
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 3, 4, 5}
    # the fingerprint store holds the build's decode-once fragment
    store = spark.read.parquet(f"{out}/image_fps")
    srows = store.collect()
    assert {r["doc_id"] for r in srows} == {1, 2, 3, 4}
    assert all(r["batch_id"] == 0 and r["__method"] == "dhash"
               and r["__hash_size"] == 8 for r in srows)

    # extension: within-batch dedup + cross probe of the stored
    # fingerprints, each drop accounted
    batch = _img_docs(spark, [
        (10, "web", _bits_png(_IMG_BASE ^ {22, 23})),  # near corpus 1
        (11, "web", _bits_png(_IMG_B)),                # exact of corpus 3
        (12, "web", _bits_png(frozenset(range(40, 52)))),
        (13, "web", _bits_png(frozenset(range(40, 52)))),  # dup of 12
        (14, "web", None),
    ])
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    sr2 = m2["stage_rows"]
    assert sr2["image_within_batch"] == 4      # 13 lost to 12
    assert sr2["cross_image"] == 2             # 10, 11 lost to corpus
    da, _ = C.read_training_set(spark, out, ordered=True)
    assert {r["doc_id"] for r in da.collect()} == {1, 3, 4, 5, 12, 14}
    # batch fingerprints appended as the next fragment (epoch 1)
    store2 = spark.read.parquet(f"{out}/image_fps")
    assert {r["doc_id"] for r in store2.where("batch_id = 1").collect()} \
        == {10, 11, 12, 13}

    # fresh union rebuild under the same config == extension
    out_b = str(tmp_path / "img_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        image_dedup={"max_distance": 3},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]
    # the data card surfaces the recorded tier
    report = C.training_set_report(spark, out, markdown=True)
    assert "image_dedup" in report


def test_image_dedup_chain_guards_and_validation(spark, tmp_path):
    """r14: a batch doc whose only corpus link runs THROUGH a
    within-batch image loser still drops (component spread, the r11
    closure); empty batches and all-NULL-payload builds are no-ops;
    extensions refuse a drifted pixel tier and a missing store; the
    config validator refuses ambiguous shapes; quality keep policy
    survives the best-scoring copy."""
    import shutil

    from etl_workflow_spark.operators import multimodal as M

    # planted chain: B1(id 10) -- 2 bits -- B2(id 11) -- 2 bits -- U(1)
    # but B1 -- U = 4 bits > max_distance 3
    u_bits = _IMG_BASE
    b2_bits = _IMG_BASE ^ {20, 21}
    b1_bits = _IMG_BASE ^ {20, 21, 22, 23}
    docs = _img_docs(spark, [(1, "web", _bits_png(u_bits)),
                             (2, "web", _bits_png(_IMG_B))])
    out = str(tmp_path / "chain")
    C.materialize_training_set(
        spark, docs, out, num_shards=2, image_dedup={"max_distance": 3},
    )
    batch = _img_docs(spark, [(10, "web", _bits_png(b1_bits)),
                              (11, "web", _bits_png(b2_bits))])
    C.extend_training_set(spark, batch, out)
    da, _ = C.read_training_set(spark, out)
    # 11 contacts corpus 1; 10 is dragged down through the {10,11}
    # within-batch component even though 10 alone is 4 bits from 1
    assert {r["doc_id"] for r in da.collect()} == {1, 2}
    out_b = str(tmp_path / "chain_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        image_dedup={"max_distance": 3},
    )
    db, _ = C.read_training_set(spark, out_b)
    assert {r["doc_id"] for r in db.collect()} == {1, 2}

    # empty extension batch: no-op, store gains an empty fragment
    C.extend_training_set(spark, _img_docs(spark, []), out)
    da2, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in da2.collect()} == {1, 2}

    # all-NULL-payload build: the tier is a recorded no-op
    out_n = str(tmp_path / "nullpay")
    mn = C.materialize_training_set(
        spark, _img_docs(spark, [(1, "web", None), (2, "web", None)]),
        out_n, num_shards=2, image_dedup={},
    )
    assert mn["rows"] == 2
    C.extend_training_set(
        spark, _img_docs(spark, [(3, "web", _bits_png(_IMG_B))]), out_n
    )
    dn, _ = C.read_training_set(spark, out_n)
    assert {r["doc_id"] for r in dn.collect()} == {1, 2, 3}

    # pixel-tier drift: a runtime where Pillow "appears" must refuse
    import pytest as _pytest

    orig = M._PIL_IMAGE
    M._PIL_IMAGE = object()
    try:
        with _pytest.raises(ValueError, match="[Pp]illow"):
            C.extend_training_set(
                spark,
                _img_docs(spark, [(20, "web", _bits_png(_IMG_C))]),
                out,
            )
    finally:
        M._PIL_IMAGE = orig

    # missing store: refused loudly
    shutil.rmtree(f"{out}/image_fps")
    with _pytest.raises(ValueError, match="fingerprint store"):
        C.extend_training_set(
            spark, _img_docs(spark, [(21, "web", _bits_png(_IMG_C))]), out
        )

    # quality keep policy: the better-scoring near-dup survives
    from pyspark.sql import functions as F

    scored = _img_docs(spark, [
        (1, "web", _bits_png(u_bits)),
        (2, "web", _bits_png(b2_bits)),
    ]).withColumn(
        "quality", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
    )
    out_q = str(tmp_path / "imgq")
    mq = C.materialize_training_set(
        spark, scored, out_q, num_shards=2,
        image_dedup={"quality_col": "quality"},
    )
    assert mq["config"]["image_dedup"]["quality_col"] == "quality"
    dq, _ = C.read_training_set(spark, out_q)
    assert {r["doc_id"] for r in dq.collect()} == {2}

    # config validation
    docs_v = _img_docs(spark, [(1, "web", _bits_png(u_bits))])
    bad = [
        ({"nope": 1}, "unknown image_dedup keys"),
        ({"method": "ahash"}, "must be 'dhash' or 'phash'"),
        ({"hash_size": 9}, "hash_size"),
        ({"max_distance": 0}, "max_distance"),
        ({"payload_col": "missing"}, "payload_col"),
        ({"quality_col": "missing"}, "quality_col"),
        ({"hash_size": 2, "max_distance": 4}, "pigeonhole"),
    ]
    for cfg_bad, msg in bad:
        with _pytest.raises(ValueError, match=msg):
            C.materialize_training_set(
                spark, docs_v, str(tmp_path / "never"),
                image_dedup=cfg_bad,
            )


def test_image_dedup_composes_with_mixture_pool(spark, tmp_path):
    """r14: the image tier composes with the globally-selected
    (mixture) path — fingerprints land beside the premix pool, batch
    survivors enter the pool post-image-dedup, and the re-derived kept
    set equals a fresh union rebuild."""
    docs = _img_docs(spark, [
        (1, "web", _bits_png(_IMG_BASE)),
        (2, "web", _bits_png(_IMG_NEAR)),    # image loser pre-pool
        (3, "web", _bits_png(_IMG_B)),
        (4, "code", _bits_png(_IMG_C)),
        (5, "code", None),
        (6, "code", _bits_png(frozenset(range(10, 24)))),
    ])
    out = str(tmp_path / "img_mix")
    C.materialize_training_set(
        spark, docs, out, num_shards=2,
        image_dedup={"max_distance": 3},
        mixture={"web": 0.5, "code": 0.5}, strata_col="source",
    )
    # the image loser never reached the pool
    pool = spark.read.parquet(f"{out}/premix")
    assert 2 not in {r["doc_id"] for r in pool.select("doc_id").collect()}

    batch = _img_docs(spark, [
        (10, "web", _bits_png(_IMG_BASE ^ {30, 31})),  # near corpus 1
        (11, "web", _bits_png(frozenset(range(33, 47)))),
        (12, "code", _bits_png(frozenset(range(5, 17)))),
    ])
    C.extend_training_set(spark, batch, out)
    da, _ = C.read_training_set(spark, out, ordered=True)
    out_b = str(tmp_path / "img_mix_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        image_dedup={"max_distance": 3},
        mixture={"web": 0.5, "code": 0.5}, strata_col="source",
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]


def test_page_filters_backoff_order3_tier(spark, tmp_path):
    """r14: the recipe's lm filter gates under stupid backoff at an
    explicit higher order (the CCNet 5-gram shape; order 3 here) —
    the full order-tagged count set snapshots into ngrams_<k> slices,
    extensions replay the frozen gate, extended set == fresh union
    rebuild; store mode freezes the stores' build-time counts; config
    validation refuses ambiguous shapes."""
    from etl_workflow_spark.operators import text as T
    from etl_workflow_spark.streaming import incremental as inc

    docs = _docs(spark, [
        (1, _pf_good_page(1), "web"),
        (2, _pf_good_page(2), "web"),
        (14, _pf_gibberish_page(14), "web"),
    ])
    ref, _, _ = _pf_reference_frames(spark)
    counts = {k: T.adjacent_ngram_counts(ref, k) for k in (1, 2, 3)}
    nll = {
        r["doc_id"]: r["avg_nll_e6"]
        for r in T.lm_score_backoff_n(docs, order=3, counts=counts)
        .collect()
    }
    thr = int((max(nll[1], nll[2]) + nll[14]) // 2)
    assert nll[1] <= thr and nll[2] <= thr and nll[14] > thr

    out = str(tmp_path / "pf_bo3")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2,
        page_filters={"lm": {"max_avg_nll_e6": thr,
                             "smoothing": "backoff", "order": 3,
                             "counts": counts}},
    )
    lmc = m["config"]["page_filters"]["lm"]
    assert lmc == {
        "max_avg_nll_e6": thr, "model_dir": "lm_model",
        "smoothing": "backoff", "order": 3, "alpha": 0.4,
        "min_count": 1,
    }
    assert json.loads(json.dumps(m)) == m
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 2}
    # the snapshot holds every order's slice
    assert spark.read.parquet(f"{out}/lm_model/unigrams").count() > 0
    assert spark.read.parquet(f"{out}/lm_model/ngrams_2").count() > 0
    assert spark.read.parquet(f"{out}/lm_model/ngrams_3").count() > 0

    # extension replays the recorded order-3 gate from the snapshot
    batch = _docs(spark, [(30, _pf_good_page(30), "web"),
                          (35, _pf_gibberish_page(35), "web")])
    C.extend_training_set(spark, batch, out)
    data2, _ = C.read_training_set(spark, out, ordered=True)
    assert {r["doc_id"] for r in data2.collect()} == {1, 2, 30}
    # fresh union rebuild under the same config == extension
    out_b = str(tmp_path / "pf_bo3_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        page_filters={"lm": {"max_avg_nll_e6": thr,
                             "smoothing": "backoff", "order": 3,
                             "counts": counts}},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in data2.collect()] == [
        tuple(r) for r in db.collect()
    ]

    # store mode: snapshot freezes the stores' CURRENT merged counts —
    # poisoning the source stores after the build cannot drift the gate
    vstore = str(tmp_path / "bo3_vstore")
    n2store = str(tmp_path / "bo3_n2store")
    n3store = str(tmp_path / "bo3_n3store")
    inc.vocab_rollup_batch(ref, vstore, 0)
    inc.ngram_rollup_batch(ref, n2store, 0, n=2)
    inc.ngram_rollup_batch(ref, n3store, 0, n=3)
    out_s = str(tmp_path / "pf_bo3_store")
    C.materialize_training_set(
        spark, docs, out_s, num_shards=2,
        page_filters={"lm": {"max_avg_nll_e6": thr,
                             "smoothing": "backoff", "order": 3,
                             "vocab_store": vstore,
                             "ngram_stores": {2: n2store, 3: n3store}}},
    )
    gib = _docs(spark, [(i, _pf_gibberish_page(35), "web")
                        for i in range(700, 720)])
    inc.vocab_rollup_batch(gib, vstore, 1)
    inc.ngram_rollup_batch(gib, n2store, 1, n=2)
    inc.ngram_rollup_batch(gib, n3store, 1, n=3)
    C.extend_training_set(
        spark,
        _docs(spark, [(30, _pf_good_page(30), "web"),
                      (35, _pf_gibberish_page(35), "web")]),
        out_s,
    )
    ds, _ = C.read_training_set(spark, out_s)
    assert {r["doc_id"] for r in ds.collect()} == {1, 2, 30}

    # validation
    bad = [
        ({"max_avg_nll_e6": thr, "smoothing": "backoff",
          "counts": counts}, "explicit 'order'"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3,
          "counts": {1: counts[1], 3: counts[3]}}, "missing \\[2\\]"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3},
         "exactly ONE model source"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3,
          "counts": counts, "vocab_store": vstore}, "exactly ONE"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3,
          "unigrams": counts[1], "bigrams": counts[2]},
         "bigram-model source"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3,
          "vocab_store": vstore, "ngram_stores": {2: n2store}},
         "missing \\[3\\]"),
        ({"max_avg_nll_e6": thr, "smoothing": "backoff", "order": 3,
          "counts": counts, "alpha": 1.5}, "alpha"),
        ({"max_avg_nll_e6": thr, "order": 3, "unigrams": counts[1],
          "bigrams": counts[2]}, "backoff-smoothing configuration"),
    ]
    for lm_bad, msg in bad:
        with pytest.raises(ValueError, match=msg):
            C.materialize_training_set(
                spark, docs, str(tmp_path / "never"),
                page_filters={"lm": lm_bad},
            )


def test_video_dedup_tier_in_recipe_and_extension(spark, tmp_path):
    """r14: video near-dup as a recorded recipe tier — per-frame
    fingerprints persist once into the set's video_fps store, videos
    cluster on >= min_matching_frames near frames, extensions probe
    the stored frame fingerprints and equal a fresh union rebuild;
    the frame threshold is recorded and effective; validation."""
    vid_a = b"video payload AAA"      # fake tier: 2 sampled frames
    vid_b = b"video payload BBB"      # 4 sampled frames
    docs = _img_docs(spark, [
        (1, "web", _bits_png(_IMG_BASE)),          # 1-frame still
        (2, "web", _bits_png(_IMG_NEAR)),          # near frame of 1
        (3, "web", vid_a),
        (4, "web", vid_a),                          # all frames match 3
        (5, "web", None),
    ])
    out = str(tmp_path / "vid")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        video_dedup={"max_distance": 3},
    )
    cfg = m["config"]["video_dedup"]
    assert cfg == {
        "payload_col": "payload", "method": "dhash", "hash_size": 8,
        "max_distance": 3, "every_n": 2, "min_matching_frames": 1,
        "quality_col": None, "allow_fake": True,
        "store_dir": "video_fps", "pillow": False,
    }
    assert json.loads(json.dumps(m)) == m
    assert m["stage_rows"]["video_dedup"] == 3
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 3, 5}
    store = spark.read.parquet(f"{out}/video_fps")
    # per-frame rows: 1 each for the stills, 2 each for the fakes
    assert store.count() == 1 + 1 + 2 + 2
    assert {r["frame_idx"] for r in store.where("doc_id = 3").collect()} \
        == {0, 2}

    batch = _img_docs(spark, [
        (10, "web", _bits_png(_IMG_BASE ^ {22, 23})),  # near corpus 1
        (11, "web", vid_a),                             # matches corpus 3
        (12, "web", vid_b),
        (13, "web", vid_b),                             # in-batch dup
        (14, "web", None),
    ])
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    sr2 = m2["stage_rows"]
    assert sr2["video_within_batch"] == 4 and sr2["cross_video"] == 2
    da, _ = C.read_training_set(spark, out, ordered=True)
    assert {r["doc_id"] for r in da.collect()} == {1, 3, 5, 12, 14}
    out_b = str(tmp_path / "vid_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        video_dedup={"max_distance": 3},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]

    # min_matching_frames is recorded AND effective: at 2, the stills'
    # single shared frame no longer pairs, the 2-frame fake dup does
    out2 = str(tmp_path / "vid_mmf")
    m3 = C.materialize_training_set(
        spark, docs, out2, num_shards=2,
        video_dedup={"max_distance": 3, "min_matching_frames": 2},
    )
    assert m3["config"]["video_dedup"]["min_matching_frames"] == 2
    d3, _ = C.read_training_set(spark, out2)
    assert {r["doc_id"] for r in d3.collect()} == {1, 2, 3, 5}

    # image + video tiers compose in one build
    out3 = str(tmp_path / "vid_both")
    C.materialize_training_set(
        spark, docs, out3, num_shards=2, audit=True,
        image_dedup={"max_distance": 3},
        video_dedup={"max_distance": 3, "min_matching_frames": 2},
    )
    d4, _ = C.read_training_set(spark, out3)
    # image tier drops 2 (near still) AND 4 (exact payload); the video
    # tier then finds nothing new at threshold 2
    assert {r["doc_id"] for r in d4.collect()} == {1, 3, 5}

    # validation
    for bad_cfg, msg in [
        ({"every_n": 0}, "every_n"),
        ({"min_matching_frames": 0}, "min_matching_frames"),
        ({"nope": 1}, "unknown video_dedup keys"),
        ({"method": "ahash"}, "must be 'dhash' or 'phash'"),
    ]:
        with pytest.raises(ValueError, match=msg):
            C.materialize_training_set(
                spark, docs, str(tmp_path / "never"), video_dedup=bad_cfg
            )
    # data card surfaces the tier
    report = C.training_set_report(spark, out, markdown=True)
    assert "video_dedup" in report


def _wav_payload(seed, n=8000, extra=0):
    """Seeded broadband 16-bit PCM WAV via stdlib wave (the
    test_llm_ops audio helpers, inlined)."""
    import io
    import random
    import struct
    import wave

    rnd = random.Random(seed)
    xr = random.Random(99)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(
        b"".join(
            struct.pack(
                "<h",
                max(
                    -32768,
                    min(
                        32767,
                        rnd.randint(-12000, 12000)
                        + (xr.randint(-extra, extra) if extra else 0),
                    ),
                ),
            )
            for _ in range(n)
        )
    )
    w.close()
    return buf.getvalue()


def test_audio_dedup_tier_in_recipe_and_extension(spark, tmp_path):
    """r14: audio near-dup as a recorded recipe tier — per-frame H-K
    fingerprints persist once into the set's audio_fps store, clips
    cluster on >= min_matching_frames near frames (fake digest tier
    for opaque payloads AND the real WAV tier in one build),
    extensions probe the stored fingerprints and equal a fresh union
    rebuild; the numpy pin refuses a poisoned manifest; validation."""
    import hashlib as hl

    import numpy as np

    aud_a = b"audio payload AAA"
    aud_b = b"audio payload BBB"
    n_a = 1 + hl.sha256(aud_a).digest()[2] % 8
    n_b = 1 + hl.sha256(aud_b).digest()[2] % 8
    wav_a = _wav_payload(1)
    wav_a2 = _wav_payload(1, extra=400)       # noisy re-take of wav_a
    # default 2048/1024 grid on 8000 samples -> 6 frames, 5 sub-fps
    docs = _img_docs(spark, [
        (1, "web", aud_a),
        (2, "web", aud_a),                     # all frames match 1
        (3, "web", aud_b),
        (4, "web", None),
        (5, "web", wav_a),
        (6, "web", wav_a2),                    # WAV tier near-dup of 5
    ])
    out = str(tmp_path / "aud")
    m = C.materialize_training_set(
        spark, docs, out, num_shards=2, audit=True,
        audio_dedup={"max_distance": 3},
    )
    cfg = m["config"]["audio_dedup"]
    assert cfg == {
        "payload_col": "payload", "frame_size": 2048, "hop": 1024,
        "n_bands": 32, "max_distance": 3, "min_matching_frames": 1,
        "quality_col": None, "allow_fake": True,
        "store_dir": "audio_fps", "numpy": str(np.__version__),
    }
    assert json.loads(json.dumps(m)) == m
    assert m["stage_rows"]["audio_dedup"] == 4
    data, _ = C.read_training_set(spark, out)
    assert {r["doc_id"] for r in data.collect()} == {1, 3, 4, 5}
    store = spark.read.parquet(f"{out}/audio_fps")
    assert store.count() == n_a + n_a + n_b + 5 + 5
    assert {r["frame_idx"] for r in store.where("doc_id = 5").collect()} \
        == {1, 2, 3, 4, 5}

    aud_c = b"audio payload CCC"
    batch = _img_docs(spark, [
        (10, "web", aud_a),                    # matches corpus 1
        (11, "web", aud_c),
        (12, "web", aud_c),                    # in-batch dup of 11
        (13, "web", None),
    ])
    m2 = C.extend_training_set(spark, batch, out, audit=True)
    sr2 = m2["stage_rows"]
    assert sr2["audio_within_batch"] == 3 and sr2["cross_audio"] == 2
    da, _ = C.read_training_set(spark, out, ordered=True)
    assert {r["doc_id"] for r in da.collect()} == {1, 3, 4, 5, 11, 13}
    out_b = str(tmp_path / "aud_b")
    C.materialize_training_set(
        spark, docs.unionByName(batch), out_b, num_shards=2,
        audio_dedup={"max_distance": 3},
    )
    db, _ = C.read_training_set(spark, out_b, ordered=True)
    assert [tuple(r) for r in da.collect()] == [
        tuple(r) for r in db.collect()
    ]

    # min_matching_frames is recorded AND effective: requiring more
    # shared frames than the fake clips have un-pairs them, while the
    # 5-frame WAV re-take still clusters
    out2 = str(tmp_path / "aud_mmf")
    m3 = C.materialize_training_set(
        spark, docs, out2, num_shards=2,
        audio_dedup={"max_distance": 3,
                     "min_matching_frames": n_a + 1},
    )
    assert (
        m3["config"]["audio_dedup"]["min_matching_frames"] == n_a + 1
    )
    d3, _ = C.read_training_set(spark, out2)
    kept3 = {r["doc_id"] for r in d3.collect()}
    assert {1, 2, 3, 4} <= kept3
    if n_a + 1 <= 5:
        assert 6 not in kept3            # WAV re-take still pairs

    # all three media tiers compose in one build: the image tier sees
    # no PNGs here (opaque/WAV payloads fake-hash; only byte-identical
    # payloads collide), video's fake frame chain drops the payload
    # dup 2, audio then finds nothing new; the WAV near-pair 5/6 is
    # audio-tier-only (image/video fake hashes of different bytes
    # never band together)
    out4 = str(tmp_path / "aud_all3")
    m4 = C.materialize_training_set(
        spark, docs, out4, num_shards=2, audit=True,
        image_dedup={"max_distance": 3},
        video_dedup={"max_distance": 3},
        audio_dedup={"max_distance": 3},
    )
    assert all(
        m4["config"][k] for k in
        ("image_dedup", "video_dedup", "audio_dedup")
    )
    d4, _ = C.read_training_set(spark, out4)
    assert {r["doc_id"] for r in d4.collect()} == {1, 3, 4, 5}

    # numpy pin: a manifest recorded under a different numpy refuses
    with open(os.path.join(out, "manifest.json")) as fh:
        man = json.load(fh)
    man["config"]["audio_dedup"]["numpy"] = "0.0.0-poisoned"
    with open(os.path.join(out, "manifest.json"), "w") as fh:
        json.dump(man, fh)
    crc = os.path.join(out, ".manifest.json.crc")
    if os.path.exists(crc):      # hadoop local-FS checksum sidecar
        os.remove(crc)
    with pytest.raises(ValueError, match="numpy"):
        C.extend_training_set(
            spark,
            _img_docs(spark, [(20, "web", aud_b)]),
            out,
        )

    # validation
    for bad_cfg, msg in [
        ({"n_bands": 61}, "n_bands"),
        ({"frame_size": 8}, "frame_size"),
        ({"hop": 0}, "hop"),
        ({"min_matching_frames": 0}, "min_matching_frames"),
        ({"nope": 1}, "unknown audio_dedup keys"),
        ({"n_bands": 3, "max_distance": 3}, "pigeonhole"),
    ]:
        with pytest.raises(ValueError, match=msg):
            C.materialize_training_set(
                spark, docs, str(tmp_path / "never"), audio_dedup=bad_cfg
            )
    # data card surfaces the tier
    report = C.training_set_report(spark, out_b, markdown=True)
    assert "audio_dedup" in report
