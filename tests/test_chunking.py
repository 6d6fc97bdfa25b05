from pyspark.sql import functions as F

from etl_workflow_spark.operators.chunking import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_documents_covers_all_tokens_in_order(spark):
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")])
    out = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4).collect()
    )
    assert out == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t8 t9", 2),
        (2, 0, "a b", 2),
    ]


def test_chunk_documents_overlap_strides(spark):
    df = _docs(spark, [(1, "a b c d e")])
    out = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=3, overlap=1).collect()
    )
    # stride 2: [a b c], [c d e]
    assert out == [(0, "a b c"), (1, "c d e")]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "only")])
    out = chunk_documents(df, chunk_tokens=8).collect()
    assert len(out) == 1 and out[0]["n_tokens"] == 1


def test_pack_sequences_budget_and_conservation(spark):
    df = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(30))) for i in range(40)],
    )
    chunks = chunk_documents(df, chunk_tokens=8)  # 40 docs x 4 chunks
    packed = pack_sequences(chunks, budget_tokens=20, num_shards=4)
    fills = {
        r["pack_id"]: r["fill"]
        for r in packed.groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .collect()
    }
    assert all(f <= 20 for f in fills.values())
    assert packed.count() == chunks.count()
    assert (
        packed.agg(F.sum("n_tokens")).collect()[0][0]
        == chunks.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # determinism: same input -> same assignment
    again = pack_sequences(chunks, budget_tokens=20, num_shards=4)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_pack_sequences_oversized_chunk_gets_own_pack(spark):
    df = _docs(spark, [(1, " ".join(f"w{j}" for j in range(50)))])
    chunks = chunk_documents(df, chunk_tokens=50)
    packed = pack_sequences(chunks, budget_tokens=10, num_shards=2).collect()
    assert len(packed) == 1  # kept, not dropped


def test_pack_sequences_best_fit_tighter_and_conserving(spark):
    """best_fit: same chunk set, every pack within budget, and at
    least as few packs as next_fit on a skew fixture built to make
    next-fit waste space."""
    # sizes alternating 12, 7: next-fit closes a pack per (12, 7) pair
    # at budget 20; BFD pairs 12s with 7s far better (12+7=19)
    rows = [(d, 0, 12 if d % 2 == 0 else 7) for d in range(40)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx int, n_tokens int"
    )
    kw = dict(budget_tokens=20, num_shards=2)
    nf = pack_sequences(chunks, **kw).collect()
    bf = pack_sequences(chunks, strategy="best_fit", **kw).collect()
    assert sorted((r.doc_id, r.chunk_idx) for r in bf) == sorted(
        (r.doc_id, r.chunk_idx) for r in nf
    )
    fills = {}
    for r in bf:
        fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
    assert all(v <= 20 for v in fills.values())
    assert len(fills) <= len({r.pack_id for r in nf})
    # deterministic re-run
    again = pack_sequences(chunks, strategy="best_fit", **kw).collect()
    assert sorted(map(tuple, bf)) == sorted(map(tuple, again))


def test_pack_sequences_best_fit_oversized_own_pack(spark):
    chunks = spark.createDataFrame(
        [(1, 0, 99), (2, 0, 5), (3, 0, 6)],
        "doc_id long, chunk_idx int, n_tokens int",
    )
    out = pack_sequences(
        chunks, budget_tokens=20, num_shards=1, strategy="best_fit"
    ).collect()
    big_pack = next(r.pack_id for r in out if r.doc_id == 1)
    assert [r.doc_id for r in out if r.pack_id == big_pack] == [1]
    assert sorted(r.doc_id for r in out if r.pack_id != big_pack) == [2, 3]


def test_pack_sequences_rejects_unknown_strategy(spark):
    import pytest

    chunks = spark.createDataFrame(
        [(1, 0, 5)], "doc_id long, chunk_idx int, n_tokens int"
    )
    with pytest.raises(ValueError, match="strategy"):
        pack_sequences(chunks, strategy="first_fit")


def test_pack_sequences_property_sweep(spark):
    """Randomized contract check for BOTH strategies: chunk set
    conserved, every pack within budget (oversized chunks isolated),
    and best_fit never uses more packs than next_fit."""
    import random

    rnd = random.Random(17)
    for trial in range(3):
        rows = [
            (d, 0, rnd.choice([1, 3, 7, 11, 19, 25]))
            for d in range(rnd.randint(1, 60))
        ]
        chunks = spark.createDataFrame(
            rows, "doc_id long, chunk_idx int, n_tokens int"
        )
        budget = rnd.choice([10, 20, 24])
        packs = {}
        for strategy in ("next_fit", "best_fit"):
            out = pack_sequences(
                chunks, budget_tokens=budget, num_shards=2,
                strategy=strategy,
            ).collect()
            assert sorted((r.doc_id, r.chunk_idx) for r in out) == sorted(
                (d, i) for d, i, _ in rows
            )
            fills = {}
            for r in out:
                fills[r.pack_id] = fills.get(r.pack_id, 0) + r.n_tokens
            for pid, fill in fills.items():
                members = [r for r in out if r.pack_id == pid]
                assert fill <= budget or (
                    len(members) == 1 and members[0].n_tokens > budget
                ), (trial, strategy, pid, fill)
            packs[strategy] = len(fills)
        assert packs["best_fit"] <= packs["next_fit"], (trial, packs)


def test_chunk_token_ids_matches_python_oracle(spark):
    """Tokenizer-id chunking == an independent pure-Python slicer for
    several (chunk, overlap) shapes, incl. empty and NULL arrays."""
    rows = [
        (1, list(range(10))),
        (2, list(range(3))),
        (3, []),
        (4, None),
        (5, list(range(7))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    from etl_workflow_spark.operators.chunking import chunk_token_ids

    for chunk, ov in ((4, 0), (4, 1), (3, 2), (16, 0)):
        got = {
            (r["doc_id"], r["chunk_idx"]): (
                None if r["ids"] is None else list(r["ids"]),
                r["n_tokens"],
            )
            for r in chunk_token_ids(
                df, ids_col="token_ids", chunk_tokens=chunk, overlap=ov
            ).collect()
        }
        want = {}
        stride = chunk - ov
        for did, ids in rows:
            if ids is None:
                want[(did, 0)] = (None, None)
                continue
            n_chunks = max(-(-(len(ids) - ov) // stride), 1)
            for i in range(n_chunks):
                want[(did, i)] = (
                    ids[i * stride : i * stride + chunk],
                    min(chunk, len(ids) - i * stride),
                )
        assert got == want, (chunk, ov)


def test_chunk_token_ids_feeds_pack_and_conserves(spark, sf_dir):
    """End-to-end with a real tokenizer: encode -> chunk by ids ->
    pack; ids are conserved (overlap=0 flatten == original) and every
    pack respects the budget."""
    from etl_workflow_spark.operators.chunking import (
        chunk_token_ids, pack_sequences,
    )
    from etl_workflow_spark.operators.text import train_bpe, bpe_encode

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(40)
    )
    model = train_bpe(docs, num_merges=50)
    enc = bpe_encode(docs, model, ids=True)
    chunks = chunk_token_ids(
        enc, ids_col="bpe_tokens", chunk_tokens=32
    ).persist()
    try:
        # conservation: per-doc concatenation of chunks == encoded ids
        got = {}
        for r in chunks.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], list(r["ids"]))
            )
        want = {r["doc_id"]: list(r["bpe_tokens"])
                for r in enc.collect() if r["bpe_tokens"] is not None}
        for did, parts in got.items():
            flat = [t for _, ids in sorted(parts) for t in ids]
            assert flat == want[did], did
        packed = pack_sequences(
            chunks.where(F.col("n_tokens") > 0),
            budget_tokens=64, num_shards=4,
        )
        sums = packed.groupBy("pack_id").sum("n_tokens").collect()
        assert all(r["sum(n_tokens)"] <= 64 for r in sums)
    finally:
        chunks.unpersist()
