"""Embedding-cosine near-dup tiers cross-validate against each other:
blocked matmul is exact (same pairs, same e4 fixed-point cosines as
the HOF tier); LSH is a no-false-positive subset."""

from __future__ import annotations

import pytest

from etl_workflow_spark.operators.similarity import (
    embedding_neardup_blocked,
    embedding_neardup_exact,
    embedding_neardup_lsh,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _pairs(df):
    return {(r.vec_a, r.vec_b): r.cosine_e4 for r in df.collect()}


def test_blocked_matches_exact(emb):
    exact = _pairs(embedding_neardup_exact(emb, threshold=0.45))
    assert len(exact) > 0
    for nb in (1, 4):
        blocked = _pairs(embedding_neardup_blocked(emb, threshold=0.45, num_blocks=nb))
        assert set(blocked) == set(exact)
        for k, v in blocked.items():
            assert abs(v - exact[k]) <= 10  # e4 units


def test_lsh_subset_of_exact_with_recall(emb):
    # lower threshold -> more pairs, exercises bucket recall
    exact = _pairs(embedding_neardup_exact(emb, threshold=0.4))
    lsh = _pairs(embedding_neardup_lsh(emb, threshold=0.4))
    assert set(lsh) <= set(exact)  # exact verification: no false positives
    # planted structure at 0.4 is weak similarity; sign-sketch recall is
    # S-curve-bounded — just require a sane floor and no silent empties
    assert len(lsh) >= len(exact) * 0.2
    for k, v in lsh.items():
        assert abs(v - exact[k]) <= 10  # e4 units


import pytest


@pytest.mark.parametrize("small_graph_edges", [2_000_000, 0])
def test_dedup_clusters_chain_and_singletons(spark, small_graph_edges):
    """Both tiers — driver union-find (default bound) and the
    distributed label-propagation loop (bound forced to 0) — must
    produce identical assignments."""
    from etl_workflow_spark.operators.dedup import dedup_clusters

    # chain 1-2-3-4 (diameter 3: needs >1 propagation round), pair 7-6,
    # singletons 5 and 8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 6)], ["doc_a", "doc_b"]
    )
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], ["doc_id"])
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(
            pairs, all_ids=ids, small_graph_edges=small_graph_edges
        ).collect()
    }
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        5: (5, 1), 6: (6, 2), 7: (6, 2), 8: (8, 1),
    }


def test_dedup_clusters_node_bound_falls_through_to_distributed(spark):
    """Edge count under the bound but node count over it: the fast path
    must be skipped, and the distributed loop still gets it right."""
    from etl_workflow_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 6)], ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, small_graph_nodes=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 6: 6, 7: 6}


def test_dedup_clusters_raises_when_not_converged(spark):
    """A chain whose diameter exceeds max_rounds must refuse rather than
    return silently split clusters."""
    from etl_workflow_spark.operators.dedup import dedup_clusters

    # chain 1-2-...-8: min-label needs several rounds to reach the tail
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, small_graph_edges=0, max_rounds=1)


def test_dedup_clusters_without_all_ids_covers_paired_only(spark):
    from etl_workflow_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(10, 20), (20, 30)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10}


# ------------------------------------------------- incremental LSH probe


def test_lsh_probe_matches_full_run_restricted_to_new(spark, sf_dir):
    """Banding is deterministic per document, so probing a new batch
    against the corpus index must yield EXACTLY the full self-join's
    pairs that touch a new doc — the incremental path loses nothing."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.dedup import (
        build_lsh_index,
        minhash_lsh_pairs,
        minhash_lsh_probe,
    )

    docs = table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)

    full = minhash_lsh_pairs(docs, threshold=0.4)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expected = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), r.jaccard_e4)
        for r in full.collect()
        if r.doc_a in new_ids or r.doc_b in new_ids
    }

    idx = build_lsh_index(corpus)
    got_rows = minhash_lsh_probe(new, corpus, index=idx, threshold=0.4).collect()
    got = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), r.jaccard_e4)
        for r in got_rows
    }
    assert got == expected
    assert expected, "fixture must contain near-dup pairs touching new docs"
    # every returned pair touches a new doc
    for a, b, _ in got:
        assert a in new_ids or b in new_ids


def test_lsh_probe_without_prebuilt_index(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.dedup import minhash_lsh_probe

    docs = table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 17 == 3)
    corpus = docs.where(F.col("doc_id") % 17 != 3)
    out = minhash_lsh_probe(new, corpus, threshold=0.4)
    assert out.columns == ["doc_a", "doc_b", "jaccard_e4"]
    out.collect()  # runs end-to-end


# ------------------------------------------------------ distributed kmeans


def test_kmeans_recovers_separated_blobs(spark):
    """Three well-separated gaussian blobs must come back as three
    pure clusters, deterministically across runs."""
    import random

    from etl_workflow_spark.operators.similarity import kmeans

    rnd = random.Random(11)
    centers = [[0.0] * 8, [10.0] * 8, [-10.0] * 8]
    rows = []
    for i in range(300):
        c = i % 3
        rows.append(
            (i, [centers[c][d] + rnd.gauss(0, 0.3) for d in range(8)], c)
        )
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "truth"])

    out1, cents1 = kmeans(df, k=3, dim=8, seed=5)
    got = {r.vec_id: r.cluster for r in out1.collect()}
    # purity: every truth-group maps to exactly one predicted cluster
    mapping = {}
    for i, (_, _, truth) in enumerate(rows):
        mapping.setdefault(truth, set()).add(got[i])
    assert all(len(v) == 1 for v in mapping.values()), mapping
    assert len({next(iter(v)) for v in mapping.values()}) == 3

    out2, cents2 = kmeans(df, k=3, dim=8, seed=5)
    assert cents1 == cents2, "same seed must reproduce identical centroids"
    assert {r.vec_id: r.cluster for r in out2.collect()} == got


def test_kmeans_on_embeddings_table(spark, sf_dir):
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.similarity import kmeans

    emb = table(spark, sf_dir, "embeddings")
    out, cents = kmeans(emb, k=4, dim=64, max_iter=5)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.cluster for r in rows} <= set(range(4))
    assert len(cents) == 4 and len(cents[0]) == 64
    assert all(r.dist_e6 >= 0 for r in rows)


def test_kmeans_raises_when_k_exceeds_rows(spark):
    import pytest as _pytest

    from etl_workflow_spark.operators.similarity import kmeans

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], ["vec_id", "embedding"]
    )
    with _pytest.raises(ValueError):
        kmeans(df, k=5, dim=2)


def test_kmeans_tolerates_empty_cells(spark):
    """k larger than the number of distinct points: empty cells keep
    their previous centroid instead of crashing (documented Lloyd's
    degradation)."""
    from etl_workflow_spark.operators.similarity import kmeans

    # 6 points at only 2 distinct locations, k=4
    df = spark.createDataFrame(
        [(i, [0.0, 0.0] if i % 2 else [5.0, 5.0]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    out, cents = kmeans(df, k=4, dim=2, max_iter=4)
    rows = out.collect()
    assert len(rows) == 6
    assert len(cents) == 4
    # all points land in some cluster with zero distance to a centroid
    assert {r.dist_e6 for r in rows} == {0}


def test_keep_best_per_cluster_survives_highest_quality(spark):
    """The best-scored member of each near-dup cluster survives (tie →
    min id); unclustered docs pass through; lower_is_better inverts."""
    from etl_workflow_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [
            (1, "a", 0.2),
            (2, "a'", 0.9),   # cluster A winner (best score)
            (3, "a''", 0.9),  # ties with 2 -> loses on id
            (4, "b", 0.5),    # singleton cluster: survives
            (5, "c", 0.1),    # unclustered: survives
        ],
        "doc_id long, text string, quality double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],
        "doc_id long, cluster_id long",
    )
    kept = sorted(
        r.doc_id
        for r in keep_best_per_cluster(docs, clusters, "quality").collect()
    )
    assert kept == [2, 4, 5]

    kept_lo = sorted(
        r.doc_id
        for r in keep_best_per_cluster(
            docs, clusters, "quality", higher_is_better=False
        ).collect()
    )
    assert kept_lo == [1, 4, 5]


def test_dedup_corpus_end_to_end(spark):
    """The one-call recipe: byte-dupes collapse to min id, near-dups
    collapse per cluster (min id, or best quality when given),
    unrelated docs survive."""
    from etl_workflow_spark.operators.dedup import dedup_corpus

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    near = base.replace("tonight", "yesterday")
    rows = [
        (1, base, 0.1),
        (2, base, 0.9),        # byte-dup of 1 -> min id 1 survives stage 1
        (3, near, 0.8),        # near-dup of 1
        (4, "completely unrelated content about spark query planning "
            "and shuffle partitions in distributed execution", 0.5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, q double")

    kept = sorted(
        r.doc_id for r in dedup_corpus(docs, threshold=0.5).collect()
    )
    assert kept == [1, 4]

    kept_q = sorted(
        r.doc_id
        for r in dedup_corpus(docs, threshold=0.5, quality_col="q").collect()
    )
    # near-dup cluster {1, 3}: doc 3 has the better quality
    assert kept_q == [3, 4]


def test_keep_best_never_crowns_null_score(spark):
    """A NULL (or NULL-casting) score must not win its cluster — NULL
    fields sort first in the min-struct aggregate, so without the
    +inf coalesce an unscored member beats every scored one. An
    all-NULL cluster still keeps exactly one member (min id)."""
    from etl_workflow_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(1, None), (2, 0.1), (3, None), (4, None)],
        "doc_id long, quality double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)],
        "doc_id long, cluster_id long",
    )
    kept = sorted(
        r.doc_id
        for r in keep_best_per_cluster(docs, clusters, "quality").collect()
    )
    assert kept == [2, 3]  # scored 2 beats NULL 1; all-NULL -> min id 3
    kept_lo = sorted(
        r.doc_id
        for r in keep_best_per_cluster(
            docs, clusters, "quality", higher_is_better=False
        ).collect()
    )
    assert kept_lo == [2, 3]


def test_dedup_corpus_preserves_null_text_docs(spark):
    """NULL-text docs bypass every tier and ALL survive — the
    null-preservation contract of dedup_spans/dedup_paragraphs; the
    exact tier's sha2(NULL)=NULL must not collapse them into one."""
    from etl_workflow_spark.operators.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [(1, "some real document text here"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_corpus(docs).collect())
    assert kept == [1, 2, 3]


def _non_checkpoint_persists(spark):
    """Persisted RDDs that are NOT localCheckpoint blocks. Checkpoint
    blocks are acceptable residue: they are reclaimed when the result
    frame is GC'd and do not accrete across calls (ContextCleaner);
    an explicit .persist() with no unpersist path is the leak class."""
    out = []
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        rdd = it.next().getValue().rdd()
        if not rdd.isLocallyCheckpointed():
            out.append(rdd.id())
    return out


def test_dedup_corpus_releases_every_persist(spark):
    """Repeated dedup_corpus calls must not accrete cached blocks:
    minhash_lsh_pairs eagerly materializes its result and releases the
    candidate persist in a finally; dedup_clusters releases its
    internals. Only localCheckpoint residue may remain."""
    from etl_workflow_spark.operators.dedup import dedup_corpus

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"document number {i} with shared words " * 3)
         for i in range(20)],
        "doc_id long, text string",
    )
    dedup_corpus(docs, threshold=0.5).count()
    leaked = _non_checkpoint_persists(spark)
    assert leaked == [], f"cached RDDs leaked: {leaked}"


# --------------------------------------------------------------- semdedup


def _blob_corpus(spark):
    """Three well-separated blobs; inside blob 0 two planted near-dup
    groups (cosine ~1 pairs), everything else angularly distinct."""
    import random

    rnd = random.Random(3)
    centers = [[0.0] * 8, [40.0] * 8, [-40.0] * 8]
    centers[0][0] = 40.0  # keep blob 0 away from the origin
    rows = []
    for i in range(120):
        c = i % 3
        v = [centers[c][d] + rnd.gauss(0, 2.0) for d in range(8)]
        rows.append((i, v))
    # planted dups: same direction, different magnitude -> cosine ~1
    base = rows[0][1]
    rows.append((200, [x * 2.0 for x in base]))
    rows.append((201, [x * 3.0 for x in base]))
    base2 = rows[3][1]
    rows.append((210, [x * 1.5 for x in base2]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_blocked_group_col_restricts_pairs_to_group(spark):
    """Grouped blocked pairing == global exact pairs filtered to
    same-group membership (value-level, both ids and cosines)."""
    from pyspark.sql import functions as F

    df = _blob_corpus(spark).withColumn(
        "grp", (F.col("vec_id") % 2).cast("long")
    )
    grp_of = {r.vec_id: r.grp for r in df.select("vec_id", "grp").collect()}
    exact = _pairs(embedding_neardup_exact(df, threshold=0.9))
    want = {
        p: c for p, c in exact.items() if grp_of[p[0]] == grp_of[p[1]]
    }
    got = _pairs(
        embedding_neardup_blocked(
            df, threshold=0.9, group_col="grp", rows_per_block=16
        )
    )
    assert set(got) == set(want)
    for p, v in got.items():
        assert abs(v - want[p]) <= 10  # e4 units (BLAS accumulation order)
    assert any(grp_of[a] != grp_of[b] for a, b in exact), (
        "fixture must contain cross-group pairs for the filter to bite"
    )
    # NULL group = no membership: those rows pair with nothing
    df_null = df.withColumn(
        "grp", F.when(F.col("vec_id") >= 200, F.col("grp"))
    )
    got_null = _pairs(
        embedding_neardup_blocked(
            df_null, threshold=0.9, group_col="grp", rows_per_block=16
        )
    )
    assert all(a >= 200 and b >= 200 for a, b in got_null)
    with pytest.raises(ValueError, match="num_blocks"):
        embedding_neardup_blocked(
            df, threshold=0.9, group_col="grp", num_blocks=4
        )


def test_semdedup_drops_planted_dups_keeps_rest(spark):
    from etl_workflow_spark.operators.similarity import semdedup

    df = _blob_corpus(spark)
    surv = semdedup(df, threshold=0.9999, k=3, dim=8, keep="min_id")
    ids = {r.vec_id for r in surv.select("vec_id").collect()}
    # each planted dup group survives exactly its min id
    assert 0 in ids and not {200, 201} & ids
    assert 3 in ids and 210 not in ids
    # nothing else was dropped
    assert len(ids) == df.count() - 3
    # survivors keep the input schema untouched
    assert surv.columns == df.columns


def test_semdedup_farthest_keeps_most_atypical_member(spark):
    from etl_workflow_spark.operators.similarity import (
        kmeans,
        semdedup,
    )

    df = _blob_corpus(spark)
    surv = semdedup(df, threshold=0.9999, k=3, dim=8, keep="farthest")
    ids = {r.vec_id for r in surv.select("vec_id").collect()}
    assert len(ids) == df.count() - 3
    # the paper policy: among {0, 200, 201} the survivor is the member
    # farthest from its centroid (the x3 copy), same for {3, 210}
    # max_iter pinned to semdedup's internal call so both derive the
    # same centroids (and therefore the same distances)
    assign, _ = kmeans(df, k=3, dim=8, max_iter=10)
    dist = {r.vec_id: r.dist_e6 for r in assign.collect()}
    for group in ({0, 200, 201}, {3, 210}):
        keepers = group & ids
        # highest centroid distance wins, ties break on min id —
        # keep_best_per_cluster's exact ordering
        assert keepers == {min(group, key=lambda i: (-dist[i], i))}


def test_semdedup_rejects_unknown_keep_policy(spark):
    from etl_workflow_spark.operators.similarity import semdedup

    with pytest.raises(ValueError, match="keep"):
        semdedup(_blob_corpus(spark), keep="random")


def test_semdedup_probe_matches_full_pairing_restricted_to_batch(spark):
    """Numpy oracle: probe pairs == all same-cell pairs touching the
    batch (batch x corpus and batch x batch), under the corpus's own
    centroids — the incremental path loses nothing and re-pairs
    nothing corpus-side."""
    import numpy as np

    from etl_workflow_spark.operators.similarity import (
        kmeans,
        semdedup_probe,
    )

    corpus = _blob_corpus(spark)
    assign, cents = kmeans(corpus, k=3, dim=8, max_iter=10)
    corpus_c = corpus.join(assign.select("vec_id", "cluster"), "vec_id")
    crows = {r.vec_id: (list(r.embedding), r.cluster)
             for r in corpus_c.collect()}
    base0 = crows[0][0]
    fresh = [7.0, -3.0, 5.0, 1.0, -2.0, 4.0, 0.5, -1.0]
    brows = [
        (300, [x * 1.7 for x in base0]),    # near-dup of corpus 0's group
        (301, fresh),                        # batch-internal dup pair...
        (302, [x * 2.0 for x in fresh]),     # ...with 302
        (303, [-5.0, 9.0, -7.0, 2.0, 8.0, -6.0, 3.0, -4.0]),  # unique
    ]
    batch = spark.createDataFrame(brows, ["vec_id", "embedding"])
    got = {
        (r.vec_a, r.vec_b): r.cosine_e4
        for r in semdedup_probe(
            batch, corpus_c, cents, threshold=0.9999
        ).collect()
    }

    C = np.array(cents)
    bcell = {
        i: int(((np.array(v) - C) ** 2).sum(axis=1).argmin())
        for i, v in brows
    }
    allv = {i: (np.array(v), bcell[i]) for i, v in brows}
    allv.update({i: (np.array(v), c) for i, (v, c) in crows.items()})
    bids = set(bcell)
    want = {}
    for a in bids:
        va, ca = allv[a]
        for b, (vb, cb) in allv.items():
            if b == a or cb != ca or (b in bids and b <= a):
                continue
            e4 = int(np.floor(
                float(va @ vb)
                / (np.linalg.norm(va) * np.linalg.norm(vb)) * 10000
            ))
            if e4 >= 9999:
                want[(min(a, b), max(a, b))] = e4
    assert set(got) == set(want) and want
    assert (300, 302) not in got  # different directions never pair
    for p, v in got.items():
        assert abs(v - want[p]) <= 10
    # every pair touches the batch
    assert all(a in bids or b in bids for a, b in got)


def test_semdedup_probe_empty_batch(spark):
    from etl_workflow_spark.operators.similarity import (
        kmeans,
        semdedup_probe,
    )

    corpus = _blob_corpus(spark)
    assign, cents = kmeans(corpus, k=3, dim=8, max_iter=10)
    corpus_c = corpus.join(assign.select("vec_id", "cluster"), "vec_id")
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semdedup_probe(empty, corpus_c, cents)
    assert out.columns == ["vec_a", "vec_b", "cosine_e4"]
    assert out.count() == 0


def test_semantic_tier_releases_every_persist(spark, tmp_path):
    """semdedup, semdedup_probe, and the ingest batch must not accrete
    cached blocks across calls (the streaming tier runs the batch fn
    once per micro-batch forever). Only localCheckpoint residue may
    remain."""
    from etl_workflow_spark.operators.similarity import (
        kmeans,
        semdedup,
        semdedup_probe,
    )
    from etl_workflow_spark.streaming import incremental as inc

    spark.catalog.clearCache()
    corpus = _blob_corpus(spark)
    semdedup(corpus, threshold=0.9999, k=3, dim=8).count()
    assign, cents = kmeans(corpus, k=3, dim=8, max_iter=10)
    corpus_c = corpus.join(assign.select("vec_id", "cluster"), "vec_id")
    batch = spark.createDataFrame(
        [(900, [5.0] * 8)], "vec_id long, embedding array<double>"
    )
    semdedup_probe(batch, corpus_c, cents, threshold=0.9).count()
    path = str(tmp_path / "semcorpus")
    inc.semdedup_ingest_batch(batch, path, cents, threshold=0.9,
                              id_col="vec_id", vec_col="embedding")
    inc.semdedup_ingest_batch(batch, path, cents, threshold=0.9,
                              id_col="vec_id", vec_col="embedding")
    leaked = _non_checkpoint_persists(spark)
    assert leaked == [], f"cached RDDs leaked: {leaked}"


def test_semdedup_probe_pre_assigned_cells_match(spark):
    """cell_col: a pre-assigned batch (the ingest path) yields exactly
    the pairs of the assign-inside path."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.operators.similarity import (
        _as_double,
        _cell_assigner,
        kmeans,
        semdedup_probe,
    )

    corpus = _blob_corpus(spark)
    assign, cents = kmeans(corpus, k=3, dim=8, max_iter=10)
    corpus_c = corpus.join(assign.select("vec_id", "cluster"), "vec_id")
    batch = spark.createDataFrame(
        [(300, [x * 2.0 for x in corpus.first().embedding]),
         (301, [9.0, -2.0, 4.0, 1.0, 0.5, -3.0, 2.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    inline = _pairs(semdedup_probe(batch, corpus_c, cents, threshold=0.9))
    pre = batch.withColumn(
        "cluster",
        _cell_assigner(cents)(_as_double(F.col("embedding"))).getField(
            "cluster"
        ),
    )
    given = _pairs(
        semdedup_probe(pre, corpus_c, cents, threshold=0.9,
                       cell_col="cluster")
    )
    assert inline == given and inline


def test_semdedup_max_cell_size_noop_when_cells_small(spark):
    """Guard enabled but no cell over the bound: results identical to
    the unguarded run (the guard path is exercised, splits nothing)."""
    from etl_workflow_spark.operators.similarity import semdedup

    df = _blob_corpus(spark)
    base = {r.vec_id for r in semdedup(
        df, threshold=0.9999, k=3, dim=8, keep="min_id"
    ).collect()}
    guarded = {r.vec_id for r in semdedup(
        df, threshold=0.9999, k=3, dim=8, keep="min_id",
        max_cell_size=1000,
    ).collect()}
    assert guarded == base


def _mega_cell_corpus(spark):
    """One tight mega-cluster (~100 vectors around a single direction,
    noise large enough that distinct members stay below a 0.9999
    cosine) with three planted EXACT duplicate groups, plus a far-away
    minority blob — the near-duplicate-heavy shape where one k-means
    cell holds ~90% of the corpus."""
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(100):
        v = [30.0 + rnd.gauss(0, 3.0) for _ in range(8)]
        rows.append((i, v))
    for gid, src in ((300, 5), (310, 17), (320, 42)):
        rows.append((gid, list(rows[src][1])))      # exact copy
        rows.append((gid + 1, list(rows[src][1])))  # second exact copy
    for i in range(10):
        rows.append((500 + i, [-40.0 + rnd.gauss(0, 2.0) for _ in range(8)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semdedup_max_cell_size_splits_but_preserves_results(spark):
    """ADVICE r8 #4: the oversized-cell guard (recursive sub-k-means,
    the paper's own mitigation) bounds every cell while EXACT duplicate
    groups — identical vectors are always co-assigned — dedup exactly
    as the unsplit reference does."""
    from etl_workflow_spark.operators.similarity import (
        _bound_cell_sizes, kmeans, semdedup,
    )

    df = _mega_cell_corpus(spark)
    base = {r.vec_id for r in semdedup(
        df, threshold=0.9999, k=2, dim=8, keep="min_id"
    ).collect()}
    guarded = {r.vec_id for r in semdedup(
        df, threshold=0.9999, k=2, dim=8, keep="min_id",
        max_cell_size=20,
    ).collect()}
    assert guarded == base
    # each exact-dup group survives exactly its min id
    for g in (300, 310, 320):
        assert g + 1 not in guarded
    # and the guard really bounds the cells: re-derive the split
    # labels and check no cell exceeds the cap (all vectors distinct
    # here, so splitting always succeeds)
    assign, _ = kmeans(df, k=2, dim=8, max_iter=10)
    with_cell = df.join(assign.select("vec_id", "cluster"), "vec_id")
    bounded, pinned = _bound_cell_sizes(
        with_cell, 20, 8, 7, "vec_id", "embedding"
    )
    sizes = [r["n"] for r in bounded.groupBy("cluster").count()
             .withColumnRenamed("count", "n").collect()]
    assert max(sizes) <= 20
    for p in pinned:
        p.unpersist()


def test_bound_cell_sizes_accepts_unsplittable_identical_cell(spark):
    """A cell of identical vectors is equidistant to every centroid
    and cannot split — the guard stops at max_depth and accepts it
    (documented residual; exact dedup is the right tier for that
    shape) instead of looping or raising."""
    from etl_workflow_spark.operators.similarity import _bound_cell_sizes

    rows = [(i, [1.0] * 8, 0) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "cluster"])
    out, pinned = _bound_cell_sizes(df, 5, 8, 7, "vec_id", "embedding")
    assert out.count() == 30  # no rows lost, no exception
    for p in pinned:
        p.unpersist()


def test_bound_cell_sizes_releases_pinned_storage(spark, monkeypatch):
    """ADVICE r9: the oversized-cell guard must not accrete pinned
    executor storage across calls in a long-lived session. Every
    DataFrame persist() issued during a guarded semdedup — the split
    levels carrying the vector column included — must be unpersisted
    by the time the call's result is computed. (kmeans'
    localCheckpoint of its narrow assignment frame is a separate,
    pre-existing block class, not covered by persist().)"""
    from etl_workflow_spark.operators.similarity import semdedup

    df = _mega_cell_corpus(spark)
    # patch the CONCRETE class (Spark 4: pyspark.sql.DataFrame is an
    # abstract facade; instances are pyspark.sql.classic.DataFrame)
    cls = type(df)
    recorded: list = []
    orig = cls.persist

    def rec(self, *a, **k):
        out = orig(self, *a, **k)
        recorded.append(out)
        return out

    monkeypatch.setattr(cls, "persist", rec)
    semdedup(
        df, threshold=0.9999, k=2, dim=8, keep="min_id",
        max_cell_size=20,
    ).count()
    assert recorded, "the guard should have persisted split levels"
    still = [d for d in recorded if d.storageLevel.useMemory
             or d.storageLevel.useDisk]
    assert not still, f"{len(still)} persisted frames never released"


def test_pq_fit_rejects_ksub_beyond_int16(spark):
    """ADVICE r9: codes are int16 — a ksub above 32767 would wrap
    argmin indices negative and corrupt the index silently, so pq_fit
    and the shared model check refuse it loudly."""
    from etl_workflow_spark.operators.similarity import (
        _check_pq_model, pq_fit,
    )

    with pytest.raises(ValueError, match="int16"):
        _check_pq_model({
            "format": "spark-graft-ivfpq/v1",
            "dim": 64, "m_sub": 8, "dsub": 8, "ksub": 40000,
        })
    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(8)],
        ["vec_id", "embedding"],
    )
    with pytest.raises(ValueError, match="ksub=65536"):
        pq_fit(df, n_cells=2, m_sub=2, ksub=65536)
