"""Empirical scaling curves for the scale-tier operators.

Replicates the sf0.1 corpus K× (id-offset per replica so keys stay
distinct) and times each scale-tier operator at K = 1, 4, 16. A
scale-safe operator's wall time should grow ~linearly in K (the LSH
band join grows with candidate count, which replication inflates
quadratically per-document — noted per row). The exact all-pairs tiers
are deliberately absent: they are documented bounded-input audit paths.

Usage: python tools/scalecheck.py [sf_dir] [K ...]
Prints one JSON line per (operator, K) with rows + seconds.

ANN recall-vs-cost mode: python tools/scalecheck.py --ann-recall
[sf_dir] [K ...] measures recall@10 against the exact brute-force
answer and wall-time for the IVF tier (n_probe sweep at fixed cells —
the probe fraction IS the cost knob) and the sign-LSH tier (planes ×
bands sweep) at each corpus replication K. One JSON line per config;
the measured table lives in SCALE.md §15.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402


def replicate(df: DataFrame, k: int, id_cols: list[str], offset: int) -> DataFrame:
    """K copies with id columns offset per replica (distinct keys)."""
    out = None
    for i in range(k):
        rep = df
        for c in id_cols:
            rep = rep.withColumn(c, (F.col(c) + F.lit(i * offset)).cast("long"))
        out = rep if out is None else out.unionByName(rep)
    return out


def ann_recall(sf_dir: str, ks: list[int]) -> None:
    """Recall@10 vs wall-cost for the approximate ANN tiers against the
    exact brute-force answer, at each corpus replication K. Queries are
    a fixed 32-vector batch (daily-lookup shape), so cost differences
    are pure corpus-side work: IVF scans ~n_probe/n_cells of the
    corpus; sign-LSH scores only bucket collisions."""
    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import similarity as S

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb0 = table(spark, sf_dir, "embeddings")
    e_off = (emb0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    queries = (
        emb0.where("vec_id < 32")
        .withColumnRenamed("vec_id", "query_id")
        .localCheckpoint(eager=True)
    )
    topk = 10

    def timed_sets(fn):
        t0 = time.time()
        rows = fn().collect()
        sec = round(time.time() - t0, 2)
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return got, sec

    # warm codegen/JIT so K=1 brute force isn't charged session startup
    S.brute_force_topk(emb0, queries, k=topk).count()

    for k in ks:
        # persist()+count, NOT localCheckpoint: unpersist() on a
        # checkpointed frame is a no-op, so replica blocks would
        # accrete across the K loop
        emb = replicate(emb0, k, ["vec_id"], e_off).persist()
        emb.count()
        truth, bf_sec = timed_sets(
            lambda: S.brute_force_topk(emb, queries, k=topk)
        )
        n_true = sum(len(v) for v in truth.values())
        print(json.dumps({
            "op": "ann_recall", "tier": "brute_force", "k_rep": k,
            "recall": 1.0, "sec": bf_sec, "cost_vs_bf": 1.0,
        }), flush=True)

        def report(tier, param, fn, truth=truth, n_true=n_true,
                   bf_sec=bf_sec, **extra):
            got, sec = timed_sets(fn)
            hit = sum(
                len(got.get(q, set()) & t) for q, t in truth.items()
            )
            print(json.dumps({
                "op": "ann_recall", "tier": tier, "k_rep": k,
                "param": param, "recall": round(hit / n_true, 3),
                "sec": sec,
                "cost_vs_bf": round(sec / bf_sec, 2) if bf_sec else None,
                **extra,
            }), flush=True)

        n_cells = 16
        for n_probe in (1, 2, 4, 8):
            report(
                "ivf", f"probe {n_probe}/{n_cells}",
                lambda: S.ivf_topk(
                    emb, queries, k=topk, n_cells=n_cells, n_probe=n_probe
                ),
            )
        for planes, bands in ((16, 8), (32, 8), (64, 16)):
            report(
                "sign_lsh", f"planes {planes} bands {bands}",
                lambda: S.lsh_topk(
                    emb, queries, k=topk, num_planes=planes, bands=bands
                ),
            )
        # int8 tier: quantize ONCE (the deployment shape — the cost of
        # quantization amortizes over every probe), then scan int8
        emb_q = S.quantize_embeddings(emb).persist()
        emb_q.count()
        for rf in (1, 4):
            report(
                "int8", f"rerank x{rf}",
                lambda: S.quantized_topk(
                    emb_q, queries, k=topk, rerank_factor=rf
                ),
            )
        emb_q.unpersist()

        # Inverted multi-index (r10, Babenko & Lempitsky 2012): product
        # cells from two half-space quantizers — the candidate-
        # generation tier for the ISOTROPIC regime where flat-IVF cell
        # membership caps recall (finer cells at the same training
        # cost; probed in ascending summed half-distance order).
        # rows_frac computed EXACTLY from the probed pairs' sizes.
        import numpy as np

        imodel = S.imi_fit(emb, n_cells=32)
        iidx = S.imi_index(emb, imodel).persist()
        n_rows = iidx.count()
        pair_sizes = {
            (r["cell_a"], r["cell_b"]): r["count"]
            for r in iidx.groupBy("cell_a", "cell_b").count().collect()
        }
        CA = np.asarray(imodel["centroids_a"])
        CB = np.asarray(imodel["centroids_b"])
        hf = imodel["half"]
        Qv = np.array(
            [r["embedding"] for r in
             emb.where("vec_id < 32").orderBy("vec_id").collect()]
        )
        Qn = Qv / np.maximum(
            np.linalg.norm(Qv, axis=1, keepdims=True), 1e-12
        )
        da = ((Qn[:, :hf] ** 2).sum(1)[:, None] + (CA ** 2).sum(1)[None]
              - 2 * Qn[:, :hf] @ CA.T)
        db = ((Qn[:, hf:] ** 2).sum(1)[:, None] + (CB ** 2).sum(1)[None]
              - 2 * Qn[:, hf:] @ CB.T)
        kc = int(imodel["n_cells"])  # the pair-code stride imi_topk keys on
        for T in (32, 64, 128):
            fracs = []
            for qa, qb in zip(da, db):
                grid = (qa[:, None] + qb[None, :]).ravel()
                top = np.argpartition(grid, min(T, grid.size) - 1)[:T]
                fracs.append(sum(
                    pair_sizes.get((int(p) // kc, int(p) % kc), 0)
                    for p in top
                ) / max(n_rows, 1))
            report(
                "imi", f"cells=32x32 pairs={T}",
                lambda: S.imi_topk(iidx, queries, imodel, emb,
                                   k=topk, n_probe_pairs=T),
                rows_frac=round(float(np.mean(fracs)), 3),
            )
        iidx.unpersist()

        # PQ flat ADC: index once (deployment shape), scan every code
        # row — the fraction that matters is BYTES (codes are ~8% of
        # the float column), the only tier that holds recall on this
        # isotropic corpus at <10% of corpus bytes
        model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=256)
        bytes_frac = (2 * 8 + 4) / (4 * 64)
        idx = S.pq_index(emb, model).persist()
        idx.count()
        report(
            "pq_flat", "M=8 ksub=256 rerank x8",
            lambda: S.pq_topk(idx, queries, model, emb,
                              k=topk, rerank_factor=8),
            bytes_frac=round(bytes_frac, 3), rows_frac=1.0,
        )
        idx.unpersist()

        # PQ IVF mode on a CLUSTERED derivative of the same corpus
        # (label-shifted; real embedding corpora are clustered — the
        # isotropic testdata is the worst case where cell membership
        # caps recall, so the cell-pruned story is measured where it
        # applies). rows_frac is computed exactly from cell sizes.
        import numpy as np

        D = np.random.RandomState(3).randn(10, 64)
        D /= np.linalg.norm(D, axis=1, keepdims=True)
        D_b = [[float(x) for x in d] for d in D]

        def shift(batches):
            import numpy as _np
            DD = _np.asarray(D_b)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = _np.array(pdf["embedding"].tolist(), dtype=_np.float64)
                Vn = V / _np.maximum(
                    _np.linalg.norm(V, axis=1, keepdims=True), 1e-12
                )
                Vc = Vn + DD[pdf["label"].to_numpy() % 10]
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"],
                    "embedding": [r.tolist() for r in Vc],
                })

        cemb = emb.mapInPandas(
            shift, "vec_id long, embedding array<double>"
        ).persist()
        n_c = cemb.count()
        # persist()+unpersist(), NOT localCheckpoint: checkpoint blocks
        # can't be released and would accrete across the K loop (same
        # rationale as emb above)
        cq = (
            cemb.where("vec_id < 32")
            .withColumnRenamed("vec_id", "query_id")
            .persist()
        )
        cq.count()
        ctruth, cbf_sec = timed_sets(
            lambda: S.brute_force_topk(cemb, cq, k=topk)
        )
        cn_true = sum(len(v) for v in ctruth.values())
        cmodel = S.pq_fit(cemb, n_cells=64, m_sub=8, ksub=256)
        cidx = S.pq_index(cemb, cmodel).persist()
        sizes = {
            r["cell"]: r["count"]
            for r in cidx.groupBy("cell").count().collect()
        }
        CO = np.asarray(cmodel["coarse"])
        Q = np.array(
            [r["embedding"] for r in cq.orderBy("query_id").collect()]
        )
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        qd = ((Qn**2).sum(1)[:, None] + (CO**2).sum(1)[None, :]
              - 2 * Qn @ CO.T)
        for n_probe in (4, 5, 6):
            probed = np.argsort(qd, axis=1)[:, :n_probe]
            frac = float(np.mean([
                sum(sizes.get(int(c), 0) for c in row) / max(n_c, 1)
                for row in probed
            ]))
            report(
                "pq_ivf_clustered", f"cells=64 probe={n_probe} rerank x8",
                lambda: S.pq_topk(cidx, cq, cmodel, cemb, k=topk,
                                  n_probe=n_probe, rerank_factor=8),
                truth=ctruth, n_true=cn_true, bf_sec=cbf_sec,
                rows_frac=round(frac, 3),
            )
        cidx.unpersist()
        cq.unpersist()
        cemb.unpersist()

        # OPQ (r10): PQ vs OPQ raw-ADC recall on an ANISOTROPIC
        # derivative (fixed decaying-spectrum mixer — the correlated,
        # unbalanced-variance shape real encoders emit, where
        # contiguous dim-slices waste codebook bits). rerank x1 keeps
        # the exact re-rank from masking quantization error; the x8
        # rows show the deployed config. On the untouched ISOTROPIC
        # corpus a rotation is a no-op by symmetry (rotation-invariant
        # distribution), so the flat-ADC rows above are its ceiling.
        MIX = np.random.RandomState(5)
        U_m, _ = np.linalg.qr(MIX.randn(64, 64))
        V_m, _ = np.linalg.qr(MIX.randn(64, 64))
        A_b = [
            [float(x) for x in r]
            for r in U_m @ np.diag(np.exp(-np.arange(64) / 8.0)) @ V_m
        ]

        def mix(batches):
            import numpy as _np
            AA = _np.asarray(A_b)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = _np.array(pdf["embedding"].tolist(), dtype=_np.float64)
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"],
                    "embedding": [r.tolist() for r in V @ AA],
                })

        aemb = emb.mapInPandas(
            mix, "vec_id long, embedding array<double>"
        ).persist()
        aemb.count()
        aq = (
            aemb.where("vec_id < 32")
            .withColumnRenamed("vec_id", "query_id")
            .persist()
        )
        aq.count()
        atruth, abf_sec = timed_sets(
            lambda: S.brute_force_topk(aemb, aq, k=topk)
        )
        an_true = sum(len(v) for v in atruth.values())
        for label, iters in (("plain", 0), ("opq", 8)):
            amodel = S.pq_fit(
                aemb, n_cells=16, m_sub=8, ksub=256, opq_iters=iters
            )
            aidx = S.pq_index(aemb, amodel).persist()
            aidx.count()
            for rf in (1, 8):
                report(
                    f"pq_flat_aniso_{label}",
                    f"M=8 ksub=256 rerank x{rf}",
                    lambda: S.pq_topk(aidx, aq, amodel, aemb,
                                      k=topk, rerank_factor=rf),
                    truth=atruth, n_true=an_true, bf_sec=abf_sec,
                    bytes_frac=round(bytes_frac, 3), rows_frac=1.0,
                )
            aidx.unpersist()
        aq.unpersist()
        aemb.unpersist()
        emb.unpersist()
    spark.stop()


def txn_sink_cost(sf_dir: str, batches: int = 20) -> None:
    """Per-batch cost curve of the streaming txn sink's conflict check.

    Appends ``batches`` disjoint-key micro-batches (the monotone-id
    shape of a real event stream) into one transactional table, timing
    each commit, twice: with key-stats pruning active (default) and
    with it disabled (every entry's keys re-read — the r7 behavior).
    Flat per-batch seconds under ``pruned=true`` vs linear growth under
    ``pruned=false`` is the acceptance row for the manifest key-stats
    work. One JSON line per (mode, batch)."""
    import shutil
    import tempfile

    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.sources import txn

    from pyspark.sql import Window

    spark = get_spark("txn-sink-cost")
    spark.sparkContext.setLogLevel("ERROR")
    # re-key to DENSE ids [1, n]: batch b offsets by b*n, so density is
    # what makes consecutive batches genuinely disjoint and monotone
    # (raw testdata doc_ids may be sparse, which would overlap ranges
    # and dedup rows away mid-curve)
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(2000)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("doc_id")).cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    real_intersect = txn._may_intersect
    try:
        for pruned in (True, False):
            txn._may_intersect = (
                real_intersect if pruned else (lambda *a, **kw: True)
            )
            root = tempfile.mkdtemp(prefix="txn-sink-")
            path = f"{root}/t"
            txn.txn_create(
                spark, path,
                docs.withColumn("doc_id", F.col("doc_id") - F.lit(n_docs)),
                stats_cols=["doc_id"],
            )
            for b in range(batches):
                batch = docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(b * n_docs)
                )
                t0 = time.time()
                n = txn.txn_append(spark, path, batch, keys=["doc_id"])
                print(json.dumps({
                    "op": "txn_sink_batch", "pruned": pruned, "batch": b,
                    "rows": n, "sec": round(time.time() - t0, 2),
                }), flush=True)
            shutil.rmtree(root, ignore_errors=True)
    finally:
        txn._may_intersect = real_intersect
    spark.stop()


def span_skew(sf_dir: str, repeats: list[int]) -> None:
    """Hot-span straggler check for dedup_spans: one 60-token span is
    appended to the corpus ``r`` times (each in its own synthetic doc).
    The whash aggregation is combiner-friendly and the duplicate probe
    is a broadcast join, so wall time should stay FLAT as r scales
    100× — the old window-partitionBy(whash) form put all r
    occurrences in one sort task. One JSON line per r."""
    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import dedup as D

    spark = get_spark("span-skew")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = table(spark, sf_dir, "documents").select("doc_id", "text")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    hot = " ".join(f"hotspan{i}" for i in range(60))
    D.dedup_spans(docs0, min_tokens=50).count()  # JVM warm-up
    for r in repeats:
        hot_docs = spark.range(r).select(
            (F.col("id") + F.lit(d_off)).alias("doc_id"),
            F.lit(hot).alias("text"),
        )
        corpus = docs0.unionByName(hot_docs).localCheckpoint(eager=True)
        t0 = time.time()
        out = D.dedup_spans(corpus, min_tokens=50)
        removed = out.agg(F.sum("n_tokens_removed")).collect()[0][0]
        print(json.dumps({
            "op": "dedup_spans_hot", "repeat": r,
            "tokens_removed": int(removed or 0),
            "sec": round(time.time() - t0, 2),
        }), flush=True)
        corpus.unpersist()
    spark.stop()


def pq_store_cost(sf_dir: str, batches: int = 40) -> None:
    """PQ index store: read cost before/after compaction as fragments
    accumulate (one partition per micro-batch). The claim: compaction
    collapses closed batches to one fragment and read_pq_index's
    listing + model-guard + latest-only window stop paying per-batch
    file overhead. One JSON line per phase."""
    import shutil
    import tempfile

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import similarity as S
    from etl_workflow_spark.streaming import incremental as inc
    from etl_workflow_spark.session import get_spark

    spark = get_spark("pq-store")
    spark.sparkContext.setLogLevel("ERROR")
    emb = table(spark, sf_dir, "embeddings")
    model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=64)
    store = tempfile.mkdtemp(prefix="pqstore-") + "/idx"
    for b in range(batches):
        inc.pq_index_batch(
            emb.where(F.col("vec_id") % batches == b), store, b, model
        )
    inc.read_pq_index(spark, store, model).count()  # warm
    for phase in ("fragmented", "compacted"):
        if phase == "compacted":
            t0 = time.time()
            inc.compact_pq_index(spark, store, before_batch_id=batches)
            compact_sec = round(time.time() - t0, 2)
        t0 = time.time()
        n = inc.read_pq_index(spark, store, model).count()
        sec = round(time.time() - t0, 2)
        rec = {
            "op": "pq_store_read", "phase": phase, "batches": batches,
            "rows": n, "sec": sec,
        }
        if phase == "compacted":
            rec["compact_sec"] = compact_sec
        print(json.dumps(rec), flush=True)
    shutil.rmtree(store.rsplit("/", 1)[0], ignore_errors=True)
    spark.stop()


def semdedup_skew(sf_dir: str, ks: list[int]) -> None:
    """Oversized-cell guard check for semdedup (r9): a corpus where
    ~half the vectors collapse into ONE tight k-means cell (shifted
    onto a common direction), so the unguarded Σcell² pairing is
    dominated by that cell's quadratic term, while
    ``max_cell_size`` recursively splits it and bounds the worst
    term. One JSON line per (K, mode); the claim is that guarded wall
    time grows ~linearly with K while unguarded grows with the
    mega-cell's square."""
    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import similarity as S

    spark = get_spark("semdedup-skew")
    spark.sparkContext.setLogLevel("ERROR")
    emb0 = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e_off = (emb0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1

    def skew(batches):
        import numpy as _np
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array(pdf["embedding"].tolist(), dtype=_np.float64)
            ids = pdf["vec_id"].to_numpy()
            # even ids: tight cluster around 8·1⃗ (members stay
            # distinct — the guard's sub-k-means must split them)
            mask = (ids % 2) == 0
            V[mask] = 8.0 + V[mask]
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [r.tolist() for r in V],
            })

    skewed = emb0.mapInPandas(skew, "vec_id long, embedding array<double>")
    S.semdedup(skewed, threshold=0.999, k=8, dim=64, keep="min_id").count()
    for k_rep in ks:
        emb = replicate(skewed, k_rep, ["vec_id"], e_off).persist()
        n = emb.count()
        for mode, mcs in (("unguarded", None), ("guarded", 512)):
            t0 = time.time()
            surv = S.semdedup(
                emb, threshold=0.999, k=16, dim=64, keep="min_id",
                max_cell_size=mcs,
            ).count()
            print(json.dumps({
                "op": "semdedup_skew", "k_rep": k_rep, "mode": mode,
                "n": n, "survivors": surv,
                "sec": round(time.time() - t0, 2),
            }), flush=True)
        emb.unpersist()
    spark.stop()


def corpus_cost(sf_dir: str, ks: list[int]) -> None:
    """materialize_training_set wall time at K× corpus replication,
    audit off vs on. Claims under measurement: (a) the default recipe
    scales ~linearly in corpus size (its stages do, and it evaluates
    the pipeline ONCE — at the write); (b) `audit=True`'s per-stage
    counts cost real extra evaluations (quantified here, so SCALE.md's
    'leave off at scale' advice is a number, not an opinion)."""
    import tempfile

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import corpus as C
    from etl_workflow_spark.session import get_spark

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = table(spark, sf_dir, "documents")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    # warm the JVM on the dominant internal plan
    from etl_workflow_spark.operators import dedup as D

    D.minhash_lsh_pairs(docs0, threshold=0.5).count()
    for k in ks:
        # replicas must be GENUINELY DISTINCT documents — an id offset
        # alone leaves k exact text copies, which the recipe's exact
        # tier collapses right back (output constant in k, measuring
        # nothing). Suffixing every >=4-char word shifts nearly every
        # shingle (replicas survive both dedup tiers) while keeping the
        # short stopwords intact, so the quality verdict is unchanged
        # (verified: identical pass count at sf0.1).
        reps = []
        for i in range(k):
            reps.append(
                docs0.withColumn(
                    "doc_id", (F.col("doc_id") + F.lit(i * d_off)).cast("long")
                ).withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S{4,})", rf"$1~{i}"),
                )
            )
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionByName(r)
        # persist()+count, NOT localCheckpoint: unpersist() only
        # releases CacheManager-registered plans, so checkpoint blocks
        # would accrete across K iterations for the life of the run
        docs = docs.persist()
        docs.count()
        for audit in (False, True):
            best = None
            for _ in range(2):  # min of 2: first run absorbs warm-up
                base = tempfile.mkdtemp(prefix=f"corpus-k{k}-")
                t0 = time.time()
                m = C.materialize_training_set(
                    spark, docs, base + "/t", num_shards=8, audit=audit
                )
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
                shutil.rmtree(base, ignore_errors=True)
            print(
                json.dumps(
                    {
                        "op": "materialize_training_set",
                        "k": k,
                        "audit": audit,
                        "rows": m["rows"],
                        "tokens": m["tokens"],
                        "sec": round(best, 2),
                    }
                ),
                flush=True,
            )
        docs.unpersist()
    spark.stop()


def extend_cost(sf_dir: str, ks: list[int]) -> None:
    """extend_training_set vs full re-materialization as the existing
    corpus grows K×, fixed ~200-doc daily batch. Claims measured:
    (a) extension cost is dominated by the BATCH plus one narrow scan
    of the corpus (hash anti-join + index probe), so it grows far
    slower than the re-materialize path, which re-runs the whole
    recipe over corpus+batch; (b) a prebuilt LSH index removes the
    per-call corpus re-shingling (quantified as with/without rows)."""
    import tempfile

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import corpus as C
    from etl_workflow_spark.operators import dedup as D
    from etl_workflow_spark.session import get_spark

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = table(spark, sf_dir, "documents")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    D.minhash_lsh_pairs(docs0, threshold=0.5).count()  # warm JVM
    # fixed daily batch: 200 genuinely-new docs (fresh ids, every
    # >=4-char word suffixed so neither dedup tier drops them)
    batch = (
        docs0.orderBy("doc_id").limit(200)
        .withColumn("doc_id", (F.col("doc_id") + F.lit(100 * d_off))
                    .cast("long"))
        .withColumn("text",
                    F.regexp_replace(F.col("text"), r"(\S{4,})", r"$1~nw"))
        .persist()
    )
    batch.count()
    for k in ks:
        reps = []
        for i in range(k):
            reps.append(
                docs0.withColumn(
                    "doc_id", (F.col("doc_id") + F.lit(i * d_off)).cast("long")
                ).withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S{4,})", rf"$1~{i}"),
                )
            )
        docs = reps[0]
        for r in reps[1:]:
            docs = docs.unionByName(r)
        docs = docs.persist()
        docs.count()
        base = tempfile.mkdtemp(prefix=f"extend-k{k}-")
        m0 = C.materialize_training_set(
            spark, docs, base + "/t", num_shards=8
        )
        base_rows = m0["rows"]
        existing, _ = C.read_training_set(spark, base + "/t")
        idx = D.build_lsh_index(existing).persist()
        idx.count()
        # rematerialize first: any residual warm-up bias lands on the
        # comparison path, not the mode under measurement
        for mode in ("rematerialize", "no_index", "prebuilt_index"):
            best = best_m = None
            for _ in range(2):  # min of 2: first run absorbs warm-up
                # setup (tempdir, corpus copy) OUTSIDE the timed
                # window — copytree is O(corpus) disk IO, which would
                # otherwise fake linear growth onto the flat claim
                out2 = tempfile.mkdtemp(prefix=f"extend-{mode}-k{k}-")
                if mode != "rematerialize":
                    shutil.copytree(base + "/t", out2 + "/t")
                t0 = time.time()
                if mode == "rematerialize":
                    m = C.materialize_training_set(
                        spark, docs.unionByName(batch), out2 + "/t",
                        num_shards=8,
                    )
                else:
                    m = C.extend_training_set(
                        spark, batch, out2 + "/t",
                        index=idx if mode == "prebuilt_index" else None,
                    )
                sec = time.time() - t0
                if best is None or sec < best:
                    best, best_m = sec, m
                shutil.rmtree(out2, ignore_errors=True)
            print(json.dumps({
                "op": "extend_training_set", "k": k, "mode": mode,
                # comparable across modes: total set size + this
                # call's net-new rows (parity between the two paths
                # is the convergence cross-check)
                "rows_total": best_m["rows"],
                "rows_new": best_m["rows"] - base_rows,
                "sec": round(best, 2),
            }), flush=True)
        idx.unpersist()

        # mixture recipe (r9): pool-backed extension. The claim under
        # measurement is different from the plain path's flat curve —
        # extension pays batch-sized recipe work PLUS an O(pool)
        # hash-filter + shuffle rewrite of the kept set, but never the
        # corpus-sized pairing dedup a re-materialization re-runs; a
        # prebuilt POOL index additionally removes the per-call pool
        # re-shingling.
        mbase = tempfile.mkdtemp(prefix=f"extend-mix-k{k}-")
        mix = {"src3": 0.5, "src7": 0.5}
        mm0 = C.materialize_training_set(
            spark, docs, mbase + "/t", num_shards=8,
            mixture=mix, strata_col="source",
        )
        mix_rows = mm0["rows"]
        pool_idx = D.build_lsh_index(
            spark.read.parquet(mbase + "/t/premix")
        ).persist()
        pool_idx.count()
        mbatch = batch.where(F.col("source").isin(list(mix)))
        for mode in ("mix_rematerialize", "mix_pool_index",
                     "mix_no_index"):
            best = best_m = None
            for _ in range(2):
                out2 = tempfile.mkdtemp(prefix=f"extend-{mode}-k{k}-")
                if mode != "mix_rematerialize":
                    shutil.copytree(mbase + "/t", out2 + "/t")
                t0 = time.time()
                if mode == "mix_rematerialize":
                    m = C.materialize_training_set(
                        spark, docs.unionByName(mbatch), out2 + "/t",
                        num_shards=8, mixture=mix, strata_col="source",
                    )
                else:
                    m = C.extend_training_set(
                        spark, mbatch, out2 + "/t",
                        index=pool_idx if mode == "mix_pool_index"
                        else None,
                    )
                sec = time.time() - t0
                if best is None or sec < best:
                    best, best_m = sec, m
                shutil.rmtree(out2, ignore_errors=True)
            print(json.dumps({
                "op": "extend_training_set", "k": k, "mode": mode,
                "rows_total": best_m["rows"],
                "rows_new": best_m["rows"] - mix_rows,
                "sec": round(best, 2),
            }), flush=True)
        pool_idx.unpersist()
        docs.unpersist()
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(mbase, ignore_errors=True)
    batch.unpersist()
    spark.stop()


def _run_forced(name: str, k: int, fn) -> None:
    """Timing harness row shared by the default loop and the focused
    modes: force EVERY output column (count() alone lets Catalyst
    prune the projection, timing nothing for narrow per-row
    operators), print one JSON line."""
    t0 = time.time()
    df = fn()
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).alias("h"),
    ).collect()[0]
    print(json.dumps({"op": name, "k": k, "rows": row["n"],
                      "sec": round(time.time() - t0, 2)}), flush=True)


def retrieval_cost(sf_dir: str, ks: list[int]) -> None:
    """Retrieval-tier scaling (r11): a FIXED query batch over a K×
    corpus. Separates the three costs the SCALE.md §17 argument makes:
    index build (linear in corpus tokens), prebuilt-postings query
    (candidate rows grow with K since every replica matches — the
    constant is what pruning attacks), and max_df stopword pruning
    (drops the hot term's corpus-sized posting list from the probe).
    Also rows for phrase search and the hashed-vector embed pass."""
    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import text as T

    spark = get_spark("retrieval-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = table(spark, sf_dir, "documents")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    QS = ["the hash join", "slow query filter", "window sort stream"]
    PH = ["order fast", "data slow", "window join stream"]

    run = _run_forced

    T.bm25_topk(docs0, QS, k=10).count()  # warm codegen/JIT
    for k in ks:
        docs = replicate(docs0, k, ["doc_id"], d_off).localCheckpoint(
            eager=True
        )
        run("bm25_inline", k, lambda: T.bm25_topk(docs, QS, k=10))
        t0 = time.time()
        post = T.build_text_index(docs).localCheckpoint(eager=True)
        n_post = post.count()
        print(json.dumps({"op": "postings_build", "k": k,
                          "rows": n_post,
                          "sec": round(time.time() - t0, 2)}), flush=True)
        run("bm25_prebuilt", k,
            lambda: T.bm25_topk(None, QS, k=10, postings=post))
        run("bm25_prebuilt_pruned", k, lambda: T.bm25_topk(
            None, QS, k=10, postings=post, max_df_ratio=0.2))
        post.unpersist()
        run("phrase_inline", k, lambda: T.phrase_topk(docs, PH, k=10))
        run("hashed_tfidf", k,
            lambda: T.hashed_tfidf_vectors(docs, dim=128))
        run("wordpiece_tokenize", k, lambda: T.wordpiece_encode(
            docs.select("doc_id", "text"),
            T.train_wordpiece(docs, vocab_size=300), ids=True))
        docs.unpersist()
    spark.stop()


def index_probe_bytes(sf_dir: str, ks: list[int]) -> None:
    """Text-index store prunability (r13): the quantitative version of
    the pytest layout claim (tests/test_streaming.py, term-clustered
    fragments). Writes the term-clustered postings store over a K×
    corpus, then — from parquet FOOTERS alone, the same min/max stats
    the scan planner prunes on — measures how many bytes a
    single-term probe must touch for (a) the rarest and (b) the
    hottest term, against the store total. The rare-term fraction is
    the claim that must stay small as K grows: a term-random layout
    would probe ~100% regardless of term frequency. AQE partition
    coalescing is disabled exactly like the pytest, so test-scale
    fragments reproduce the many-disjoint-files layout production
    sizes force anyway."""
    import glob
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.streaming import incremental as inc

    spark = get_spark("index-bytes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    docs0 = table(spark, sf_dir, "documents")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    for k in ks:
        docs = replicate(docs0, k, ["doc_id"], d_off)
        store = tempfile.mkdtemp(prefix="idxbytes_")
        try:
            t0 = time.time()
            inc.text_index_batch(docs, store, 0)
            build_sec = round(time.time() - t0, 2)
            post = spark.read.parquet(store)
            idc = "id" if "id" in post.columns else "doc_id"
            df_by_term = post.groupBy("term").agg(
                F.countDistinct(idc).alias("df")
            )
            hot = df_by_term.orderBy(
                F.col("df").desc(), F.col("term").asc()
            ).first()
            rare = df_by_term.orderBy(
                F.col("df").asc(), F.col("term").asc()
            ).first()
            rgs = []
            for f in sorted(glob.glob(f"{store}/batch_id=*/*.parquet")):
                md = pq.ParquetFile(f).metadata
                ti = md.schema.names.index("term")
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    st = rg.column(ti).statistics
                    rgs.append((f, rg.total_byte_size, st.min, st.max))
            total = sum(b for _, b, _, _ in rgs)
            for kind, row in (("rare", rare), ("hot", hot)):
                term = row["term"]
                hit = [(f, b) for f, b, lo, hi in rgs if lo <= term <= hi]
                probed = sum(b for _, b in hit)
                print(json.dumps({
                    "op": "index_probe_bytes", "k": k,
                    "term_kind": kind, "df": int(row["df"]),
                    "probed_bytes": int(probed),
                    "store_bytes": int(total),
                    "probed_fraction": round(probed / total, 4),
                    "row_groups_hit": len(hit),
                    "row_groups_total": len(rgs),
                    "files_hit": len({f for f, _ in hit}),
                    "files_total": len({f for f, *_ in rgs}),
                    "build_sec": build_sec,
                }), flush=True)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    spark.stop()


def media_extend_cost(sf_dir: str, ks: list[int]) -> None:
    """Image-tier recipe extension vs full re-materialization as the
    corpus grows K× (r14), isolated from the lexical tiers
    (quality_filter=False, dedup=False, image_dedup only). Claims
    measured: (a) re-materialization re-hashes the K×-growing corpus
    (its wall time grows with K at the ACTIVE DECODE TIER's unit cost
    — in this container that's the fake tier's sha256 floor, so the
    slope is shallow; a real decoder's ms-per-image steepens it
    ~1000× while the extension side is unchanged) whereas extension
    hashes only the ~200-doc batch and probes the fingerprint store
    (8-byte rows), paying a K-independent fixed overhead (store read
    + manifest + batch persist); (b) the cross probe really drops the
    planted payload duplicates (rows_new < batch size)."""
    import tempfile

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import corpus as C
    from etl_workflow_spark.operators import multimodal as MM
    from etl_workflow_spark.session import get_spark

    spark = get_spark("scalecheck-media")
    spark.sparkContext.setLogLevel("ERROR")
    docs0t = table(spark, sf_dir, "documents")
    d_off = (docs0t.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    img = {"max_distance": 3}
    for k in ks:
        # per-replica DISTINCT payloads (suffixed text — replicate()
        # would clone identical payloads K times and the build's own
        # image tier would dedup the growth away)
        reps = []
        for i in range(k):
            reps.append(
                docs0t.withColumn(
                    "doc_id",
                    (F.col("doc_id") + F.lit(i * d_off)).cast("long"),
                ).withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f"~rep{i}")),
                )
            )
        base_docs = reps[0]
        for r in reps[1:]:
            base_docs = base_docs.unionByName(r)
        docs = MM.with_binary_payload(base_docs).localCheckpoint(
            eager=True
        )
        # 200 fresh docs; the first 20 reuse CORPUS (replica-0)
        # payloads, so the cross probe must drop them
        fresh = (
            MM.with_binary_payload(
                docs0t.orderBy("doc_id").limit(200).withColumn(
                    "text", F.concat(F.col("text"), F.lit("~rep0"))
                )
            )
            .withColumn(
                "doc_id",
                (F.col("doc_id") + F.lit(1000 * d_off)).cast("long"),
            )
            .withColumn(
                "payload",
                F.when(
                    F.col("doc_id") < F.lit(1000 * d_off + 20),
                    F.col("payload"),
                ).otherwise(
                    F.concat(
                        F.col("payload"), F.lit(b"~new-epoch-bytes")
                    )
                ),
            )
            .localCheckpoint(eager=True)
        )
        base = tempfile.mkdtemp(prefix=f"mediaext-k{k}-")
        m0 = C.materialize_training_set(
            spark, docs, base + "/t", num_shards=8,
            quality_filter=False, dedup=False, image_dedup=img,
        )
        base_rows = m0["rows"]
        for mode in ("rematerialize", "extend"):
            best = best_m = None
            for _ in range(2):
                out2 = tempfile.mkdtemp(prefix=f"mediaext-{mode}-k{k}-")
                if mode == "extend":
                    shutil.copytree(base + "/t", out2 + "/t")
                t0 = time.time()
                if mode == "rematerialize":
                    m = C.materialize_training_set(
                        spark, docs.unionByName(fresh), out2 + "/t",
                        num_shards=8, quality_filter=False,
                        dedup=False, image_dedup=img,
                    )
                else:
                    m = C.extend_training_set(spark, fresh, out2 + "/t")
                sec = time.time() - t0
                if best is None or sec < best:
                    best, best_m = sec, m
                shutil.rmtree(out2, ignore_errors=True)
            print(json.dumps({
                "op": "media_extend", "k": k, "mode": mode,
                "rows_total": best_m["rows"],
                "rows_new": best_m["rows"] - base_rows,
                "sec": round(best, 2),
            }), flush=True)
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def bm25_pruning(sf_dir: str, ks: list[int]) -> None:
    """Scored-candidate reduction of the MaxScore-pruned BM25 ranker
    (r14) on a hot-term query: candidate docs (any query term) vs
    docs the pruning actually scores, using the OPERATOR'S OWN parts
    (`text._bm25_pruned_parts`), plus result-equality and wall times
    for both rankers. One JSON row per (replication k, query kind)."""
    import time

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators import text as T
    from etl_workflow_spark.session import get_spark

    spark = get_spark("scalecheck-bm25")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = table(spark, sf_dir, "documents")
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    for k in ks:
        docs = replicate(docs0, k, ["doc_id"], d_off).localCheckpoint(
            eager=True
        )
        post = T.build_text_index(docs).localCheckpoint(eager=True)
        dft = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        hot = dft.orderBy(F.col("df").desc(), F.col("term").asc()).first()
        rare = dft.where(F.col("df") >= 3).orderBy(
            F.col("df").asc(), F.col("term").asc()
        ).first()
        for kind, q in (
            ("hot+rare", f"{hot['term']} {rare['term']}"),
            ("hot_only", hot["term"]),
        ):
            res, cand, kept = T._bm25_pruned_parts(
                None, [q], k=10, postings=post
            )
            n_cand, n_kept = cand.count(), kept.count()
            t0 = time.time()
            pruned_rows = sorted(map(tuple, res.collect()))
            t_pruned = time.time() - t0
            t0 = time.time()
            full_rows = sorted(map(tuple, T.bm25_topk(
                None, [q], k=10, postings=post
            ).collect()))
            t_full = time.time() - t0
            print(json.dumps({
                "op": "bm25_pruning", "k": k, "query_kind": kind,
                "hot_df": int(hot["df"]), "rare_df": int(rare["df"]),
                "candidate_docs": int(n_cand),
                "scored_docs": int(n_kept),
                "scored_fraction": round(n_kept / max(n_cand, 1), 4),
                "results_equal": pruned_rows == full_rows,
                "pruned_sec": round(t_pruned, 3),
                "exhaustive_sec": round(t_full, 3),
            }), flush=True)
    spark.stop()


def main() -> None:
    args = [a for a in sys.argv[1:]
            if a not in ("--ann-recall", "--txn-sink", "--span-skew",
                         "--corpus", "--extend", "--semdedup-skew",
                         "--pq-store", "--retrieval", "--index-bytes",
                         "--bm25-pruning", "--media-extend")]
    if "--media-extend" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        media_extend_cost(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    if "--bm25-pruning" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        bm25_pruning(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    if "--index-bytes" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        index_probe_bytes(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    if "--retrieval" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        retrieval_cost(sf, [int(a) for a in args[1:]] or [1, 4, 16])
        return
    if "--pq-store" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        pq_store_cost(sf, int(args[1]) if len(args) > 1 else 40)
        return
    if "--semdedup-skew" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        semdedup_skew(sf, [int(a) for a in args[1:]] or [1, 4, 16])
        return
    if "--extend" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        extend_cost(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    if "--corpus" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        corpus_cost(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    if "--span-skew" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        span_skew(sf, [int(a) for a in args[1:]] or [10, 100, 1000])
        return
    if "--txn-sink" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        txn_sink_cost(sf, int(args[1]) if len(args) > 1 else 20)
        return
    if "--ann-recall" in sys.argv[1:]:
        sf = args[0] if args else "/root/testdata/sf0.1"
        ann_recall(sf, [int(a) for a in args[1:]] or [1, 4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(a) for a in sys.argv[2:]] or [1, 4, 16]

    from etl_workflow_spark.session import get_spark
    from etl_workflow_spark.catalog import table, events_table
    from etl_workflow_spark.operators import dedup as D
    from etl_workflow_spark.operators import multimodal as MM
    from etl_workflow_spark.operators import sessions as SES
    from etl_workflow_spark.operators import ranking as R
    from etl_workflow_spark.operators import similarity as S
    from etl_workflow_spark.operators import text as T

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = table(spark, sf_dir, "documents")
    emb0 = table(spark, sf_dir, "embeddings")
    ev0 = events_table(spark, sf_dir)
    d_off = (docs0.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    e_off = (emb0.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    u_off = (ev0.agg(F.max("user_id")).collect()[0][0] or 0) + 1

    # warm the JVM on a representative plan
    D.minhash_lsh_pairs(docs0, threshold=0.5).count()

    run = _run_forced

    for k in ks:
        docs = replicate(docs0, k, ["doc_id"], d_off).localCheckpoint(eager=True)
        emb = replicate(emb0, k, ["vec_id"], e_off).localCheckpoint(eager=True)
        ev = replicate(ev0, k, ["user_id", "event_id"], u_off).localCheckpoint(
            eager=True
        )
        run("exact_dedup", k, lambda: D.exact_dedup(docs))
        run("minhash_lsh_pairs", k, lambda: D.minhash_lsh_pairs(docs, threshold=0.5))
        run("simhash_hamming", k,
            lambda: D.hamming_pairs(D.simhash(docs), max_distance=3))
        run("text_quality", k, lambda: T.text_quality(docs))
        run("tfidf_top_terms", k, lambda: T.tfidf_top_terms(docs, k=5))
        run("image_neardup", k, lambda: MM.image_neardup_pairs(
            MM.with_binary_payload(docs)))
        run("audio_neardup", k, lambda: MM.audio_neardup_pairs(
            MM.with_binary_payload(docs)))
        run("lm_backoff3", k, lambda: T.lm_score_backoff(docs))
        run("lm_kn", k, lambda: T.lm_score_kn(docs))
        run("ann_bruteforce", k, lambda: S.brute_force_topk(
            emb,
            emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id"),
            k=5,
        ))
        run("sessionize", k, lambda: SES.sessionize(ev, gap_minutes=30))
        # fixed-size benchmark (eval sets don't grow with the corpus)
        bench = docs0.limit(50).select("text")
        run("decontamination", k,
            lambda: T.ngram_contamination(docs, bench, n=13))
        run("distributed_ntile", k, lambda: R.distributed_ntile(
            docs.select("doc_id", "n_chars"),
            [F.desc("n_chars"), F.asc("doc_id")],
            100,
        ))
        # incremental-dedup claim: a FIXED daily batch probing a K×
        # corpus should grow far slower than the K² self-join — the
        # corpus side is one index scan, verification touches only
        # matched docs
        batch = docs0.limit(100).withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * d_off + 1)
        )
        run("lsh_probe_fixed_batch", k,
            lambda: D.minhash_lsh_probe(batch, docs, threshold=0.5))
        # budget selection: fixed budget over a K× corpus — pass 2 is
        # partition-pruned, so time should track pass 1's range shuffle
        run("budget_select", k, lambda: R.select_prefix_by_budget(
            docs.select("doc_id", "n_chars"),
            [F.desc("n_chars"), F.asc("doc_id")],
            "n_chars",
            budget=500_000,
        ))
        # full-corpus k-means: time should track K (assignment passes
        # and partial-agg shuffles are linear; iterations fixed)
        run("kmeans", k,
            lambda: S.kmeans(emb, k=8, dim=64, max_iter=3)[0])
        # event analytics: funnel joins carry (user, ts) pairs only;
        # retention shuffles distinct user-periods; transitions one
        # window + a |types|^2 rollup — all linear in events
        from etl_workflow_spark.operators import temporal as TP

        run("event_funnel", k,
            lambda: TP.funnel(ev, ["view", "click", "purchase"]))
        run("event_retention", k,
            lambda: TP.retention_cohorts(ev, cohort_event="signup"))
        run("event_transitions", k,
            lambda: TP.event_transitions(ev, tiebreak_col="event_id"))
        # span dedup: linear in corpus tokens (the run-rarely pass)
        run("dedup_spans", k,
            lambda: D.dedup_spans(docs, min_tokens=50))
        # semdedup: pairing cost is sum(cell^2), so the cell COUNT
        # scales with the corpus (the paper's k ~ n recipe) to hold
        # cell sizes — and the quadratic term — constant; replicated
        # copies are genuine exact dups, so output losers grow with k
        run("semdedup", k, lambda: S.semdedup(
            emb, threshold=0.95, k=8 * k, dim=64, max_iter=3))
        # incremental semantic ingest: a FIXED batch probing a K×
        # clustered corpus — cost should track the batch's cells, not
        # the corpus (clustering itself is prep, outside the window)
        sem_assign, sem_cents = S.kmeans(emb, k=8 * k, dim=64, max_iter=3)
        sem_corpus = emb.join(
            sem_assign.select("vec_id", "cluster"), "vec_id"
        ).localCheckpoint(eager=True)
        sem_batch = emb0.limit(100).withColumn(
            "vec_id", F.col("vec_id") + F.lit((k + 1) * e_off)
        )
        run("semdedup_probe_fixed_batch", k, lambda: S.semdedup_probe(
            sem_batch, sem_corpus, sem_cents, threshold=0.95))
        # tokenizer: one vocab shuffle + driver merge loop (train) +
        # the shuffle-free Arrow encode — linear in corpus tokens
        run("bpe_tokenize", k, lambda: T.bpe_encode(
            docs.select("doc_id", "text"),
            T.train_bpe(docs, num_merges=200),
            ids=True,
        ))
        for df in (docs, emb, ev):
            df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
