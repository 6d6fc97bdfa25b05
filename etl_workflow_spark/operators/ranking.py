"""Distributed exact ranking: global row_number / ntile without the
single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` moves the entire input
to ONE task (Spark warns: "No Partition Defined for Window operation!
Moving all data to a single partition") — acceptable for a bounded
series (a few thousand dates), fatal for a per-customer or
per-document ranking at 100 TB.

This module implements the classic two-pass alternative — the same
technique as RDD ``zipWithIndex`` and Hive's TotalOrderPartitioner:

1. **Range-partition by the sort key.** Each partition then holds a
   contiguous, disjoint key range, so partition order == global
   order. Spark's RangePartitioner samples split points with a
   deterministic seed, so the layout is stable across the two passes.
2. **Sort within partitions** — no further data movement.
3. **Count rows per partition.** A map-side partial count shuffles
   exactly ``numPartitions`` rows; the driver turns them into
   cumulative offsets (a list the size of the partition count, never
   the data).
4. **Assign global positions** with an Arrow-batched ``mapInPandas``
   that adds ``offset[pid] + local position`` while preserving the
   intra-partition order the sort established.

Cost: one range shuffle plus a tiny count job. The count pass and the
assignment pass share the same exchange — Spark reuses the shuffle
files, so the second job's scan/shuffle stages are skipped, not
recomputed. Compare with the single-partition window, whose cost is
"the whole table through one task".

Determinism contract: ``order_by`` must be a TOTAL order (include a
unique tiebreak column, e.g. the primary key). With ties unbroken the
assignment within a tie group depends on physical row order and the
result is not reproducible — same caveat as ``row_number`` itself.

Reference parity: the reference gets global ranking from Postgres
window functions (single node, so "one partition" is its only mode);
this is the distributed re-expression of the same semantics.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

_PID = "__rank_pid"


def _ranked(
    df: DataFrame,
    order_by: Sequence[Column | str],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Attach a 1-based global position column; return (df, total_rows)."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_by).sortWithinPartitions(
        *order_by
    )
    # MATERIALIZE before the two passes: RangePartitioner samples split
    # points per JOB (the seed folds in the fresh RDD id), and
    # exchange reuse only applies within one action — so without this,
    # the count pass and the assign pass can see DIFFERENT partition
    # boundaries and the offsets silently corrupt the global numbering
    # (caught at sf0.1: 174 duplicated row numbers over 15k customers;
    # small inputs sketch whole partitions, which masked it in tests).
    # localCheckpoint pins the partitioning: a lost block fails the job
    # instead of recomputing with new boundaries (persist would
    # silently re-sample on eviction).
    with_pid = ranged.withColumn(
        _PID, F.spark_partition_id()
    ).localCheckpoint(eager=True)

    # Pass 1: per-partition row counts -> cumulative offsets. Partial
    # aggregation makes this a numPartitions-row shuffle regardless of
    # data size.
    counts = {
        r[_PID]: r["count"] for r in with_pid.groupBy(_PID).count().collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc
    b_offsets = spark.sparkContext.broadcast(offsets)

    # Fresh StructType: StructType.add mutates in place, which would
    # corrupt with_pid's cached schema.
    schema = StructType(
        list(with_pid.schema.fields)
        + [StructField(out_col, LongType(), False)]
    )

    def assign(batches):
        seen = 0
        for pdf in batches:
            k = len(pdf)
            if k == 0:
                pdf[out_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            base = b_offsets.value.get(int(pdf[_PID].iloc[0]), 0)
            pdf[out_col] = base + seen + np.arange(1, k + 1, dtype="int64")
            seen += k
            yield pdf

    return with_pid.mapInPandas(assign, schema=schema).drop(_PID), total


def distributed_row_number(
    df: DataFrame,
    order_by: Sequence[Column | str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based ``row_number`` over ``order_by`` without a
    single-partition window. ``order_by`` must be a total order."""
    out, _ = _ranked(df, order_by, out_col, num_partitions)
    return out


def distributed_ntile(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n: int,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n)`` over a global order, computed from the
    distributed row number with SQL-standard bucket sizing: with
    ``total`` rows, the first ``total % n`` buckets get
    ``total // n + 1`` rows, the rest ``total // n``.

    Matches ``F.ntile(n).over(Window.orderBy(...))`` (and Postgres /
    DuckDB NTILE) value-for-value, at distributed cost.
    """
    if n < 1:
        raise ValueError(f"ntile bucket count must be >= 1, got {n}")
    rn_col = f"__rank_rn_{out_col}"
    ranked, total = _ranked(df, order_by, rn_col, num_partitions)
    size, rem = divmod(total, n)
    rn = F.col(rn_col)
    if size == 0:
        # Fewer rows than buckets: bucket == row number.
        bucket = rn
    else:
        cut = rem * (size + 1)
        # ceil(a/b) over positive ints as (a + b - 1) div b.
        in_big = F.floor((rn + size) / F.lit(size + 1))
        in_small = F.lit(rem) + F.floor(
            (rn - cut + size - 1) / F.lit(size)
        )
        bucket = F.when(rn <= F.lit(cut), in_big).otherwise(in_small)
    return ranked.withColumn(out_col, bucket.cast("long")).drop(rn_col)


def select_prefix_by_budget(
    df: DataFrame,
    order_by: Sequence[Column | str],
    weight_col: str,
    budget: int,
    out_col: str = "cum_weight",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ordered-prefix selection under a weight budget: keep the
    rows earliest in ``order_by`` order whose RUNNING total of
    ``weight_col`` stays ≤ ``budget`` — the token-budget corpus
    selection of a training pipeline ("best documents first until the
    token budget is spent"), equivalent to
    ``SUM(w) OVER (ORDER BY ...) <= budget`` without the
    single-partition window.

    Same two-pass shape as :func:`distributed_row_number`, summing
    weights instead of counting rows; partitions whose cumulative
    offset already exceeds the budget are PRUNED before the assignment
    pass — at 100 TB with a 1% budget, ~99% of partitions never run
    pass 2 (their shuffle output is simply not read). ``order_by`` must
    be a total order for reproducibility; weights must be non-negative.
    Output keeps ``df``'s columns plus ``out_col`` (the running total
    INCLUDING the row, so every kept row has ``out_col <= budget``).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_by).sortWithinPartitions(
        *order_by
    )
    # same materialization contract as _ranked: the sum pass and the
    # assign pass must see identical range boundaries
    with_pid = ranged.withColumn(
        _PID, F.spark_partition_id()
    ).localCheckpoint(eager=True)

    sums = {
        r[_PID]: r["w"]
        for r in with_pid.groupBy(_PID)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    # prune: a partition whose starting offset is already past the
    # budget cannot contribute a kept row. <= not <: a partition whose
    # offset EQUALS the budget can still open with zero-weight rows
    # whose running total is exactly the budget (hypothesis-found edge)
    keep_pids = [pid for pid, off in offsets.items() if off <= budget]
    if not keep_pids:
        schema = StructType(
            list(df.schema.fields) + [StructField(out_col, LongType(), False)]
        )
        return spark.createDataFrame([], schema=schema)
    pruned = with_pid.where(F.col(_PID).isin(keep_pids))
    b_offsets = spark.sparkContext.broadcast(offsets)

    schema = StructType(
        list(with_pid.schema.fields)
        + [StructField(out_col, LongType(), False)]
    )

    def assign(batches):
        run = 0
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            base = b_offsets.value.get(int(pdf[_PID].iloc[0]), 0)
            w = pdf[weight_col].astype("int64").to_numpy()
            cum = base + run + np.cumsum(w)
            run += int(w.sum())
            pdf[out_col] = cum
            yield pdf[cum <= budget]

    return pruned.mapInPandas(assign, schema=schema).drop(_PID)


def rrf_fuse(
    ranked: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval result lists (Cormack,
    Clarke & Buettcher 2009, "Reciprocal Rank Fusion outperforms
    Condorcet and individual Rank Learning Methods"): each list
    contributes ``1 / (rrf_k + rank)`` per (query, doc) and the fused
    ranking is the per-(query, doc) sum — THE standard hybrid-search
    combiner (sparse BM25 + dense ANN), robust because it only reads
    RANKS, never the incomparable scores. Contributions are computed
    as EXACT integers — ``1000000 div (rrf_k + rank)`` — so the fused
    score is an integer sum: associative, layout-invariant, and
    bit-replayable by a SQL oracle (the module's fixed-point
    convention, with no float anywhere at all here). Ties rank by id
    ascending.

    Every input must carry ``(query_col, id_col, rank_col)``; lists
    are unioned (one shuffle on (query, id) over k·|queries|·|lists|
    rows — query-batch-sized, never corpus-sized) and the final cut
    is a windowed top-k. Returns ``(query, id, n_lists int,
    rrf_e6 bigint, rank int)`` where ``n_lists`` counts the lists
    that ranked the doc.

    Capability analog in the reference: none — extension-tier hybrid
    retrieval over the BM25 (`text.bm25_topk`) and ANN
    (`similarity.*_topk`) tiers."""
    from pyspark.sql.window import Window

    lists = [
        df.select(
            F.col(query_col).alias("query"),
            F.col(id_col).alias(id_col),
            F.expr(f"1000000 div ({int(rrf_k)} + {rank_col})").alias(
                "__c"
            ),
        )
        for df in ranked
    ]
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    allr = lists[0]
    for df in lists[1:]:
        allr = allr.unionByName(df)
    fused = allr.groupBy("query", id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("__c").alias("rrf_e6"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("rrf_e6").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("query", id_col, "n_lists", "rrf_e6", "rank")
    )


def retrieval_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Standard ranking-quality metrics per query — MRR, recall@k, and
    nDCG@k — for tuning the retrieval tier (BM25 / ANN / hybrid
    fusion) against labeled relevance judgments (``qrels``: one row
    per (query, doc) with graded ``rel >= 0``; duplicate judgment rows
    are collapsed to ``max(rel)`` before any counting, so a noisy
    qrels file cannot double-count; unlabeled docs count as rel 0).
    Everything is exact or fixed-point-deterministic:

    - ``mrr_e6 = 1000000 div r`` for the first relevant rank r (0 when
      none retrieved in the top k) — pure integers;
    - ``n_hit`` / ``n_rel`` are exact counts (recall@k = n_hit/n_rel,
      left to the caller as a ratio of ints);
    - DCG terms ``(2^rel − 1) / log2(i + 1)`` are each floored at e9
      and integer-summed (order-free), and ``ndcg_e6 = (dcg_e9 *
      1000000) div idcg_e9`` is integer division — so a SQL oracle
      replays every value bit-for-bit. IDCG places the query's
      relevance grades in descending order (standard ideal ranking).

    Shapes: qrels join on (query, doc) — judgment sets are small; the
    IDCG window partitions by query over qrels only. Queries with no
    relevant docs at all are omitted (their metrics are undefined).
    Returns ``(query, n_rel, n_hit, mrr_e6, dcg_e9, idcg_e9,
    ndcg_e6)``."""
    from pyspark.sql.window import Window

    r = ranked.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).alias("__rank"),
    ).where(F.col("__rank") <= int(k))
    # graded rel is bounded so the per-term fixed points stay sane:
    # a rel-16 term is (2^16-1)*1e9 ~ 6.6e13 in e9 — k of them sum
    # comfortably inside int64, and the ndcg division widens its
    # intermediate to decimal (see below); grades above 16 have no
    # published meaning. The guard rides INSIDE the consumed column
    # (a dropped assert column would be pruned away by the optimizer).
    j = qrels.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("__id"),
        F.when(
            F.col(rel_col) > 16,
            F.raise_error(
                F.lit(
                    "retrieval_metrics supports graded rel <= 16 "
                    "(fixed-point DCG must fit int64)"
                )
            ),
        )
        .otherwise(F.col(rel_col))
        .alias("__rel"),
    )
    # Dedupe judgments: duplicate (query, doc) qrel rows would
    # double-count n_rel/n_hit and inflate DCG and IDCG (each dup
    # joins every matching hit and contributes its own ideal term).
    # max(rel) is the standard resolution for conflicting grades.
    j = j.groupBy("query", "__id").agg(F.max("__rel").alias("__rel"))
    hits = r.join(j, ["query", "__id"]).where(F.col("__rel") > 0)
    dcg_term = F.floor(
        (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0))
        / F.log2(F.col("__rank") + F.lit(1))
        * F.lit(1e9)
    )
    per_hit = hits.groupBy("query").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit"),
        F.expr("1000000 div min(__rank)").alias("mrr_e6"),
        F.sum(dcg_term).alias("dcg_e9"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    ideal = (
        j.where(F.col("__rel") > 0)
        .withColumn("__irank", F.row_number().over(w))
        .where(F.col("__irank") <= int(k))
    )
    idcg_term = F.floor(
        (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0))
        / F.log2(F.col("__irank") + F.lit(1))
        * F.lit(1e9)
    )
    per_ideal = ideal.groupBy("query").agg(
        F.sum(idcg_term).alias("idcg_e9"),
    )
    n_rel = (
        j.where(F.col("__rel") > 0)
        .groupBy("query")
        .agg(F.count(F.lit(1)).cast("int").alias("n_rel"))
    )
    return (
        n_rel.join(per_ideal, "query")
        .join(per_hit, "query", "left")
        .select(
            "query",
            "n_rel",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.coalesce(F.col("mrr_e6"), F.lit(0)).alias("mrr_e6"),
            F.coalesce(F.col("dcg_e9"), F.lit(0)).alias("dcg_e9"),
            "idcg_e9",
            # the ×1e6 intermediate would wrap int64 for high grades
            # (rel 14-16 terms are ~1e13-6.6e13 in e9), so it widens
            # to DECIMAL(38,0); the RESULT always fits — dcg <= idcg
            # termwise (each actual hit's discount position >= its
            # ideal position and its grade <= the ideal grade at that
            # position, and floor is monotone), so ndcg_e6 <= 1e6
            F.expr(
                "CAST(coalesce(dcg_e9, 0) AS DECIMAL(38,0)) * 1000000 "
                "div idcg_e9"
            ).alias("ndcg_e6"),
        )
    )


def retrieval_metrics_oracle(
    ranked_sql: str, qrels_sql: str, k: int = 10
) -> str:
    """DuckDB twin of :func:`retrieval_metrics`: every value is either
    an exact integer or the identically-parenthesized IEEE double
    floored at a fixed point, so hashes match bit-for-bit. The one
    trap: Spark's ``log2(x)`` is ``ln(x)/ln(2)`` (1 ulp off DuckDB's
    native ``log2`` at x in {9, 10, 11, 12, 14, 17, ...} — exactly the
    rank+1 values a k=10 ranking produces), so the discount here
    spells out the quotient. ``ranked_sql`` yields (query, doc_id,
    rank); ``qrels_sql`` yields (query, doc_id, rel). The nDCG
    intermediate here is plain BIGINT, which holds for graded
    ``rel <= 9`` at k=10 (dcg_e9·1e6 < 2^63); the engine side widens
    to DECIMAL for the 10..16 range — mirror with HUGEINT if a gate
    ever uses grades that high."""
    dcg = (
        "CAST(floor(((pow(2.0, rel) - 1.0)"
        " / (ln(CAST({r} + 1 AS DOUBLE)) / ln(2.0)))"
        " * 1000000000.0) AS BIGINT)"
    )
    return f"""
        WITH r AS (
            SELECT query, doc_id, rank FROM ({ranked_sql})
            WHERE rank <= {int(k)}
        ),
        j AS (
            SELECT query, doc_id, MAX(rel) AS rel
            FROM ({qrels_sql}) GROUP BY 1, 2
        ),
        hits AS (
            SELECT r.query, r.doc_id, r.rank, j.rel
            FROM r JOIN j USING (query, doc_id) WHERE j.rel > 0
        ),
        per_hit AS (
            SELECT query, CAST(COUNT(*) AS INT) AS n_hit,
                   CAST(1000000 // MIN(rank) AS BIGINT) AS mrr_e6,
                   CAST(SUM({dcg.format(r='rank')}) AS BIGINT) AS dcg_e9
            FROM hits GROUP BY 1
        ),
        ideal AS (
            SELECT query, rel,
                   ROW_NUMBER() OVER (PARTITION BY query
                                      ORDER BY rel DESC, doc_id) AS irank
            FROM j WHERE rel > 0
        ),
        per_ideal AS (
            SELECT query,
                   CAST(SUM({dcg.format(r='irank')}) AS BIGINT) AS idcg_e9
            FROM ideal WHERE irank <= {int(k)} GROUP BY 1
        ),
        n_rel AS (
            SELECT query, CAST(COUNT(*) AS INT) AS n_rel
            FROM j WHERE rel > 0 GROUP BY 1
        )
        SELECT n_rel.query, n_rel.n_rel,
               COALESCE(per_hit.n_hit, 0) AS n_hit,
               CAST(COALESCE(per_hit.mrr_e6, 0) AS BIGINT) AS mrr_e6,
               CAST(COALESCE(per_hit.dcg_e9, 0) AS BIGINT) AS dcg_e9,
               per_ideal.idcg_e9,
               CAST((COALESCE(per_hit.dcg_e9, 0) * 1000000)
                    // per_ideal.idcg_e9 AS BIGINT) AS ndcg_e6
        FROM n_rel
        JOIN per_ideal USING (query)
        LEFT JOIN per_hit USING (query)
    """


def mmr_rerank(
    ranked: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_col: str = "query",
    id_col: str = "doc_id",
    score_col: str = "score_e4",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance result diversification (Carbonell &
    Goldstein 1998): greedily re-rank each query's candidates by
    ``λ·rel − (1−λ)·max cos(d, already-selected)`` so near-duplicate
    hits don't monopolize the top of the list — the standard
    diversity pass over a BM25/hybrid ranking, with document vectors
    from the embedding tier (or :func:`~.text.hashed_tfidf_vectors`
    for text-only corpora). Relevance is min-max normalized to [0, 1]
    per query (a single-candidate or all-equal query normalizes to
    1.0), λ=1 reproduces pure relevance order. A ranked candidate
    with NO vector row fails loudly (an inner join would silently
    delete top hits — corrupting every downstream metric).

    Per-query greedy selection is inherently sequential, so it runs
    as one ``applyInPandas`` group per query over the TOP-CANDIDATE
    set only — candidate counts are the upstream ranking's k (tens to
    hundreds), never corpus-sized, so each group is a trivial numpy
    loop and queries parallelize across the cluster. Deterministic
    BIT-FOR-BIT (r12): unit vectors quantize to the 2^-20 grid before
    the similarity dot, so every pairwise similarity is an order-free
    integer sum closed by one correctly-rounded division — identical
    on any executor architecture, and replayable by a SQL oracle
    (:func:`mmr_rerank_oracle`) when the input vectors are exact
    small-integer arrays. Ties break by id ascending. Returns
    ``(query, id, mmr_e6 bigint, rank int)`` with ``mmr_e6`` the
    floor-e6 selection score (the first pick's score is its
    normalized relevance)."""
    import math

    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1] (got {lam})")
    # Fetch shape (the 100 TB story): `vectors` is corpus-sized, the
    # candidate set is k·|queries| rows. A direct left-join would make
    # Spark shuffle the ENTIRE vectors table (the preserved left side
    # of a left-outer join can't be broadcast, and the right side is
    # too big to) — confirmed SortMergeJoin at r11. Instead, prune
    # vectors first with a broadcast LEFT-SEMI join on the candidate
    # ids: the tiny id set broadcasts into the vectors scan (a
    # scan-side filter, zero shuffle of vectors), leaving a
    # k·|queries|-sized pruned set that itself broadcasts into the
    # left-join below.
    cand_ids = ranked.select(F.col(id_col).alias("__id")).distinct()
    pruned = vectors.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).join(F.broadcast(cand_ids), "__id", "left_semi")
    # LEFT join + loud guard: an inner join would silently DELETE any
    # candidate without a vector row — a diversity pass that drops top
    # hits corrupts every downstream metric; a missing vector is a
    # pipeline bug the caller must see
    cand = ranked.select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("__id"),
        F.col(score_col).cast("double").alias("__s"),
    ).join(
        F.broadcast(pruned),
        "__id",
        "left",
    ).select(
        "query",
        "__id",
        "__s",
        F.when(
            F.col("__v").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "mmr_rerank: no vector for ranked candidate "
                        f"{id_col}="
                    ),
                    F.col("__id").cast("string"),
                )
            ),
        )
        .otherwise(F.col("__v"))
        .alias("__v"),
    )
    from pyspark.sql.types import IntegerType

    fields = {f.name: f.dataType for f in cand.schema.fields}
    out_schema = StructType([
        StructField("query", fields["query"]),
        StructField(id_col, fields["__id"]),
        StructField("mmr_e6", LongType()),
        StructField("rank", IntegerType()),
    ])

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        s = pdf["__s"].to_numpy(dtype=np.float64)
        vecs = np.array([np.asarray(v, dtype=np.float64)
                         for v in pdf["__v"]])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        # Quantize unit vectors to the 2^-20 grid BEFORE any dot
        # product (r12): a float dot's value depends on numpy's
        # summation order (pairwise/SIMD blocking), which varies with
        # build and architecture — on a heterogeneous 100 TB cluster
        # two executors could rank the same group differently, and no
        # SQL oracle could replay it. Integer dots are order-free and
        # exact (|dot| <= dim * 2^40 < 2^63 for any real dim), and the
        # single closing division is one correctly-rounded IEEE op —
        # so mmr_e6 is bit-deterministic everywhere. The 2^-20
        # similarity granularity (~1e-6) is far below any meaningful
        # diversity signal.
        unit = np.floor(
            (vecs / norms[:, None]) * 2.0**20
        ).astype(np.int64)
        lo, hi = float(s.min()), float(s.max())
        rel = (
            np.ones_like(s) if hi == lo else (s - lo) / (hi - lo)
        )
        n = len(ids)
        picked: list[int] = []
        scores: list[int] = []
        max_sim = np.full(n, -np.inf)
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(int(k), n)):
            if picked:
                mmr = lam * rel - (1.0 - lam) * max_sim
            else:
                mmr = rel.copy()
            mmr[~remaining] = -np.inf
            best = int(np.argmax(mmr))  # ties -> lowest index == lowest id
            picked.append(best)
            scores.append(math.floor(float(mmr[best]) * 1e6))
            remaining[best] = False
            sim = (unit @ unit[best]) / 2.0**40
            max_sim = np.maximum(max_sim, sim)
        return pd.DataFrame({
            "query": pdf["query"].iloc[:1].repeat(len(picked)).values,
            id_col: ids[picked],
            "mmr_e6": pd.array(scores, dtype="Int64"),
            "rank": pd.array(range(1, len(picked) + 1), dtype="Int32"),
        })

    return cand.groupBy("query").applyInPandas(pick, out_schema)


def mmr_rerank_oracle(
    ranked_sql: str,
    vectors_sql: str,
    k: int = 5,
    lam: float = 0.7,
) -> str:
    """DuckDB twin of :func:`mmr_rerank`, enabled by the r12
    quantized-cosine path: because every pairwise similarity is an
    order-free integer dot closed by one division, the greedy loop
    replays exactly as ``k`` unrolled pick/update CTE stages (a
    recursive CTE cannot aggregate over its own frontier; unrolling
    can, and k is a small constant). ``ranked_sql`` yields (query,
    doc_id, score_e4); ``vectors_sql`` yields (doc_id, v LIST(DOUBLE))
    whose elements must be EXACT small integers (so norms are square
    roots of exact sums — the gate derives them from doc_id
    arithmetic). Every float literal is CAST to DOUBLE, and the
    (1 - λ) complement is computed, not written as a literal — Python
    1.0-0.7 is 0.30000000000000004 and the oracle must feed libm the
    same bits. The shared CTEs are MATERIALIZED: DuckDB inlines CTEs
    by default, and the k unrolled stages reference ``rel``/``sims``
    ~3k times total — inlined, every reference re-evaluates
    ``ranked_sql`` (a 5x gate slowdown, measured). Returns ``(query,
    doc_id, mmr_e6, rank)``."""
    lam_sql = f"CAST({float(lam)!r} AS DOUBLE)"
    one_minus = f"(CAST(1.0 AS DOUBLE) - {lam_sql})"
    q20 = "CAST(1048576.0 AS DOUBLE)"     # 2^20
    q40 = "CAST(1099511627776.0 AS DOUBLE)"  # 2^40
    parts = [f"""
        cand AS MATERIALIZED (
            SELECT query, doc_id,
                   CAST(score_e4 AS DOUBLE) AS s
            FROM ({ranked_sql})
        ),
        rel AS MATERIALIZED (
            SELECT query, doc_id,
                   CASE WHEN hi = lo THEN CAST(1.0 AS DOUBLE)
                        ELSE (s - lo) / (hi - lo) END AS rel
            FROM (
                SELECT query, doc_id, s,
                       MIN(s) OVER (PARTITION BY query) AS lo,
                       MAX(s) OVER (PARTITION BY query) AS hi
                FROM cand
            )
        ),
        vx AS (
            SELECT v.doc_id, v.v
            FROM ({vectors_sql}) v
            JOIN (SELECT DISTINCT doc_id FROM cand) c USING (doc_id)
        ),
        uqv AS (
            SELECT doc_id,
                   list_transform(
                       v, x -> FLOOR((x / nrm) * {q20})
                   ) AS uq
            FROM (
                SELECT doc_id, v,
                       CASE WHEN nrm0 = 0 THEN CAST(1.0 AS DOUBLE)
                            ELSE nrm0 END AS nrm
                FROM (
                    SELECT doc_id, v,
                           sqrt(list_sum(
                               list_transform(v, x -> x * x)
                           )) AS nrm0
                    FROM vx
                )
            )
        ),
        uqr AS (
            SELECT doc_id, generate_subscripts(uq, 1) AS j,
                   CAST(unnest(uq) AS BIGINT) AS u
            FROM uqv
        ),
        sims AS MATERIALIZED (
            SELECT a.doc_id AS ad, b.doc_id AS bd,
                   CAST(SUM(a.u * b.u) AS DOUBLE) / {q40} AS sim
            FROM uqr a JOIN uqr b USING (j)
            GROUP BY 1, 2
        ),
        p1 AS (
            SELECT query, doc_id, rel AS mmr, 1 AS rank
            FROM (
                SELECT query, doc_id, rel,
                       ROW_NUMBER() OVER (
                           PARTITION BY query
                           ORDER BY rel DESC, doc_id ASC
                       ) AS rn
                FROM rel
            ) WHERE rn = 1
        ),
        m1 AS (
            SELECT r.query, r.doc_id, s.sim AS ms
            FROM rel r
            JOIN p1 p USING (query)
            JOIN sims s ON s.ad = r.doc_id AND s.bd = p.doc_id
        )"""]
    for t in range(2, int(k) + 1):
        prev_picks = " UNION ALL ".join(
            f"SELECT query, doc_id FROM p{i}" for i in range(1, t)
        )
        parts.append(f"""
        sc{t} AS (
            SELECT r.query, r.doc_id,
                   {lam_sql} * r.rel - {one_minus} * m.ms AS mmr
            FROM rel r
            JOIN m{t - 1} m
              ON m.query = r.query AND m.doc_id = r.doc_id
            WHERE NOT EXISTS (
                SELECT 1 FROM ({prev_picks}) pk
                WHERE pk.query = r.query AND pk.doc_id = r.doc_id
            )
        ),
        p{t} AS (
            SELECT query, doc_id, mmr, {t} AS rank
            FROM (
                SELECT query, doc_id, mmr,
                       ROW_NUMBER() OVER (
                           PARTITION BY query
                           ORDER BY mmr DESC, doc_id ASC
                       ) AS rn
                FROM sc{t}
            ) WHERE rn = 1
        ),
        m{t} AS (
            SELECT m.query, m.doc_id,
                   GREATEST(m.ms, s.sim) AS ms
            FROM m{t - 1} m
            JOIN p{t} p USING (query)
            JOIN sims s ON s.ad = m.doc_id AND s.bd = p.doc_id
        )""")
    final = " UNION ALL ".join(
        f"SELECT query, doc_id, mmr, rank FROM p{i}"
        for i in range(1, int(k) + 1)
    )
    return (
        "WITH " + ",".join(parts) + f"""
        SELECT query, doc_id,
               CAST(FLOOR(mmr * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
                   AS mmr_e6,
               CAST(rank AS INT) AS rank
        FROM ({final})
    """
    )
