"""Similarity search and near-duplicate detection over embedding
columns (array<float>).

Top-k search tiers:

  brute_force_topk   exact cosine top-k: broadcast the (small) query
                     set against the corpus — one narrow pass over the
                     corpus, per-partition top-k via window. The
                     baseline and the verifier for approximate tiers.

  lsh_topk           random-hyperplane LSH: bucket corpus + queries by
                     sign-bit sketches, search only same-bucket
                     candidates (multi-probe via band tables). Shuffle
                     is bucket-local; cost scales with collisions, not
                     corpus size × queries.

All-pairs near-dup tiers (cosine >= threshold):

  embedding_neardup_exact     broadcast nested-loop self-join — the
                              quadratic audit tier, oracle-checkable.
  embedding_neardup_blocked   exact via blocked numpy matmul (one
                              Arrow batch + BLAS call per block pair);
                              the workhorse when blocks fit memory.
  embedding_neardup_lsh       sketch-bucketed candidates + exact
                              verification; prunes only in the
                              high-similarity regime (>=0.8 cosine)
                              where true near-dups live.

Plan-shape expressions (filters, joins, top-k) stay JVM-side; dense
linear algebra (sketching, block scoring) runs in Arrow-batched numpy
UDFs — per-element HOF lambdas are interpreted and lose to BLAS by
orders of magnitude on both local and cluster profiles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType
from pyspark.sql.window import Window


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` is expected to be small (an ANN batch); it is broadcast
    so the corpus never shuffles — the only exchange is the final
    per-query top-k, which AQE keeps tiny (k rows per query per
    partition after the window's partial rank pruning).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("cvec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select(
            "query_id",
            "neighbor_id",
            # fixed-point e4 via floor: round(double, 4) sits on a
            # .00005 knife edge where Spark (HALF_UP) and DuckDB
            # (HALF_EVEN) disagree; floor only flips when score*1e4 is
            # exactly integral, which cosine values essentially never
            # hit except the exact 1.0 self-similarity (integral on
            # both engines anyway)
            F.floor(F.col("score") * 10000).alias("score_e4"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def brute_force_topk_oracle(
    k: int = 5, query_predicate: str = "vec_id < 8", table: str = "embeddings"
) -> str:
    """DuckDB twin: double-cast lists + list_cosine_similarity (same
    left-to-right accumulation, double precision → floor-e4 fixed
    point is engine-stable)."""
    return f"""
        WITH q AS (
            SELECT vec_id AS query_id,
                   CAST(embedding AS DOUBLE[]) AS qvec
            FROM {table} WHERE {query_predicate}
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qvec)
                       AS score
            FROM {table} c CROSS JOIN q
            WHERE c.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id,
               CAST(floor(score * 10000) AS BIGINT) AS score_e4,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
    """


def hyperplane_sketch(
    vec: Column, num_planes: int = 16, dim: int = 64, seed: int = 7
) -> Column:
    """Sign-bit sketch: bit p = 1 iff dot(vec, h_p) > 0 for a
    deterministic pseudo-random hyperplane h_p. Hyperplanes derive from
    a splittable hash of (seed, plane, coordinate) — reproducible on
    any cluster without shipping a matrix.
    """
    bits = []
    for p in range(num_planes):
        # h_p[i] in {-1,+1} from xxhash64 of (coordinate index, seed+plane)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x
                * F.when(
                    F.xxhash64(i, F.lit(seed + p)).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sketch = bits[0]
    for b in bits[1:]:
        sketch = sketch.bitwiseOR(b)
    return sketch


def _cosine_batch_fn(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched cosine for candidate-pair scoring: one einsum per
    batch instead of an interpreted fold per row — the verification
    step's cost then tracks candidate count, not lambda overhead."""
    import numpy as np

    a = np.array(va.tolist(), dtype=np.float64)
    b = np.array(vb.tolist(), dtype=np.float64)
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return pd.Series(num / den)


_cosine_batch = F.pandas_udf(_cosine_batch_fn, DoubleType())

# Planning fence for "score, then threshold-filter" call sites: when a
# threshold Filter sits above the scoring projection, Catalyst pushes
# the filter below it by substituting the expression — and a Python UDF
# referenced by both Filter and Project is planned as TWO
# ArrowEvalPython nodes, scoring every candidate twice. The function is
# perfectly deterministic; the marking only forbids that pushdown, so
# the batch cosine runs once and the filter consumes its column.
# A SEPARATE pandas_udf object, not `_cosine_batch.asNondeterministic()`
# — asNondeterministic mutates the UDF in place, which would silently
# fence every `_cosine_batch` site too (it shares the object).
# (Plan-tested in test_plans.py::test_neardup_verify_scores_once.)
_cosine_batch_once = F.pandas_udf(
    _cosine_batch_fn, DoubleType()
).asNondeterministic()


def _verified_pairs(cand: DataFrame, thr_e4: int) -> DataFrame:
    """Shared verification tail for candidate pairs carrying columns
    ``(vec_a, vec_b, va, vb)``: floor-e4 cosine scored ONCE per
    candidate behind the planning fence, thresholded, ids normalized
    to (min, max). Every tier's verify stanza goes through here so the
    fixed-point convention, the fence, and the normalization cannot
    drift apart."""
    return (
        cand.withColumn(
            "cosine_e4",
            F.floor(_cosine_batch_once(F.col("va"), F.col("vb")) * 10000),
        )
        .where(F.col("cosine_e4") >= F.lit(int(thr_e4)))
        .select(
            F.least("vec_a", "vec_b").alias("vec_a"),
            F.greatest("vec_a", "vec_b").alias("vec_b"),
            "cosine_e4",
        )
    )


def _banded_sketch(
    df: DataFrame,
    idname: str,
    id_col: str,
    vec_col: str,
    num_planes: int,
    bands: int,
    dim: int,
    seed: int = 7,
    with_vec: bool = True,
) -> DataFrame:
    """(id[, vec], band, bucket) rows: sign-sketch each vector and explode
    its sketch into ``bands`` bucket keys for the LSH join. Pass
    ``with_vec=False`` when the caller re-joins vectors later — carrying
    the array through the band explode copies it ``bands`` times into
    the bucket shuffle.

    The sketch is one Arrow-batched numpy matmul against a seeded
    Gaussian hyperplane matrix (V @ H > 0 → bit-pack) — dense linear
    algebra belongs in BLAS, not in per-coordinate expressions: the
    interpreted-HOF form (:func:`hyperplane_sketch`) and a relational
    posexplode+32-sums form both spent seconds where this spends
    milliseconds, and the matrix regenerates from the seed on every
    executor so nothing is broadcast.
    """
    rows_per_band = num_planes // bands
    mask = (1 << rows_per_band) - 1
    vec_alias = f"{idname}_vec"

    @F.pandas_udf(LongType())
    def sketch_batch(vs: pd.Series) -> pd.Series:
        import numpy as np

        # Gaussian hyperplanes regenerated from the seed on every
        # executor — nothing to broadcast, reproducible everywhere.
        H = np.random.RandomState(seed).standard_normal((dim, num_planes))
        M = np.array(vs.tolist(), dtype=np.float64)
        bits = (M @ H) > 0
        out = np.zeros(len(M), dtype=np.uint64)
        for p in range(num_planes):
            out |= bits[:, p].astype(np.uint64) << np.uint64(p)
        return pd.Series(out.view(np.int64))

    base_cols = [F.col(id_col).alias(idname)]
    if with_vec:
        base_cols.append(F.col(vec_col).alias(vec_alias))
    with_sketch = df.select(
        *base_cols, sketch_batch(_as_double(F.col(vec_col))).alias("sketch")
    )
    keep = [idname, vec_alias] if with_vec else [idname]
    return with_sketch.select(
        *keep,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("sketch"), b * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        *keep,
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: sign-sketch both sides, band the sketch
    bits, join on (band, band_bits) buckets, score only collisions.

    Recall is tunable via planes/bands (same S-curve as MinHash LSH);
    the exact scorer :func:`brute_force_topk` is the audit path.
    """
    qb = _banded_sketch(
        queries.withColumnRenamed(query_id_col, id_col)
        if query_id_col != id_col
        else queries,
        "query_id", id_col, vec_col, num_planes, bands, dim,
    )
    cb = _banded_sketch(corpus, "neighbor_id", id_col, vec_col, num_planes, bands, dim)
    cand = (
        cb.join(qb, on=["band", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_id_vec", "neighbor_id", "neighbor_id_vec")
        .distinct()
        .withColumn(
            "score",
            cosine(_as_double(F.col("neighbor_id_vec")), _as_double(F.col("query_id_vec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("score") * 10000).alias("score_e4"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------- near-dup pairs


def embedding_neardup_exact(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (a < b) pair
    with cosine similarity >= threshold.

    Inherently quadratic (broadcast nested-loop self-join) — this is
    the verification/audit tier; use :func:`embedding_neardup_blocked`
    (vectorized matmul) or :func:`embedding_neardup_lsh` (bucketed
    candidates) at corpus scale.
    """
    a = emb.select(
        F.col(id_col).alias("vec_a"), _as_double(F.col(vec_col)).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"), _as_double(F.col(vec_col)).alias("vb")
    )
    # scoring via the Arrow/numpy batch UDF: the interpreted HOF fold
    # took 13s for 125k pairs at sf0.01 where einsum takes <1s, and the
    # blocked tier already proved the numpy math oracle-exact
    return _verified_pairs(
        a.join(b, F.col("vec_a") < F.col("vec_b")),
        int(threshold * 10000 + 0.5),
    )


def embedding_neardup_exact_oracle(
    threshold: float = 0.45, table: str = "embeddings"
) -> str:
    # floor-e4 fixed point (not round): np.round is HALF_EVEN, DuckDB
    # round is half-away — floor of the identical double is the only
    # representation all tiers and both engines agree on bit-for-bit
    thr_e4 = int(threshold * 10000 + 0.5)
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(floor(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])) * 10000) AS BIGINT)
                   AS cosine_e4
        FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) * 10000) >= {thr_e4}
    """


def embedding_neardup_blocked(
    emb: DataFrame,
    threshold: float = 0.45,
    num_blocks: int | None = None,
    rows_per_block: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
    group_sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact near-dup pairs via blocked matrix multiplication.

    The corpus is hashed into ``num_blocks`` row-blocks; every block
    pair (i <= j) becomes ONE row carrying both blocks' vectors, and a
    vectorized Pandas UDF scores the whole block pair with a single
    numpy matmul (Arrow batch in, BLAS inside — the pattern that swaps
    straight onto a GPU scorer). Same exact result set as
    :func:`embedding_neardup_exact`; FP sums differ only in the last
    ulp (numpy pairwise vs left-fold accumulation).

    With ``group_col``, pairs are computed only WITHIN each group
    (the :func:`semdedup` shape: group = k-means cell) — block pairs
    join on equal group, and each group gets its own block count
    derived from its OWN size (a global count would shred small
    groups into thousands of near-empty blocks and the block-pair
    join would quadratically multiply them; parallelism comes from
    the groups themselves). Rows whose group value is NULL have no
    group membership and are EXCLUDED from pairing (filtered, not
    silently lost in a join). ``group_sizes`` optionally supplies the
    per-group row counts as a ``(group_col, n)`` frame when the caller
    already has them (semdedup derives them from the checkpointed
    k-means assignment), skipping this function's own counting pass
    over the input; ``num_blocks`` applies only to the ungrouped path
    (grouped block counts are per group by construction — combining
    the two is refused).

    Scale shape: one groupBy exchange carries the N (id, vec) rows
    into block rows (one fat row per block), then the self-join over
    that B-row frame produces (num_blocks^2)/2 block-pair rows — the
    join inputs are block summaries, not the original N rows (the
    planner may build each side from the same shuffle or re-aggregate
    the broadcast side; either way the join itself never re-keys the
    corpus). By default
    ``num_blocks`` is derived from the corpus count so each
    collect_list block row stays ~rows_per_block vectors (a fixed block
    COUNT was the scale bug: at 100x corpus a block row outgrows
    Arrow/row-size limits; a fixed block SIZE cannot).
    """
    import math

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    if group_col is not None and num_blocks is not None:
        raise ValueError(
            "num_blocks applies only to ungrouped pairing; with "
            "group_col the block count is derived per group from "
            "rows_per_block"
        )
    base = emb.select(
        *([F.col(group_col).alias("grp")] if group_col else []),
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
    )
    if group_col is not None:
        base = base.where(F.col("grp").isNotNull())
        # per-group block count from per-group size; the size table is
        # one row per group — broadcast back onto the rows
        if group_sizes is not None:
            if len(group_sizes.columns) != 2:
                raise ValueError(
                    "group_sizes must have exactly two columns "
                    "(group value, row count), got "
                    f"{group_sizes.columns}"
                )
            sizes = group_sizes.select(
                F.col(group_sizes.columns[0]).alias("grp"),
                F.col(group_sizes.columns[1]).cast("long").alias("__n"),
            )
        else:
            sizes = base.groupBy("grp").agg(F.count(F.lit(1)).alias("__n"))
        nb = F.greatest(
            F.lit(1),
            F.ceil(F.col("__n") / F.lit(int(rows_per_block))).cast("long"),
        )
        # LEFT join: a group missing from caller-supplied sizes (stale
        # snapshot) must not silently drop its rows from pairing — __n
        # is then NULL, greatest() skips it, and the group falls back
        # to one block (correct pairs, possibly an oversized block)
        keyed = base.join(F.broadcast(sizes), "grp", "left").select(
            "grp",
            (F.crc32(F.col("id").cast("string")) % nb).alias("blk"),
            "id",
            "vec",
        )
        grp_cols = ["grp", "blk"]
    else:
        if num_blocks is None:
            n = emb.count()
            # two bounds: block SIZE stays <= rows_per_block (a fixed
            # count outgrows Arrow row limits at 100x corpus), and block
            # COUNT stays >= ~8 when the corpus allows (>=64 rows/block)
            # so the B(B+1)/2 block pairs actually spread across
            # executors — with one block the whole matmul lands on a
            # single task.
            num_blocks = max(
                math.ceil(n / rows_per_block),
                min(8, max(1, n // 64)),
            )
        keyed = base.select(
            (F.crc32(F.col("id").cast("string")) % num_blocks).alias("blk"),
            "id",
            "vec",
        )
        grp_cols = ["blk"]

    blocks = keyed.groupBy(*grp_cols).agg(
        F.collect_list(F.struct("id", "vec")).alias("rows")
    )
    thr_e4 = int(threshold * 10000 + 0.5)
    pair_schema = ArrayType(
        StructType(
            [
                StructField("vec_a", LongType()),
                StructField("vec_b", LongType()),
                StructField("cosine_e4", LongType()),
            ]
        )
    )

    @F.pandas_udf(pair_schema)
    def score_blocks(
        diag: pd.Series, xs: pd.Series, ys: pd.Series
    ) -> pd.Series:
        import numpy as np

        out = []
        for is_diag, x, y in zip(diag, xs, ys):
            ids_x = np.array([r["id"] for r in x], dtype=np.int64)
            ids_y = np.array([r["id"] for r in y], dtype=np.int64)
            mx = np.array([r["vec"] for r in x], dtype=np.float64)
            my = np.array([r["vec"] for r in y], dtype=np.float64)
            sims = (mx @ my.T) / np.outer(
                np.linalg.norm(mx, axis=1), np.linalg.norm(my, axis=1)
            )
            # floor-e4 fixed point: np.round is HALF_EVEN which can
            # disagree with both Spark HALF_UP and DuckDB half-away on
            # .00005 edges; floor of the same double agrees everywhere
            sims_e4 = np.floor(sims * 10000).astype(np.int64)
            mask = sims_e4 >= thr_e4
            if is_diag:
                # diagonal block pair (DECLARED by key equality, never
                # inferred from element order — collect_list order is a
                # shuffle-fetch artifact): both sides hold the same id
                # set, so keeping only id_x < id_y emits each unordered
                # pair exactly once and no self-pairs, regardless of
                # how either side happens to be ordered
                mask &= ids_x[:, None] < ids_y[None, :]
            # off-diagonal: keep every hit — block assignment is a hash,
            # so either side may hold the smaller id; normalize below
            ia, ib = np.nonzero(mask)
            out.append(
                [
                    {
                        "vec_a": int(min(ids_x[i], ids_y[j])),
                        "vec_b": int(max(ids_x[i], ids_y[j])),
                        "cosine_e4": int(sims_e4[i, j]),
                    }
                    for i, j in zip(ia, ib)
                ]
            )
        return pd.Series(out)

    x, y = blocks.alias("x"), blocks.alias("y")
    cond = F.col("x.blk") <= F.col("y.blk")
    if group_col is not None:
        # equi-key first: Catalyst plans a hash join on grp with the
        # blk inequality as a post-filter, never a cross of groups
        cond = (F.col("x.grp") == F.col("y.grp")) & cond
    block_pairs = x.join(y, cond).select(
        score_blocks(
            F.col("x.blk") == F.col("y.blk"),
            F.col("x.rows"),
            F.col("y.rows"),
        ).alias("hits")
    )
    # explode_OUTER, then drop the null rows it emits for empty hit
    # lists: a plain explode makes Catalyst infer a size(hits)>0
    # pre-filter that references the UDF column, and a Python UDF
    # referenced by both a Filter and a Project is EVALUATED TWICE
    # (two ArrowEvalPython nodes) — doubling the entire matmul cost.
    # The post-generate null filter is a cheap JVM predicate instead.
    return (
        block_pairs.select(F.explode_outer("hits").alias("h"))
        .where(F.col("h").isNotNull())
        .select(
            F.col("h.vec_a").alias("vec_a"),
            F.col("h.vec_b").alias("vec_b"),
            F.col("h.cosine_e4").alias("cosine_e4"),
        )
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.45,
    num_planes: int = 32,
    bands: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: hyperplane-LSH bucket self-join for
    candidates, exact cosine verification against the threshold.

    Output is a subset of :func:`embedding_neardup_exact` (no false
    positives — verification is exact); recall follows the sign-sketch
    S-curve in planes/bands (defaults: r=4 bits/band × 8 bands ≈ .75
    recall at cosine 0.4 on isotropic vectors, ≥.97 above 0.9 — the
    regime near-dup detection actually targets). The only corpus-wide
    shuffle is the (band, bucket) exchange; candidate verification is
    an Arrow-batched numpy pass, so its cost tracks collision count.
    """
    banded = _banded_sketch(
        emb, "m", id_col, vec_col, num_planes, bands, dim, with_vec=False
    )
    a = banded.select(F.col("m").alias("vec_a"), "band", "bucket")
    b = banded.select(F.col("m").alias("vec_b"), "band", "bucket")
    # candidates carry only id pairs through the bucket join + distinct;
    # vectors re-join afterwards — shuffling arrays with every collision
    # row made this 5× slower (and at corpus scale, unshippable)
    cand = (
        a.join(b, on=["band", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    vecs = emb.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    return _verified_pairs(
        cand.join(
            vecs.select(F.col("id").alias("vec_a"), F.col("v").alias("va")),
            "vec_a",
        ).join(
            vecs.select(F.col("id").alias("vec_b"), F.col("v").alias("vb")),
            "vec_b",
        ),
        int(threshold * 10000 + 0.5),
    )


# ---------------------------------------------------------------- IVF index


def _sample_vectors(corpus: DataFrame, sample_size: int, seed: int, vec_col: str):
    """A bounded driver-side random sample of the vector column — the
    quantizer-training input shared by the IVF and PQ tiers. A real
    random sample: compute the fraction from the corpus count (with
    1.5x headroom so the Bernoulli sample rarely undershoots), then
    cap at sample_size. sample(1.0).limit(n) only took the first n
    rows in file order, biasing centroids toward early partitions."""
    import numpy as np

    n_corpus = corpus.count()
    fraction = min(1.0, (sample_size * 1.5) / max(n_corpus, 1))
    return np.array(
        [
            r[0]
            for r in corpus.select(vec_col)
            .sample(fraction=fraction, seed=seed)
            .limit(sample_size)
            .collect()
        ],
        dtype=np.float64,
    )


def _pairwise_d2(X, C):
    """Squared distances in the expanded ||x||²+||c||²−2x·c form — one
    BLAS matmul instead of an O(n·k·dim) broadcast tensor. THE shared
    kernel of every quantizer path (training, encode, probe), so
    assignment-at-train and assignment-at-encode cannot drift
    numerically."""
    return (
        (X**2).sum(axis=1)[:, None]
        + (C**2).sum(axis=1)[None, :]
        - 2.0 * X @ C.T
    )


def _l2_normalize(V):
    """Row-wise unit L2 norm; all-zero rows pass through unchanged."""
    import numpy as np

    norms = np.linalg.norm(V, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return V / norms


def _lloyd(sample, k: int, seed: int, iters: int = 8, return_assign=False):
    """Driver-side Lloyd k-means over a numpy sample: random-row init,
    fixed iteration count, empty cells keep their previous centroid.
    With ``return_assign`` the assignment is recomputed against the
    RETURNED centroids (they move after the loop's last assignment).

    The centroid update sorts rows by cell (STABLE, so each cell sees
    its members in the original row order) and means each contiguous
    segment: one O(n log n) argsort replaces the r13 per-cell boolean
    mask scans, whose O(n·k) cost dominated pq_fit at ksub=256 (r14,
    measured ~6x on the fit). Bit-identical to the mask form — the
    same members reach the same ``np.mean`` in the same order."""
    import numpy as np

    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    cents = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = _pairwise_d2(sample, cents).argmin(axis=1)
        order = np.argsort(assign, kind="stable")
        seg = sample[order]
        counts = np.bincount(assign, minlength=k)
        offs = np.concatenate(([0], np.cumsum(counts)))
        for c in range(k):
            if counts[c]:
                cents[c] = seg[offs[c]:offs[c + 1]].mean(axis=0)
    if return_assign:
        return cents, _pairwise_d2(sample, cents).argmin(axis=1)
    return cents


def _train_centroids(
    corpus: DataFrame,
    n_cells: int,
    dim: int,
    sample_size: int,
    seed: int,
    vec_col: str,
):
    """Train a coarse quantizer (k-means, few iterations) on a bounded
    driver-side sample — the standard IVF recipe: the quantizer is tiny
    and trained once; only the sample (~sample_size × dim doubles)
    ever reaches the driver, never the corpus."""
    sample = _sample_vectors(corpus, sample_size, seed, vec_col)
    return _lloyd(sample, n_cells, seed)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    sample_size: int = 2048,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → corpus rows
    bucketed by nearest cell → each query probes its ``n_probe``
    nearest cells → exact cosine only on those cells' members.

    Complements the LSH tier: IVF adapts to the data distribution
    (cells follow density; LSH hyperplanes don't), costs one
    assignment pass over the corpus, and bounds query work to
    n_probe/n_cells of the corpus. Assignment and scoring are
    Arrow-batched numpy; the corpus shuffles once on cell id.
    """
    import numpy as np

    cents = _train_centroids(corpus, n_cells, dim, sample_size, seed, vec_col)
    cents_b = [list(map(float, c)) for c in cents]

    @F.pandas_udf(LongType())
    def nearest_cell(vs: pd.Series) -> pd.Series:
        C = np.array(cents_b, dtype=np.float64)
        M = np.array(vs.tolist(), dtype=np.float64)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype(np.int64))

    probe_schema = "array<bigint>"

    @F.pandas_udf(probe_schema)
    def probe_cells(vs: pd.Series) -> pd.Series:
        C = np.array(cents_b, dtype=np.float64)
        M = np.array(vs.tolist(), dtype=np.float64)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :n_probe]
        return pd.Series([list(map(int, row)) for row in order])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cvec"),
        # coalesce makes the column provably non-null, so the
        # isnotnull(cell) filter the equi-join infers constant-folds
        # away — otherwise that Filter + the Project both reference
        # the UDF and Catalyst plans nearest_cell TWICE over the
        # corpus (the dominant cost of the assignment pass). The
        # sentinel never surfaces: the UDF itself never returns null.
    ).withColumn(
        "cell", F.coalesce(nearest_cell(F.col("cvec")), F.lit(-1))
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qvec"),
        )
        # explode_outer + null drop, NOT plain explode: the inferred
        # size()>0 pre-filter of a plain explode references the UDF
        # column from both Filter and Project, and Catalyst then
        # evaluates the Python UDF twice per query row (probe lists
        # are never empty, so the filter could only ever waste work)
        .withColumn("cell", F.explode_outer(probe_cells(F.col("qvec"))))
        .where(F.col("cell").isNotNull())
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", _cosine_batch(F.col("cvec"), F.col("qvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id",
                F.floor(F.col("score") * 10000).alias("score_e4"),
                F.col("rank").cast("int").alias("rank"))
    )


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroids — the drift/contamination monitor
    of a corpus pipeline (compare a source's centroid across snapshots,
    or distance-to-centroid as an outlier score).

    Float sums are order-dependent, so a naive avg would never match a
    second run (or another engine) bit-for-bit. Each component is
    quantized to exact integer micro-units (round(x*1e6) — float32's
    ~1e-7 relative step makes micro-units lossless for unit-scale
    embeddings), summed as longs (exact, associative, order-free), and
    divided once at the output edge. posexplode → ONE shuffle on
    (group, dim); 64 dims × |groups| output rows.
    """
    ex = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        group_col,
        "dim",
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("q"),
    )
    return (
        ex.groupBy(group_col, "dim")
        .agg(F.sum("q").alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            group_col,
            "dim",
            # centroid in exact e6 micro-units: sq is already e6-scaled,
            # so the mean needs only one integer division — sign-guarded
            # trunc (Spark DIV truncates, DuckDB // floors; the CASE
            # pins both to trunc for negative components)
            F.expr(
                "CAST(CASE WHEN sq < 0 THEN -((-sq) DIV n) "
                "ELSE sq DIV n END AS BIGINT)"
            ).alias("centroid_e6"),
            F.col("n"),
        )
    )


def group_centroids_oracle(
    table: str = "embeddings", group_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    return f"""
        SELECT {group_col}, dim,
               CAST(CASE WHEN SUM(q) < 0 THEN -((-SUM(q)) // COUNT(*))
                    ELSE SUM(q) // COUNT(*) END AS BIGINT) AS centroid_e6,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT {group_col},
                   generate_subscripts({vec_col}, 1) - 1 AS dim,
                   CAST(round(CAST(unnest({vec_col}) AS DOUBLE) * 1e6)
                        AS BIGINT) AS q
            FROM {table}
        )
        GROUP BY 1, 2
    """


# -------------------------------------------------------- distributed kmeans


def kmeans(
    df: DataFrame,
    k: int = 8,
    dim: int = 64,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd's k-means over an embedding column: corpus
    clustering for topic/mixture analysis and density-balanced corpus
    selection (where :func:`_train_centroids` trains IVF's tiny
    quantizer on a driver SAMPLE, this clusters the FULL corpus and
    only ever moves k×dim doubles to the driver).

    Per iteration: broadcast centroids into ONE Arrow pass that fuses
    the nearest-cell assignment WITH the per-cell partial sums
    (``mapInPandas`` emitting ≤ k rows of (cell, n, component sums)
    per partition) — r15, guide §§2.3/4.2: the r14 shape ran a
    separate wide 64-column aggregation stage (its own shuffle +
    codegen) per iteration whose input was every vector row; fusing
    the partial reduction into the assignment pass leaves only
    partitions×k partial rows behind the Arrow boundary. The partials
    then combine on the driver (partition-ordered, deterministic)
    when ``partitions × k`` is small, or through one tiny
    ``groupBy("cell")`` agg first when it is not (the 100 TB branch:
    a million-task corpus must not collect a million partial rows —
    guide §5). Iteration stops at ``max_iter`` or when no centroid
    moves more than ``tol`` (L∞). Initialization is
    farthest-first traversal (the deterministic k-means++ variant) over
    a bounded hash-ordered sample — reproducible across runs, layouts,
    and cluster sizes, unlike ``rand()``, and it can't seed two
    centroids inside one tight blob the way raw hash-order pick-k can
    (observed: split/merged blobs under pick-k init).

    Returns ``(assignments, centroids)``: (id, cluster, dist_e6) and
    the final k×dim python list. Empty cells keep their previous
    centroid (standard Lloyd's degradation, documented).
    """
    import numpy as np

    vecs = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).persist()
    try:
        n_sample = max(8 * k, 256)
        init_rows = (
            vecs.select("v", F.xxhash64(F.col("id"), F.lit(seed)).alias("h"))
            .orderBy("h")
            .limit(n_sample)
            .collect()
        )
        if len(init_rows) < k:
            raise ValueError(f"corpus has fewer than k={k} rows")
        S = np.array([r.v for r in init_rows], dtype=np.float64)
        # farthest-first traversal on the sample: start from the
        # hash-minimal row, then greedily add the sample point farthest
        # from everything chosen so far
        chosen = [0]
        mind = ((S - S[0]) ** 2).sum(axis=1)
        for _ in range(1, k):
            nxt = int(mind.argmax())
            chosen.append(nxt)
            mind = np.minimum(mind, ((S - S[nxt]) ** 2).sum(axis=1))
        cents = S[chosen].copy()

        part_schema = "cell long, n long, " + ", ".join(
            f"s{i} double" for i in range(dim)
        )
        # collect partials directly only while partitions×k stays a
        # bounded driver payload; a 100 TB corpus (≥10⁵ tasks) reduces
        # them through one tiny cell-keyed agg first (guide §5: the
        # driver does no data work)
        small_partials = (
            vecs.rdd.getNumPartitions() * k <= 32_768
        )

        def _partial_pass(cents_b):
            def run(batches):
                C = np.array(cents_b, dtype=np.float64)
                n = np.zeros(len(C), dtype=np.int64)
                s = np.zeros((len(C), C.shape[1]), dtype=np.float64)
                for pdf in batches:
                    M = np.array(pdf["v"].tolist(), dtype=np.float64)
                    if not len(M):
                        continue
                    d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    a = d2.argmin(axis=1)
                    order = np.argsort(a, kind="stable")
                    seg = M[order]
                    counts = np.bincount(a, minlength=len(C))
                    offs = np.concatenate(([0], np.cumsum(counts)))
                    for c in np.flatnonzero(counts):
                        n[c] += counts[c]
                        s[c] += seg[offs[c]:offs[c + 1]].sum(axis=0)
                nz = np.flatnonzero(n)
                if nz.size:
                    yield pd.DataFrame(
                        {
                            "cell": nz.astype(np.int64),
                            "n": n[nz],
                            **{
                                f"s{i}": s[nz, i]
                                for i in range(C.shape[1])
                            },
                        }
                    )

            return run

        for _ in range(max_iter):
            cents_b = [list(map(float, c)) for c in cents]
            partials = vecs.select("v").mapInPandas(
                _partial_pass(cents_b), part_schema
            )
            if not small_partials:
                partials = partials.groupBy("cell").agg(
                    F.sum("n").alias("n"),
                    *[F.sum(f"s{i}").alias(f"s{i}") for i in range(dim)],
                )
            rows = partials.collect()
            n_tot = np.zeros(k, dtype=np.int64)
            s_tot = np.zeros((k, dim), dtype=np.float64)
            # collect returns partition-ordered rows: the driver-side
            # combine is deterministic for a fixed input layout (the
            # r14 shape was layout-dependent the same way — partial
            # aggregation order followed partitioning)
            for r in rows:
                c = r[0]
                n_tot[c] += r[1]
                s_tot[c] += np.array(r[2:], dtype=np.float64)
            new = cents.copy()
            for c in np.flatnonzero(n_tot):
                new[c] = s_tot[c] / n_tot[c]
            shift = float(np.abs(new - cents).max())
            cents = new
            if shift <= tol:
                break

        out = assign_cells(vecs, cents, id_col="id", vec_col="v").select(
            F.col("id").alias(id_col), "cluster", "dist_e6"
        )
        # materialize BEFORE unpersist so the cached iterate feeds the
        # final assignment instead of re-reading the source
        out = out.localCheckpoint(eager=True)
        return out, [list(map(float, c)) for c in cents]
    finally:
        vecs.unpersist()


def _cell_assigner(centroids):
    """Arrow-batched nearest-centroid UDF over FIXED centroids: emits
    ``struct<cluster, dist_e6>`` per vector (floor-e6 euclidean
    distance to the winner). The k×dim list travels in the closure."""
    cents_b = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("struct<cluster: bigint, dist_e6: bigint>")
    def assign(vs: pd.Series) -> pd.DataFrame:
        import numpy as np

        C = np.array(cents_b, dtype=np.float64)
        M = np.array(vs.tolist(), dtype=np.float64)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        dist = np.sqrt(d2[np.arange(len(M)), cell])
        return pd.DataFrame(
            {
                "cluster": cell.astype(np.int64),
                "dist_e6": np.floor(dist * 1e6).astype(np.int64),
            }
        )

    return assign


def assign_cells(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, cluster, dist_e6)`` for every row under FIXED centroids —
    the assignment half of :func:`kmeans`, public so incremental
    ingest (:func:`semdedup_probe`) can place new vectors into an
    existing clustering without moving it. One shuffle-free
    Arrow-batched pass (:func:`_cell_assigner`). ``dist_e6`` is the
    floor-e6 euclidean distance to the winning centroid (the score
    :func:`semdedup`'s keep policy uses).
    """
    if id_col in ("cluster", "dist_e6"):
        raise ValueError(
            f"id_col {id_col!r} collides with an output column name"
        )
    return (
        df.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
        )
        .withColumn("__a", _cell_assigner(centroids)(F.col("__v")))
        .select(
            id_col,
            F.col("__a.cluster").alias("cluster"),
            F.col("__a.dist_e6").alias("dist_e6"),
        )
    )


def _bound_cell_sizes(
    with_cell: DataFrame,
    max_cell_size: int,
    dim: int,
    seed: int,
    id_col: str,
    vec_col: str,
    cell_col: str = "cluster",
    max_depth: int = 4,
) -> tuple[DataFrame, list[DataFrame]]:
    """SemDeDup's oversized-cell mitigation (Abbas et al. 2023 §2:
    re-cluster giant clusters): any cell with more than
    ``max_cell_size`` members is recursively split by k-means over
    the oversized cells' members, relabelling to composite
    ``orig/sub`` cells, until no cell exceeds the bound or
    ``max_depth`` is reached. One sub-clustering pass per depth level
    covers ALL oversized cells at once (the composite key keeps
    original cells separate), so the cost is a few extra k-means
    passes over only the oversized fraction — not one run per cell.

    Why it matters at 100 TB: the pairing cost is Σ cellᵢ², so one
    mega-cell (common on near-duplicate-heavy web corpora) makes a
    single cell's quadratic term dominate the whole job; bounding
    cell size bounds the worst term at max_cell_size².

    Residual risk, documented: a cell of IDENTICAL vectors cannot be
    split (every member is equidistant to every centroid) — after
    ``max_depth`` levels the cell is accepted as-is. Identical
    vectors are true duplicates; run the exact-dedup tier first if
    that shape dominates.

    Returns ``(frame, pinned)``: ``pinned`` holds the persisted
    level(s) still backing ``frame`` (empty when no split happened) —
    the CALLER unpersists them once the frame is consumed. ADVICE r9:
    the previous implementation ``localCheckpoint``-ed every depth
    level and those blocks are not releasable through
    ``DataFrame.unpersist`` (verified), so repeated guarded calls in
    a long-lived session accreted pinned executor storage; levels now
    ``persist()``, each released as soon as the NEXT level's sizes
    pass has materialized it out of the lineage, and the no-oversized
    common case pins nothing at all.
    """
    cur = with_cell.withColumn(cell_col, F.col(cell_col).cast("string"))
    # at most the levels still live: [previous, current]; the sizes
    # collect of each iteration materializes `cur`, after which the
    # previous level's blocks are dead and are released immediately
    pinned: list[DataFrame] = []
    prev_over: list | None = None
    for _ in range(int(max_depth)):
        sizes = cur.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n"))
        over_rows = sizes.where(
            F.col("n") > F.lit(int(max_cell_size))
        ).collect()
        if len(pinned) == 2:
            # the collect above materialized pinned[1] (== cur);
            # pinned[0] is no longer referenced by anything live
            pinned.pop(0).unpersist()
        if not over_rows:
            break
        cur_over = sorted((r[cell_col], r["n"]) for r in over_rows)
        if cur_over == prev_over:
            # fixed point: the previous level split NOTHING (identical
            # vectors, or each oversized cell captured exactly one
            # sub-centroid) — re-running the same deterministic
            # k-means would burn max_depth identical passes for the
            # same non-split
            break
        prev_over = cur_over
        # about to split: this level is consumed many times (the
        # big/rest scans and every k-means iteration) — pin it
        if not pinned:
            cur = cur.persist()
            pinned.append(cur)
        over = [r[cell_col] for r in over_rows]
        n_over = sum(r["n"] for r in over_rows)
        k2 = max(2, min(-(-n_over // max(int(max_cell_size) // 2, 1)), 256))
        big = cur.where(F.col(cell_col).isin(over))
        rest = cur.where(~F.col(cell_col).isin(over))
        sub, _ = kmeans(
            big, k=k2, dim=dim, max_iter=4, seed=seed + 13,
            id_col=id_col, vec_col=vec_col,
        )
        big = (
            big.join(
                sub.select(id_col, F.col("cluster").alias("__sub")), id_col
            )
            .withColumn(
                cell_col, F.concat_ws("/", F.col(cell_col), F.col("__sub"))
            )
            .drop("__sub")
        )
        cur = rest.unionByName(big).persist()
        pinned.append(cur)
    return cur, pinned


def semdedup(
    emb: DataFrame,
    threshold: float = 0.95,
    k: int = 16,
    dim: int = 64,
    keep: str = "farthest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    rows_per_block: int = 4096,
    seed: int = 7,
    max_cell_size: int | None = None,
    centroids=None,
) -> DataFrame:
    """Semantic deduplication over an embedding column — the SemDeDup
    recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the corpus
    with :func:`kmeans`, find cosine-near pairs WITHIN each cluster
    only, connect them into duplicate groups, and keep one member per
    group. Returns the surviving rows of ``emb`` unchanged.

    ``keep='farthest'`` (the paper's policy) survives the member
    farthest from its cluster centroid — the most atypical copy, which
    preserves diversity; ``keep='min_id'`` survives the smallest id.
    Both tie-break deterministically on id.

    Scale shape: the quadratic pairing is confined to k-means cells
    (cost Σ cellᵢ², the paper's point — k controls the quadratic
    term; ``max_cell_size`` bounds the worst term by recursively
    splitting oversized cells, :func:`_bound_cell_sizes` — set it on
    near-duplicate-heavy corpora where one mega-cell would otherwise
    dominate), executed as per-cell blocked matmuls
    (:func:`embedding_neardup_blocked` with ``group_col``, each block
    ≤ ``rows_per_block`` vectors). Vectors move through the
    assignment join and the (cell, block) groupBy exchange; per-cell
    sizes come from the (checkpointed, narrow) assignment frame, so
    no extra counting pass touches the vectors. Components and the
    keep policy run over the (tiny) verified pair list, and the final
    result only semi/anti-joins survivor/loser ids against ``emb``.

    Capability analog in the reference: none (extension tier for LLM
    training-data pipelines; nearest hook is the trigram similarity
    index, `database-schema.sql:5,64` — lexical, not semantic).
    """
    return _semdedup_parts(
        emb, threshold=threshold, k=k, dim=dim, keep=keep,
        id_col=id_col, vec_col=vec_col, max_iter=max_iter,
        rows_per_block=rows_per_block, seed=seed,
        max_cell_size=max_cell_size, centroids=centroids,
    )[0]


def _semdedup_parts(
    emb: DataFrame,
    threshold: float = 0.95,
    k: int = 16,
    dim: int = 64,
    keep: str = "farthest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    rows_per_block: int = 4096,
    seed: int = 7,
    max_cell_size: int | None = None,
    centroids=None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`semdedup`'s decomposition — ``(kept, comps)`` where
    ``comps`` is the ``(id_col, cluster_id, cluster_size)`` component
    frame over the verified in-cell pair list (docs in no pair are
    absent; already materialized by ``dedup_clusters``, so it stays
    valid after the internal caches release). The training-set
    extension tier consumes ``comps`` to spread a universe contact
    through its within-batch semantic component
    (``corpus._batch_recipe``) without re-assigning or re-pairing the
    batch — the ``dedup._dedup_corpus_parts`` shape, applied to the
    semantic tier (r11)."""
    from .dedup import dedup_clusters, keep_best_per_cluster

    if keep not in ("farthest", "min_id"):
        raise ValueError(f"keep must be 'farthest' or 'min_id', got {keep!r}")

    if centroids is not None:
        # FIXED clustering (the recipe/extension shape — the training
        # set records its centroids so extensions and fresh rebuilds
        # dedup under the identical cell structure): one Arrow
        # assignment pass, no k-means training; k/dim/max_iter/seed
        # are ignored
        assign = assign_cells(
            emb, centroids, id_col=id_col, vec_col=vec_col
        )
    else:
        assign, _ = kmeans(
            emb, k=k, dim=dim, max_iter=max_iter, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    with_cell = emb.select(id_col, vec_col).join(
        assign.select(id_col, "cluster"), id_col
    )
    pinned: list[DataFrame] = []
    if max_cell_size is not None:
        # Σ cell² guard: recursively split oversized cells (the
        # paper's own mitigation) so no single cell's quadratic term
        # dominates; pairs then form within the SUB-cells. Exact and
        # near-exact duplicate groups survive splitting unchanged —
        # identical vectors always land in the same sub-cell — which
        # is what the threshold regime (≥0.95 cosine) targets.
        with_cell, pinned = _bound_cell_sizes(
            with_cell, max_cell_size, dim, seed, id_col, vec_col
        )
        # composite labels exist only on with_cell now; the count is
        # a column-pruned pass over (id, cell)
        cell_sizes = with_cell.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n")
        )
    else:
        cell_sizes = assign.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n")
        )
    try:
        pairs = embedding_neardup_blocked(
            with_cell, threshold=threshold, rows_per_block=rows_per_block,
            id_col=id_col, vec_col=vec_col, group_col="cluster",
            group_sizes=cell_sizes,
        )
        comps = dedup_clusters(
            pairs, id_a="vec_a", id_b="vec_b", id_col=id_col
        )
    finally:
        # dedup_clusters consumes the pair list eagerly (edge count +
        # components), the last consumer of the bounded cell frame —
        # release its persisted levels so repeated guarded calls in a
        # long-lived session pin no storage (ADVICE r9); the finally
        # keeps a mid-pairing failure from re-introducing the leak
        for p in pinned:
            p.unpersist()
    if keep == "min_id":
        losers = comps.where(F.col(id_col) != F.col("cluster_id")).select(
            id_col
        )
        return emb.join(losers, id_col, "left_anti"), comps
    # 'farthest': every component's members share one k-means cell, so
    # their centroid distances are directly comparable
    surviving = keep_best_per_cluster(
        assign.select(id_col, "dist_e6"), comps, "dist_e6",
        id_col=id_col, higher_is_better=True,
    )
    return emb.join(surviving.select(id_col), id_col, "left_semi"), comps


def semdedup_probe(
    batch: DataFrame,
    corpus: DataFrame,
    centroids,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    rows_per_block: int = 4096,
    cell_col: str | None = None,
) -> DataFrame:
    """Incremental semantic dedup: cosine-near pairs a NEW batch forms
    against an already-clustered corpus and within itself — the
    daily-ingest shape of :func:`semdedup`, mirroring what
    :func:`minhash_lsh_probe` is to ``minhash_lsh_pairs``. Returns
    ``(vec_a, vec_b, cosine_e4)`` pairs where at least one side is a
    batch vector. Id overlap between batch and corpus (a REPLAYED
    ingest batch) is tolerated: self-pairs are dropped, but a pair
    both sides of which exist in batch AND corpus is emitted by both
    the batch×corpus and batch×batch paths — consumers needing set
    semantics under replay should ``distinct()`` (the ingest tier's
    connected components absorb duplicate edges for free).

    ``corpus`` carries its cell assignment in ``cluster_col`` (from
    :func:`kmeans` / :func:`assign_cells` at build time); ``centroids``
    are the matching k×dim list. The batch is assigned to cells with
    one Arrow pass — or, with ``cell_col``, arrives pre-assigned and
    is trusted (the ingest tier assigns once and reuses it here) —
    the corpus is PRUNED to the batch's cells (a collected ≤k-value
    IN-list, so a cell-partitioned corpus prunes at the scan) and
    then probed via a broadcast of the (small) batch — the corpus
    never shuffles and never re-pairs against itself. Batch×batch
    pairs come from the grouped blocked matmul.

    Capability analog in the reference: none (extension tier; see
    :func:`semdedup`).
    """
    thr_e4 = int(threshold * 10000 + 0.5)
    b = batch.select(
        F.col(id_col).alias("qid"),
        _as_double(F.col(vec_col)).alias("qvec"),
        *(
            [F.col(cell_col).alias("cell")]
            if cell_col is not None
            else []
        ),
    )
    if cell_col is None:
        # assignment applied INLINE so the vector column rides along —
        # routing through assign_cells would strip it and force a
        # batch-by-id shuffle join to re-attach it
        b = b.withColumn(
            "cell",
            _cell_assigner(centroids)(F.col("qvec")).getField("cluster"),
        )
    b = b.localCheckpoint(eager=True)  # assign once: consumed by the
    # cell collect, the corpus probe, and the batch-side pairing
    cells = [r["cell"] for r in b.select("cell").distinct().collect()]
    if not cells:
        return b.select(
            F.col("qid").alias("vec_a"),
            F.col("qid").alias("vec_b"),
            F.lit(0).cast("long").alias("cosine_e4"),
        ).where(F.lit(False))
    new_x_corpus = _verified_pairs(
        corpus.select(
            F.col(id_col).alias("vec_a"),
            _as_double(F.col(vec_col)).alias("va"),
            F.col(cluster_col).alias("cell"),
        )
        .where(F.col("cell").isin(cells))
        .join(F.broadcast(b), "cell")
        # a replayed batch's ids already exist in the corpus: drop the
        # vector-paired-with-its-own-copy rows, they are not dups
        .where(F.col("vec_a") != F.col("qid"))
        .select(
            "vec_a", "va",
            F.col("qid").alias("vec_b"),
            F.col("qvec").alias("vb"),
        ),
        thr_e4,
    )
    new_x_new = embedding_neardup_blocked(
        b.select(
            F.col("qid").alias(id_col),
            F.col("qvec").alias(vec_col),
            "cell",
        ),
        threshold=threshold,
        rows_per_block=rows_per_block,
        id_col=id_col,
        vec_col=vec_col,
        group_col="cell",
    )
    return new_x_corpus.unionByName(new_x_new)


def pca_fit(
    df: DataFrame,
    k: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    center: bool = True,
) -> dict:
    """Fit a PCA basis over an embedding column in ONE distributed
    pass: each partition accumulates its Gram-matrix partials
    (count, component sums, XᵀX) in an Arrow-batched numpy loop and
    emits a single row; the driver combines the partials and solves
    the d×d eigenproblem. Training-pipeline uses: dimensionality
    reduction before ANN / clustering, whitening, and embedding-drift
    monitoring via the explained-variance profile.

    Scale story: the corpus is scanned once and never shuffled — the
    only shuffle-free "collect" moves ``partitions × (dim² + dim + 1)``
    doubles (at 10k partitions and dim=1024 that's ~84 GB... so for
    dim ≳ 512 raise ``spark.sql.execution.arrow.maxRecordsPerBatch``
    and coalesce first; at the common dim ≤ 256 it's ≤ 5 GB — and the
    driver eigensolve is O(dim³), milliseconds at dim ≤ 1024). No
    iteration, no per-row driver traffic.

    Returns a plain JSON-serializable model dict:
    ``{"mean", "components" (k×dim rows, orthonormal, eigenvalue-
    descending), "explained_variance", "explained_variance_ratio",
    "n"}``. Component signs are canonicalized (largest-magnitude
    coordinate positive) so refits are comparable across runs and
    layouts.
    """
    return pca_fit_from_partials(
        gram_partials(df, dim=dim, vec_col=vec_col), k=k, dim=dim, center=center
    )


def gram_partials(
    df: DataFrame, dim: int = 64, vec_col: str = "embedding"
) -> DataFrame:
    """Per-partition Gram-matrix partials of an embedding column:
    one row ``(n, s array<dim>, g array<dim²>)`` per non-empty
    partition, accumulated in an Arrow-batched numpy loop. The partials
    are a MERGEABLE SKETCH of the second-moment structure — addition
    combines them — which is what makes PCA maintainable incrementally
    (see ``streaming.incremental.stream_gram_rollup``) and fittable
    from a persisted store without re-scanning vectors."""
    import numpy as np

    src = df.select(_as_double(F.col(vec_col)).alias("v"))

    def acc(batches):
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        g = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            M = np.array(pdf["v"].tolist(), dtype=np.float64)
            if M.size == 0:
                continue
            if M.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {M.shape[1]} != declared dim {dim}"
                )
            n += M.shape[0]
            s += M.sum(axis=0)
            g += M.T @ M
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return src.mapInPandas(acc, "n long, s array<double>, g array<double>")


def pca_fit_from_partials(
    parts_df: DataFrame,
    k: int = 8,
    dim: int = 64,
    center: bool = True,
) -> dict:
    """Solve the PCA eigenproblem from Gram partials (fresh from
    :func:`gram_partials` or read back from a partial store): sum the
    bounded partial rows on the driver, form the covariance, eigh.
    Collect moves ``rows × (dim² + dim + 1)`` doubles — compact a
    long-lived store periodically (partials merge by addition) to keep
    the row count at O(partitions)."""
    import numpy as np

    if k > dim:
        raise ValueError(f"k={k} exceeds dim={dim}")
    parts = parts_df.select("n", "s", "g").collect()
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r.n for r in parts)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    s = np.sum([np.array(r.s) for r in parts], axis=0)
    G = np.sum([np.array(r.g).reshape(dim, dim) for r in parts], axis=0)

    mean = s / n
    if center:
        cov = G / n - np.outer(mean, mean)
    else:
        cov = G / n
    # symmetrize away float drift so eigh sees an exactly-Hermitian input
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x dim
    var = np.maximum(evals[order], 0.0)
    # canonical sign: make each component's largest-|coordinate| positive
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = max(float(np.maximum(evals, 0.0).sum()), 1e-300)
    return {
        "mean": [float(x) for x in (mean if center else np.zeros(dim))],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance": [float(x) for x in var],
        "explained_variance_ratio": [float(x) / total_var for x in var],
        "n": int(n),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project an embedding column onto a fitted :func:`pca_fit` basis:
    one Arrow-batched BLAS matmul per batch, centering by the model
    mean; ``whiten=True`` additionally scales each output coordinate to
    unit variance (1/√λ — the usual prep before cosine ANN or k-means
    on reduced vectors). Narrow, shuffle-free, model broadcast by
    closure capture (k×dim doubles)."""
    import numpy as np

    mean_b = list(model["mean"])
    comps_b = [list(r) for r in model["components"]]
    if whiten:
        scale_b = [1.0 / (v**0.5 if v > 1e-12 else 1.0)
                   for v in model["explained_variance"]]
    else:
        scale_b = [1.0] * len(comps_b)

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        C = np.array(comps_b, dtype=np.float64)
        mu = np.array(mean_b, dtype=np.float64)
        sc = np.array(scale_b, dtype=np.float64)
        M = np.array(vs.tolist(), dtype=np.float64)
        P = ((M - mu) @ C.T) * sc
        return pd.Series(list(P))

    return df.select(
        F.col(id_col),
        project(_as_double(F.col(vec_col))).alias(out_col),
    )


# ---------------------------------------------------------- quantization


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization:
    ``q[i] = round(v[i] / scale)`` with ``scale = max|v| / 127``
    (all-zero vectors get scale 1.0 and stay all-zero). Adds ``q_col``
    (array<tinyint>) and ``scale_col`` (double); every input column
    passes through, so the caller can write the quantized corpus next
    to the float one and let parquet column pruning pick per reader.

    The 100 TB story: the ANN scan over ``q_col`` reads 1/4 the bytes
    of the float column and ranks by integer arithmetic; per-vector
    max-abs scaling cancels in cosine, so quantized cosine needs no
    dequantization at all (:func:`quantized_topk`). The scale column
    exists for consumers that need approximate dot products or
    reconstruction (error ≤ scale/2 per element).

    All codegen: the scale is bound as a column BEFORE the transform
    lambda references it — a lambda body re-evaluates captured outer
    expressions per element (the ``chunking.py`` lesson), so embedding
    the array_max tree in the lambda would be quadratic in dim.
    """
    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    out = df.withColumn(
        scale_col,
        F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0)),
    )
    s = F.col(scale_col)
    return out.withColumn(
        q_col,
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.round(x / s).cast("tinyint"),
        ),
    )


def _int_cosine(a: Column, b: Column) -> Column:
    """Cosine over two int8 arrays, accumulating in BIGINT (127² × dim
    stays far below 2^63; tinyint×tinyint would overflow under ANSI)."""
    def _acc(x: Column, y: Column) -> Column:
        return x.cast("bigint") * y.cast("bigint")

    d = F.aggregate(
        F.zip_with(a, b, _acc), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    na = F.aggregate(
        F.zip_with(a, a, _acc), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nb = F.aggregate(
        F.zip_with(b, b, _acc), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return d.cast("double") / F.sqrt(na.cast("double") * nb.cast("double"))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    q_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors, with exact float
    re-ranking of the top ``k × rerank_factor`` candidates.

    Scan tier: if ``corpus`` lacks ``q_col`` it is quantized inline,
    but the intended deployment quantizes ONCE
    (:func:`quantize_embeddings`, written to parquet) so the scan
    reads only the int8 column — 4× less IO than the float scan, and
    per-vector max-abs scaling cancels in cosine so ranking needs no
    scales. Queries broadcast (ANN-batch shape); the corpus never
    shuffles.

    Re-rank tier (``rerank_factor > 1``): the per-query top
    ``k × rerank_factor`` by quantized score — a frame of
    |queries| × k × factor id pairs — joins back to the float vectors
    and the final top-k is ranked by EXACT cosine, so returned scores
    are identical to :func:`brute_force_topk` for every returned pair;
    only candidate membership is approximate. ``rerank_factor=1``
    skips the join and returns quantized scores (cheapest, lowest
    recall). Output matches ``brute_force_topk``:
    (query_id, neighbor_id, score_e4, rank).
    """
    if q_col not in corpus.columns:
        corpus = quantize_embeddings(corpus, vec_col, q_col, scale_col)
    qq = quantize_embeddings(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
        ),
        "__qv",
        "q_q",
        "__qs",
    ).select("query_id", "q_q")

    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), q_col)
        .crossJoin(F.broadcast(qq))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qscore", _int_cosine(F.col(q_col), F.col("q_q")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("neighbor_id").asc()
    )
    cand_k = k * max(int(rerank_factor), 1)
    cand = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(cand_k))
    )
    if rerank_factor <= 1:
        return cand.select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("qscore") * 10000).alias("score_e4"),
            F.col("rank").cast("int").alias("rank"),
        )

    return _exact_rerank(
        cand.select("query_id", "neighbor_id"), corpus, queries, k,
        id_col, vec_col, query_id_col,
    )


def _exact_rerank(
    cand_ids: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact-cosine re-rank of an approximate tier's candidate pairs —
    the shared tail of :func:`quantized_topk` and :func:`pq_topk`.
    The candidate list is tiny (|queries|·k·factor), so IT broadcasts
    into a semi-filtered scan of the float column — the corpus side
    stays a narrow (id, vec) projection — and returned scores are
    identical to :func:`brute_force_topk` for every returned pair;
    only candidate membership is approximate.

    ``broadcast_candidates=False`` is for tiers whose candidate set is
    a corpus FRACTION rather than |queries|·k·factor rows
    (:func:`imi_topk` — candidate generation with no pre-rank score
    to cut on): the candidates then shuffle-join the narrow float
    projection on id instead of collecting to the driver, which would
    OOM/overflow the broadcast limit at billion-row scale."""
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cvec"),
    )
    qvec = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    joined = (
        cvec.join(F.broadcast(cand_ids), "neighbor_id")
        if broadcast_candidates
        else cand_ids.join(cvec, "neighbor_id")
    )
    rr = (
        joined
        .join(F.broadcast(qvec), "query_id")
        .withColumn("score", cosine(F.col("cvec"), F.col("qvec")))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        rr.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= F.lit(k))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(F.col("score") * 10000).alias("score_e4"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ------------------------------------------------------------ IVF-PQ tier


def pq_fit(
    corpus: DataFrame,
    n_cells: int = 64,
    m_sub: int = 8,
    ksub: int = 256,
    sample_size: int = 4096,
    seed: int = 7,
    vec_col: str = "embedding",
    opq_iters: int = 0,
) -> dict:
    """Train an IVF-PQ model (product quantization with residual
    encoding, Jégou et al. 2011) for cosine top-k: a coarse k-means
    quantizer of ``n_cells`` centroids plus, per subspace ``m`` of
    ``m_sub`` equal dim-slices, a ``ksub``-entry codebook trained on
    the COARSE RESIDUALS ``v/|v| − centroid(v)`` of a bounded driver
    sample. Vectors are L2-normalized first, so inner product over
    reconstructions approximates cosine directly.

    ``opq_iters > 0`` additionally learns an ORTHOGONAL rotation
    (OPQ, Ge et al. 2013, the non-parametric alternation): rotate →
    train quantizers → re-solve the rotation as the orthogonal
    Procrustes problem against the reconstructions (SVD of XᵀX̂) →
    repeat. Rotation preserves inner products, so the scored metric is
    unchanged; what changes is the SUBSPACE DECOMPOSITION — on
    anisotropic corpora (correlated dims, unbalanced variance — the
    shape real embedding models emit) contiguous dim-slices waste
    codebook bits on low-energy subspaces, and the learned rotation
    re-balances energy across them, cutting ADC distortion and lifting
    recall at the same byte budget. On exactly-isotropic data a
    rotation is a no-op BY SYMMETRY (an isotropic distribution is
    rotation-invariant), so it cannot lift the measured cell-membership
    recall ceiling there (SCALE.md §15) — flat ADC remains the
    isotropic-corpus tier. The rotation rides in the model
    (``rotation``), is applied inside :func:`pq_index` and
    :func:`pq_topk`'s query path, and changes the model fingerprint —
    an index encoded without it is refused, never silently mis-scored.

    All training is driver-side on ≤``sample_size`` vectors — the
    standard recipe: quantizers are tiny and trained once; the corpus
    itself is only touched by :func:`pq_index`. Reference analog: the
    unused trigram GIN index of `database-schema.sql:5,64` — an index
    built once, probed per query — re-aimed at embedding similarity.
    """
    import numpy as np

    sample = _sample_vectors(corpus, sample_size, seed, vec_col)
    if sample.size == 0:
        raise ValueError("pq_fit needs a non-empty corpus")
    dim = sample.shape[1]
    if dim % m_sub != 0:
        raise ValueError(
            f"m_sub={m_sub} must divide the embedding dim {dim}"
        )
    if not 1 <= int(ksub) <= 32767:
        # codes are ArrayType(ShortType): a ksub above int16's max
        # would wrap argmin indices negative and corrupt the index
        # SILENTLY (negative codes write fine and score garbage)
        raise ValueError(
            f"ksub={ksub} out of range: codes are int16, so "
            "1 <= ksub <= 32767 (256 is the standard PQ choice)"
        )
    dsub = dim // m_sub
    sn = _l2_normalize(sample)

    def _train(X):
        co, asg = _lloyd(X, n_cells, seed, return_assign=True)
        res = X - co[asg]
        cbs = [
            _lloyd(res[:, m * dsub : (m + 1) * dsub], ksub, seed + 1 + m)
            for m in range(m_sub)
        ]
        return co, asg, cbs

    rotation = None
    if int(opq_iters) > 0:
        R = np.eye(dim)
        for _ in range(int(opq_iters)):
            Y = sn @ R
            co, asg, cbs = _train(Y)
            # reconstruct each training vector from its codes, then
            # re-solve R = argmin ‖XR − X̂‖² over orthogonal R: the
            # Procrustes solution UVᵀ from the SVD of XᵀX̂
            recon = co[asg].copy()
            for m in range(m_sub):
                Rm = Y[:, m * dsub : (m + 1) * dsub] - co[asg][
                    :, m * dsub : (m + 1) * dsub
                ]
                codes_m = _pairwise_d2(Rm, cbs[m]).argmin(axis=1)
                recon[:, m * dsub : (m + 1) * dsub] += cbs[m][codes_m]
            U, _s, Vt = np.linalg.svd(sn.T @ recon)
            R = U @ Vt
        rotation = R
        sn = sn @ R  # final quantizers train in the final rotated space

    coarse, assign, codebooks = _train(sn)
    coarse_l = [[float(x) for x in c] for c in coarse]
    codebooks_l = [
        [[float(x) for x in e] for e in cb] for cb in codebooks
    ]
    rotation_l = (
        None if rotation is None
        else [[float(x) for x in r] for r in rotation]
    )
    model = {
        "format": "spark-graft-ivfpq/v1",
        "metric": "cosine",
        "dim": int(dim),
        "m_sub": int(m_sub),
        "dsub": int(dsub),
        "n_cells": int(len(coarse)),
        "ksub": int(len(codebooks[0])),
        # fingerprint of the trained quantizers (rotation included
        # when learned — rotated and unrotated models must never
        # accept each other's indexes): pq_index stamps it into the
        # codes column metadata (survives parquet) and pq_topk refuses
        # an index encoded under a DIFFERENT model — a stale index
        # would otherwise score garbage silently, since codes/cells
        # stay in-range for any same-shape model
        "model_id": _pq_model_id(coarse_l, codebooks_l, rotation_l),
        "coarse": coarse_l,
        "codebooks": codebooks_l,
    }
    if rotation_l is not None:
        model["rotation"] = rotation_l
    return model


def _pq_model_id(coarse: list, codebooks: list, rotation: list | None = None) -> str:
    import hashlib
    import json as _json

    # rotation-less models hash exactly as before (backward-readable
    # ids: every pre-OPQ index stays valid under its original model)
    payload = (
        [coarse, codebooks] if rotation is None
        else [coarse, codebooks, rotation]
    )
    return hashlib.sha256(
        _json.dumps(payload).encode()
    ).hexdigest()[:16]


def _check_pq_model(model: dict) -> None:
    if model.get("format") != "spark-graft-ivfpq/v1":
        raise ValueError(
            "not a pq_fit model (format="
            f"{model.get('format')!r}; want spark-graft-ivfpq/v1)"
        )
    if int(model["m_sub"]) * int(model["dsub"]) != int(model["dim"]):
        raise ValueError("corrupt pq model: m_sub*dsub != dim")
    if not 1 <= int(model["ksub"]) <= 32767:
        raise ValueError(
            f"corrupt pq model: ksub={model['ksub']} exceeds the "
            "int16 code range (1..32767)"
        )


def pq_index(
    corpus: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode the corpus against a :func:`pq_fit` model: one Arrow
    pass, no shuffle, returning ``(id, cell int, codes array<smallint>
    of length m_sub)``. At dim=64/m_sub=8 the code row is ~20 bytes
    against 256 bytes of float32 — the scan tier of :func:`pq_topk`
    reads ~8% of the corpus bytes even when it scans every row.
    Written to parquet once, the index amortizes over every query
    batch (the deployment shape; inline encoding is for tests).

    mapInPandas, not a scalar pandas_udf returning a struct: a struct
    result referenced per-field would let Catalyst plan the Python
    eval once per field — here one eval per batch is guaranteed.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, IntegerType, ShortType, StructField, StructType,
    )

    _check_pq_model(model)
    co_b = model["coarse"]
    cb_b = model["codebooks"]
    rot_b = model.get("rotation")
    in_schema = corpus.select(id_col, vec_col).schema
    out_schema = StructType([
        in_schema[0],
        StructField("cell", IntegerType()),
        StructField("codes", ArrayType(ShortType())),
    ])

    def encode(batches):
        CO = np.asarray(co_b, dtype=np.float64)
        CB = np.asarray(cb_b, dtype=np.float64)
        ROT = None if rot_b is None else np.asarray(rot_b, dtype=np.float64)
        M, K, dsub = CB.shape
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = _l2_normalize(V)
            if ROT is not None:
                Vn = Vn @ ROT  # OPQ: quantizers live in rotated space
            assign = _pairwise_d2(Vn, CO).argmin(axis=1)
            resid = Vn - CO[assign]
            codes = np.empty((len(Vn), M), dtype=np.int16)
            for m in range(M):
                Rm = resid[:, m * dsub : (m + 1) * dsub]
                codes[:, m] = (
                    _pairwise_d2(Rm, CB[m]).argmin(axis=1).astype(np.int16)
                )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cell": assign.astype(np.int32),
                "codes": [row.tolist() for row in codes],
            })

    out = corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)
    # stamp the model fingerprint into column metadata (survives a
    # parquet round trip) so pq_topk can refuse a stale index
    return out.withColumn(
        "codes",
        F.col("codes").alias(
            "codes", metadata={"pq_model_id": model.get("model_id", "")}
        ),
    )


def pq_topk(
    index: DataFrame,
    queries: DataFrame,
    model: dict,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int | None = None,
    rerank_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Cosine top-k over a :func:`pq_index`: asymmetric distance
    computation (ADC) ranks candidates from code lookups alone —
    ``score ≈ q·centroid(cell) + Σ_m LUT_m[code_m]`` with per-query
    LUTs built once per Arrow batch — then the top ``k×rerank_factor``
    per query re-rank by EXACT float cosine (:func:`_exact_rerank`),
    so returned scores match :func:`brute_force_topk` per pair.

    Two scan modes, picked by the data's geometry:

    - ``n_probe=None`` (flat ADC): every index row is scored, but the
      scan reads only the ~8%-of-float-bytes code column — the
      memory-bandwidth formulation of PQ. This is the mode that holds
      recall on ISOTROPIC corpora, where no cell pruning can (cell
      membership caps recall@10 at ~0.55 for 10% of rows scanned on
      the synthetic testdata — measured, tools/scalecheck.py).
    - ``n_probe=p`` (IVF mode): each query scores only its ``p``
      nearest cells' members — rows scanned ≈ p/n_cells. The mode for
      real (clustered) embedding corpora; measured ≥0.95 recall@10 at
      ~10% of rows on a clustered variant of the testdata.

    Queries broadcast; the index never shuffles in either mode.
    """
    import numpy as np

    _check_pq_model(model)
    # refuse an index encoded under a DIFFERENT model: codes/cells
    # stay in-range for any same-shape model, so a stale index would
    # otherwise score garbage silently (fingerprint stamped by
    # pq_index; hand-built indexes without one are let through)
    mid = model.get("model_id")
    if mid and "codes" in index.columns:
        stamped = (index.schema["codes"].metadata or {}).get("pq_model_id")
        if stamped and stamped != mid:
            raise ValueError(
                "index was encoded with a different pq model "
                f"(index {stamped}, model {mid}) — re-run pq_index "
                "or pass the matching model"
            )
    co_b = model["coarse"]
    cb_b = model["codebooks"]
    rot_b = model.get("rotation")
    m_sub = int(model["m_sub"])
    dsub = int(model["dsub"])

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    if n_probe is not None:
        @F.pandas_udf("array<int>")
        def probe_cells(vs: pd.Series) -> pd.Series:
            CO = np.asarray(co_b, dtype=np.float64)
            M = _l2_normalize(np.array(vs.tolist(), dtype=np.float64))
            if rot_b is not None:
                M = M @ np.asarray(rot_b, dtype=np.float64)
            d2 = _pairwise_d2(M, CO)
            order = np.argsort(d2, axis=1)[:, : int(n_probe)]
            return pd.Series([list(map(int, row)) for row in order])

        # explode_outer + null drop (the ivf_topk lesson): a plain
        # explode's inferred size()>0 filter would plan the UDF twice
        q = q.withColumn(
            "cell", F.explode_outer(probe_cells(F.col("qvec")))
        ).where(F.col("cell").isNotNull())
        cand = index.join(F.broadcast(q), on="cell")
    else:
        cand = index.crossJoin(F.broadcast(q))
    cand = cand.where(F.col(id_col) != F.col("query_id"))

    adc_score = _make_adc_scorer(co_b, cb_b, rot_b, m_sub, dsub)
    scored = cand.withColumn(
        "qscore", adc_score(F.col("qvec"), F.col("cell"), F.col("codes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col(id_col).asc()
    )
    cand_k = k * max(int(rerank_factor), 1)
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(cand_k))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    return _exact_rerank(
        top, corpus, queries, k, id_col, vec_col, query_id_col
    )


def _make_adc_scorer(co_b, cb_b, rot_b, m_sub: int, dsub: int):
    """The asymmetric-distance-computation scorer shared by
    :func:`pq_topk` and :func:`imi_pq_topk`: ONE Arrow eval per batch,
    per-query LUTs built once per batch (few distinct queries), the
    OPQ rotation applied to the query side when the model carries one
    (orthogonal ⇒ (qR)·(vR) == q·v, the same cosine)."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def adc_score(
        qv: pd.Series, cell: pd.Series, codes: pd.Series
    ) -> pd.Series:
        CO = np.asarray(co_b, dtype=np.float64)
        CB = np.asarray(cb_b, dtype=np.float64)
        R = None if rot_b is None else np.asarray(rot_b, dtype=np.float64)
        out = np.empty(len(qv), dtype=np.float64)
        cells = cell.to_numpy()
        # few distinct queries per batch: build each query's LUT once
        groups: dict[bytes, list[int]] = {}
        for i, v in enumerate(qv):
            groups.setdefault(
                np.asarray(v, dtype=np.float64).tobytes(), []
            ).append(i)
        for key, idx_list in groups.items():
            idx = np.asarray(idx_list)
            qn = np.frombuffer(key, dtype=np.float64)
            nrm = np.linalg.norm(qn)
            if nrm > 0:
                qn = qn / nrm
            if R is not None:
                qn = qn @ R
            lut = np.einsum(
                "mkd,md->mk", CB, qn.reshape(m_sub, dsub)
            )
            qdotc = CO @ qn
            cm = np.stack(
                [np.asarray(codes.iloc[i], dtype=np.int64) for i in idx_list]
            )
            out[idx] = (
                qdotc[cells[idx]]
                + lut[np.arange(m_sub)[None, :], cm].sum(axis=1)
            )
        return pd.Series(out)

    return adc_score


def imi_fit(
    corpus: DataFrame,
    n_cells: int = 32,
    sample_size: int = 4096,
    seed: int = 7,
    vec_col: str = "embedding",
) -> dict:
    """Train an inverted multi-index (Babenko & Lempitsky 2012, "The
    Inverted Multi-Index"): the vector space splits into TWO halves,
    each quantized independently to ``n_cells`` k-means centroids, so
    the corpus lands in ``n_cells²`` PRODUCT cells. Why it exists in
    this family: on hard/isotropic corpora a flat IVF's cell membership
    caps recall (SCALE.md §15 — 0.42-0.55 recall@10 inside a 10%-of-
    rows budget, and OPQ cannot help by rotation invariance); the
    multi-index's product cells are ~n_cells× finer at the SAME
    training cost, and probing pairs in ascending summed-distance
    order concentrates the candidate budget far closer to the query —
    the paper's headline result and the standard billion-scale recipe
    (FAISS IMI). Training is driver-side on a bounded sample, like
    :func:`pq_fit`."""
    import numpy as np

    _check_imi_cells(n_cells)
    sample = _sample_vectors(corpus, sample_size, seed, vec_col)
    if sample.size == 0:
        raise ValueError("imi_fit needs a non-empty corpus")
    dim = sample.shape[1]
    if dim % 2 != 0:
        raise ValueError(f"imi_fit needs an even dim, got {dim}")
    half = dim // 2
    sn = _l2_normalize(sample)
    ca = _lloyd(sn[:, :half], n_cells, seed)
    cb = _lloyd(sn[:, half:], n_cells, seed + 1)
    ca_l = [[float(x) for x in c] for c in ca]
    cb_l = [[float(x) for x in c] for c in cb]
    return {
        "format": "spark-graft-imi/v1",
        "metric": "cosine",
        "dim": int(dim),
        "half": int(half),
        "n_cells": int(len(ca)),
        "model_id": _pq_model_id(ca_l, cb_l),
        "centroids_a": ca_l,
        "centroids_b": cb_l,
    }


# vectorized full-grid ranking below this; the paper's multi-sequence
# heap traversal above it (identical output, see _imi_rank_pairs)
_IMI_GRID_CELLS = 256
_IMI_MAX_CELLS = 4096


def _check_imi_cells(n_cells: int) -> None:
    """Sanity bound: pair ranking handles any size lazily (the heap
    path), but k-means training on the bounded driver sample
    degenerates as k approaches the sample size, and each query sorts
    two n_cells-long half-distance lists — 4096 cells already gives
    16.7M product cells, past which IVF-PQ is the better tier."""
    if int(n_cells) > _IMI_MAX_CELLS:
        raise ValueError(
            f"imi n_cells={int(n_cells)} exceeds the supported bound "
            f"({_IMI_MAX_CELLS}): training a per-half codebook that "
            "large from the bounded driver sample is degenerate, and "
            f"{_IMI_MAX_CELLS}^2 product cells already out-partition "
            "any realistic corpus — use IVF-PQ for finer budgets"
        )


def _imi_rank_pairs(qa, qb, t: int, force_heap: bool = False) -> list[int]:
    """The ``t`` closest product-cell pair codes for one query, in
    ascending (summed half-distance, pair code) order — the shared
    ranking core of :func:`_make_imi_prober`, with two strategies
    that produce IDENTICAL output (unit-tested row-for-row, ties
    included):

    - **full grid** (``n ≤ 256``): one vectorized ``n_a×n_b`` sum +
      stable argsort — raveled index IS the pair code, so stability
      gives the code tiebreak for free;
    - **multi-sequence traversal** (larger models; Babenko &
      Lempitsky 2012 §3.1): sort each half's distances once, then
      pop pairs lazily from a frontier heap in nondecreasing sum —
      ``O(n log n + t log t)`` per query instead of ``O(n²)``, which
      is what makes n_cells > 256 practical. The frontier invariant
      (push (i+1,j) always, (i,j+1) only from i=0) covers the grid
      exactly once; pops continue through sum-equal boundary ties so
      the final (sum, code) sort selects the same set the grid path
      does."""
    import heapq

    import numpy as np

    n_a, n_b = int(qa.size), int(qb.size)
    t = min(int(t), n_a * n_b)
    if t <= 0:
        return []
    if n_a * n_b <= _IMI_GRID_CELLS * _IMI_GRID_CELLS and not force_heap:
        grid = (qa[:, None] + qb[None, :]).ravel()
        return [int(p) for p in np.argsort(grid, kind="stable")[:t]]
    ia = np.argsort(qa, kind="stable")
    ib = np.argsort(qb, kind="stable")
    sa, sb = qa[ia], qb[ib]
    heap = [(float(sa[0] + sb[0]), 0, 0)]
    popped: list[tuple[float, int]] = []
    while heap and (len(popped) < t or heap[0][0] <= popped[-1][0]):
        s, i, j = heapq.heappop(heap)
        popped.append((s, int(ia[i]) * n_b + int(ib[j])))
        if i + 1 < n_a:
            heapq.heappush(heap, (float(sa[i + 1] + sb[j]), i + 1, j))
        if j + 1 < n_b and i == 0:
            heapq.heappush(heap, (float(sa[i] + sb[j + 1]), i, j + 1))
    popped.sort()
    return [code for _, code in popped[:t]]


def _check_imi_model(model: dict) -> None:
    if model.get("format") != "spark-graft-imi/v1":
        raise ValueError(
            "not an imi_fit model (format="
            f"{model.get('format')!r}; want spark-graft-imi/v1)"
        )
    if 2 * int(model["half"]) != int(model["dim"]):
        raise ValueError("corrupt imi model: 2*half != dim")
    # defense against a hand-built or future-format model dodging the
    # imi_fit guard: probing is where the grid actually materializes
    _check_imi_cells(int(model["n_cells"]))


def imi_index(
    corpus: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign the corpus into the multi-index's product cells: one
    Arrow pass, no shuffle, returning ``(id, cell_a int, cell_b
    int)`` — a 9-byte row against 256 bytes of float32 at dim=64.
    The model fingerprint rides in column metadata (the
    :func:`pq_index` contract) so :func:`imi_topk` refuses an index
    assigned under a different model."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    _check_imi_model(model)
    ca_b, cb_b, half = model["centroids_a"], model["centroids_b"], int(
        model["half"]
    )
    in_schema = corpus.select(id_col, vec_col).schema
    out_schema = StructType([
        in_schema[0],
        StructField("cell_a", IntegerType()),
        StructField("cell_b", IntegerType()),
    ])

    def assign(batches):
        CA = np.asarray(ca_b, dtype=np.float64)
        CB = np.asarray(cb_b, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = _l2_normalize(V)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cell_a": _pairwise_d2(Vn[:, :half], CA)
                .argmin(axis=1).astype(np.int32),
                "cell_b": _pairwise_d2(Vn[:, half:], CB)
                .argmin(axis=1).astype(np.int32),
            })

    out = corpus.select(id_col, vec_col).mapInPandas(assign, out_schema)
    return out.withColumn(
        "cell_a",
        F.col("cell_a").alias(
            "cell_a", metadata={"imi_model_id": model.get("model_id", "")}
        ),
    )


def _make_imi_prober(ca_b, cb_b, half: int, T: int):
    """The probe-pair ranking UDF shared by :func:`imi_topk` and
    :func:`imi_pq_topk` (the :func:`_make_adc_scorer` convention —
    one body, two tiers, no drift): per query, the T closest pair
    codes in ascending (summed half-distance, code) order via
    :func:`_imi_rank_pairs` — vectorized grid for small models, the
    paper's multi-sequence heap traversal for large ones."""
    import numpy as np

    @F.pandas_udf("array<int>")
    def probe_pairs(vs: pd.Series) -> pd.Series:
        CA = np.asarray(ca_b, dtype=np.float64)
        CB = np.asarray(cb_b, dtype=np.float64)
        M = _l2_normalize(np.array(vs.tolist(), dtype=np.float64))
        da = _pairwise_d2(M[:, :half], CA)
        db = _pairwise_d2(M[:, half:], CB)
        return pd.Series(
            [_imi_rank_pairs(qa, qb, T) for qa, qb in zip(da, db)]
        )

    return probe_pairs


def imi_topk(
    index: DataFrame,
    queries: DataFrame,
    model: dict,
    corpus: DataFrame,
    k: int = 10,
    n_probe_pairs: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k over an :func:`imi_index`: each query
    ranks ALL ``n_cells²`` product cells by summed half-distance
    ``d_a[i] + d_b[j]`` and probes the closest ``n_probe_pairs`` —
    rows touched ≈ n_probe_pairs/n_cells² of the corpus on balanced
    cells (64/1024 ≈ 6%) — then the candidates re-rank by EXACT float
    cosine (:func:`_exact_rerank`), so returned scores match
    :func:`brute_force_topk` per pair. Queries broadcast; the index
    joins on a codegen pair key and never shuffles.

    Pair ranking (:func:`_imi_rank_pairs`): the full n_cells² sum
    grid up to 256 cells/side (65k sums, vectorized), and the paper's
    multi-sequence heap traversal beyond — same output lazily in
    O(n log n + T log T), unit-tested identical row-for-row (r11,
    closing the grid-bound guard). Candidate generation only:
    re-ranking reads the float column for ~n_probe_pairs/n_cells² of
    the rows; compose with PQ codes when even that read must shrink.
    """
    import numpy as np

    _check_imi_model(model)
    mid = model.get("model_id")
    if mid and "cell_a" in index.columns:
        stamped = (index.schema["cell_a"].metadata or {}).get(
            "imi_model_id"
        )
        if stamped and stamped != mid:
            raise ValueError(
                "index was assigned under a different imi model "
                f"(index {stamped}, model {mid}) — re-run imi_index "
                "or pass the matching model"
            )
    probe_pairs = _make_imi_prober(
        model["centroids_a"], model["centroids_b"],
        int(model["half"]), int(n_probe_pairs),
    )
    K = int(model["n_cells"])

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    # explode_outer + null drop (the ivf_topk lesson): a plain
    # explode's inferred size()>0 filter would plan the UDF twice
    q = q.withColumn(
        "pair", F.explode_outer(probe_pairs(F.col("qvec")))
    ).where(F.col("pair").isNotNull()).select("query_id", "pair")
    keyed = index.withColumn(
        "pair", (F.col("cell_a").cast("int") * K + F.col("cell_b"))
    )
    cand = (
        keyed.join(F.broadcast(q), "pair")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    # the candidate set is a corpus FRACTION (≈ pairs/n_cells² of
    # rows), not |queries|·k·factor — it must NOT broadcast (review
    # r10: at 10⁸ rows it would overflow the driver); it shuffle-joins
    # the narrow float projection instead
    return _exact_rerank(
        cand, corpus, queries, k, id_col, vec_col, query_id_col,
        broadcast_candidates=False,
    )


def imi_pq_index(
    corpus: DataFrame,
    imi_model: dict,
    pq_model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composed index for :func:`imi_pq_topk`: ONE Arrow pass over
    the corpus assigns both the multi-index product cell (cell_a,
    cell_b — candidate generation) and the PQ coarse cell + residual
    codes (cell, codes — ADC ranking), so the corpus floats are read
    exactly once at build. Both model fingerprints ride in column
    metadata; :func:`imi_pq_topk` refuses a mismatched index on either
    axis."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, IntegerType, ShortType, StructField, StructType,
    )

    _check_imi_model(imi_model)
    _check_pq_model(pq_model)
    ca_b, cb2_b = imi_model["centroids_a"], imi_model["centroids_b"]
    half = int(imi_model["half"])
    co_b, cb_b = pq_model["coarse"], pq_model["codebooks"]
    rot_b = pq_model.get("rotation")
    in_schema = corpus.select(id_col, vec_col).schema
    out_schema = StructType([
        in_schema[0],
        StructField("cell_a", IntegerType()),
        StructField("cell_b", IntegerType()),
        StructField("cell", IntegerType()),
        StructField("codes", ArrayType(ShortType())),
    ])

    def encode(batches):
        CA = np.asarray(ca_b, dtype=np.float64)
        CB2 = np.asarray(cb2_b, dtype=np.float64)
        CO = np.asarray(co_b, dtype=np.float64)
        CB = np.asarray(cb_b, dtype=np.float64)
        ROT = (
            None if rot_b is None else np.asarray(rot_b, dtype=np.float64)
        )
        M, K, dsub = CB.shape
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Vn = _l2_normalize(V)
            ca = _pairwise_d2(Vn[:, :half], CA).argmin(axis=1)
            cb = _pairwise_d2(Vn[:, half:], CB2).argmin(axis=1)
            Vr = Vn if ROT is None else Vn @ ROT
            assign = _pairwise_d2(Vr, CO).argmin(axis=1)
            resid = Vr - CO[assign]
            codes = np.empty((len(Vr), M), dtype=np.int16)
            for m in range(M):
                Rm = resid[:, m * dsub : (m + 1) * dsub]
                codes[:, m] = (
                    _pairwise_d2(Rm, CB[m]).argmin(axis=1).astype(np.int16)
                )
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cell_a": ca.astype(np.int32),
                "cell_b": cb.astype(np.int32),
                "cell": assign.astype(np.int32),
                "codes": [row.tolist() for row in codes],
            })

    out = corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)
    return out.withColumn(
        "cell_a",
        F.col("cell_a").alias(
            "cell_a",
            metadata={"imi_model_id": imi_model.get("model_id", "")},
        ),
    ).withColumn(
        "codes",
        F.col("codes").alias(
            "codes", metadata={"pq_model_id": pq_model.get("model_id", "")}
        ),
    )


def imi_pq_topk(
    index: DataFrame,
    queries: DataFrame,
    imi_model: dict,
    pq_model: dict,
    corpus: DataFrame,
    k: int = 10,
    n_probe_pairs: int = 64,
    rerank_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The composed billion-scale query shape — fraction × bytes:
    multi-index product cells bound the CANDIDATE fraction
    (≈ n_probe_pairs/n_cells² of rows), PQ codes bound the BYTES read
    per candidate (~8% of float32 at dim=64/M=8), ADC ranks the
    candidates with per-query LUTs, and only the top k×rerank_factor
    rows per query touch the float column for the exact re-rank — so
    a query batch reads ≈ fraction × 8% of the corpus bytes plus
    k×factor float rows. Returned scores match
    :func:`brute_force_topk` per pair (the family contract). Both
    model fingerprints are checked against the index's column
    metadata; a mismatch on either axis is refused."""
    _check_imi_model(imi_model)
    _check_pq_model(pq_model)
    for axis, col_name, meta_key, model in (
        ("imi", "cell_a", "imi_model_id", imi_model),
        ("pq", "codes", "pq_model_id", pq_model),
    ):
        mid = model.get("model_id")
        if mid and col_name in index.columns:
            stamped = (index.schema[col_name].metadata or {}).get(meta_key)
            if stamped and stamped != mid:
                raise ValueError(
                    f"index was built under a different {axis} model "
                    f"(index {stamped}, model {mid}) — re-run "
                    "imi_pq_index or pass the matching models"
                )
    probe_pairs = _make_imi_prober(
        imi_model["centroids_a"], imi_model["centroids_b"],
        int(imi_model["half"]), int(n_probe_pairs),
    )
    K = int(imi_model["n_cells"])
    co_b, cb_b = pq_model["coarse"], pq_model["codebooks"]
    rot_b = pq_model.get("rotation")
    m_sub, dsub = int(pq_model["m_sub"]), int(pq_model["dsub"])

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    )
    probes = (
        q.withColumn("pair", F.explode_outer(probe_pairs(F.col("qvec"))))
        .where(F.col("pair").isNotNull())
        .select("query_id", "qvec", "pair")
    )
    keyed = index.withColumn(
        "pair", (F.col("cell_a").cast("int") * K + F.col("cell_b"))
    )
    cand = keyed.join(F.broadcast(probes), "pair").where(
        F.col(id_col) != F.col("query_id")
    )
    adc_score = _make_adc_scorer(co_b, cb_b, rot_b, m_sub, dsub)
    scored = cand.withColumn(
        "qscore", adc_score(F.col("qvec"), F.col("cell"), F.col("codes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col(id_col).asc()
    )
    cand_k = k * max(int(rerank_factor), 1)
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(cand_k))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    return _exact_rerank(
        top, corpus, queries, k, id_col, vec_col, query_id_col
    )


def quantized_topk_oracle(
    k: int = 5,
    rerank_factor: int = 4,
    query_predicate: str = "vec_id < 8",
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`quantized_topk` (rerank path), replicating
    the full pipeline cross-engine: per-vector max-abs int8
    quantization (round ties away from zero in BOTH engines), integer
    cosine (exact in doubles: |values| ≤ 127²·dim ≪ 2^53), candidate
    top ``k×rerank_factor`` per query by (qscore DESC, neighbor ASC),
    then exact float re-rank — verified bit-identical to the Spark
    plan on the testdata."""
    if int(rerank_factor) <= 1:
        raise ValueError(
            "quantized_topk_oracle twins only the rerank path "
            "(rerank_factor > 1): with rerank_factor <= 1 the Spark "
            "side returns floor(quantized-cosine) scores in quantized "
            "order, which this oracle's exact re-scoring does not "
            "reproduce"
        )
    cand_k = k * int(rerank_factor)
    return f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM {table}
        ),
        sc AS (
            SELECT vec_id, v,
                   CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                        THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                        ELSE 1.0 END AS scale
            FROM base
        ),
        qz AS (
            SELECT vec_id, v,
                   list_transform(v, x -> CAST(round(x / scale) AS BIGINT))
                       AS qv
            FROM sc
        ),
        qset AS (
            SELECT * FROM qz WHERE {query_predicate}
        ),
        pairs AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_dot_product(c.qv, q.qv) /
                     sqrt(list_dot_product(c.qv, c.qv)
                          * list_dot_product(q.qv, q.qv)) AS qscore,
                   c.v AS cv, q.v AS qvv
            FROM qz c CROSS JOIN qset q
            WHERE c.vec_id <> q.vec_id
        ),
        cand AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY qscore DESC, neighbor_id ASC) AS r
            FROM pairs
        ),
        rr AS (
            SELECT query_id, neighbor_id,
                   list_cosine_similarity(cv, qvv) AS score
            FROM cand WHERE r <= {cand_k}
        )
        SELECT query_id, neighbor_id,
               CAST(floor(score * 10000) AS BIGINT) AS score_e4,
               CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id ASC) AS INT) AS rank
        FROM rr QUALIFY rank <= {k}
    """
