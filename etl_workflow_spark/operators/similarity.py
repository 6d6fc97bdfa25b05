"""Similarity search over embedding columns (array<float>).

Two tiers:

  brute_force_topk   exact cosine top-k: broadcast the (small) query
                     set against the corpus — one narrow pass over the
                     corpus, per-partition top-k via window. The
                     baseline and the verifier for approximate tiers.

  lsh_topk           random-hyperplane LSH: bucket corpus + queries by
                     sign-bit sketches, search only same-bucket
                     candidates (multi-probe via band tables). The
                     100 TB path: shuffle is bucket-local, cost scales
                     with collisions, not corpus size × queries.

All vector math is built-in higher-order functions (zip_with +
aggregate) over array<double> — JVM-side, no Python. For very wide
vectors or GPU-backed scoring, swap the score expression for a Pandas
UDF without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
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
            F.round("score", 4).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def brute_force_topk_oracle(
    k: int = 5, query_predicate: str = "vec_id < 8", table: str = "embeddings"
) -> str:
    """DuckDB twin: double-cast lists + list_cosine_similarity (same
    left-to-right accumulation, double precision → 4-decimal round is
    engine-stable)."""
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
        SELECT query_id, neighbor_id, round(score, 4) AS score,
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


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
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
    rows_per_band = num_planes // bands
    mask = (1 << rows_per_band) - 1

    def banded(df: DataFrame, idname: str) -> DataFrame:
        with_sketch = df.withColumn(
            "sketch", hyperplane_sketch(_as_double(F.col(vec_col)), num_planes, dim)
        )
        return with_sketch.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"{idname}_vec"),
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
            idname, f"{idname}_vec",
            F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
        )

    qb = banded(
        queries.withColumnRenamed(query_id_col, id_col)
        if query_id_col != id_col
        else queries,
        "query_id",
    )
    cb = banded(corpus, "neighbor_id")
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
            F.round("score", 4).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
