"""Deduplication operators for training-data pipelines.

Four tiers, all expressed with built-in JVM functions (no Python UDFs
in any hot path — every expression stays inside whole-stage codegen):

  exact_dedup       hash-groupBy on normalized text          (oracle-able)
  ngram_jaccard     exact pairwise Jaccard on word shingles  (oracle-able,
                    bounded candidate set)
  minhash_lsh       MinHash signatures + banded LSH self-join → candidate
                    pairs verified with exact Jaccard (the 100 TB path:
                    cost ~ O(docs × shingles) + bucket-local joins, never
                    all-pairs)
  simhash           64-bit SimHash per document (near-dup clustering by
                    Hamming distance on the fingerprint)

Scale notes: the LSH band join shuffles on (band, band_hash) — bucket
sizes are bounded by signature similarity, so no quadratic blowup; the
reference's pg_trgm GIN index (database-schema.sql:5,64) is the
capability analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The default word-shingle width shared by every MinHash-family
# operator (and by corpus.py's index-staleness bookkeeping): a doc
# produces shingles iff it has >= this many whitespace tokens.
DEFAULT_SHINGLE_N = 3

# ------------------------------------------------------------------ exact


def normalize_text(col: str = "text") -> Column:
    return F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))


def exact_dedup(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-text hash: one row per distinct
    content, keeping the smallest id (deterministic winner), with the
    duplicate count. ON CONFLICT DO NOTHING's "first wins" becomes
    "min id wins" — stable under any partitioning.
    """
    return (
        df.select(F.col(id_col), F.sha2(normalize_text(col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_oracle(table: str = "documents") -> str:
    return f"""
        SELECT sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS content_hash,
               MIN(doc_id) AS keeper_id,
               COUNT(*) AS n_copies
        FROM {table}
        GROUP BY 1
    """


# ------------------------------------------------------------------ shingles


def word_shingles(col: str = "text", n: int = DEFAULT_SHINGLE_N) -> Column:
    """Distinct word n-gram shingles as an array column.

    Built as ``arrays_zip`` of n shifted slices of the token array, so
    the only interpreted-lambda work is a constant-cost ``concat_ws``
    per element.  The earlier ``transform(sequence(...), i ->
    slice(toks, i, n))`` form re-sliced per index inside an interpreted
    lambda — 6× slower at sf0.1 (3.7s vs 0.6s for the explode).
    """
    toks = F.split(F.trim(F.col(col)), r"\s+")
    sz = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, sz) for i in range(n)])
    return F.array_distinct(
        F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))
    )


def _shingle_hashes(col: str = "text", n: int = DEFAULT_SHINGLE_N) -> Column:
    """Array of 64-bit hashes, one per word n-gram — the MinHash input.

    No string shingle is ever materialized: each n-gram hashes directly
    from its n token fields (``xxhash64`` is variadic), and duplicates
    are kept because a min-aggregation is multiset-insensitive.  Zero
    lambdas — the whole expression stays in whole-stage codegen.
    """
    toks = F.split(F.trim(F.col(col)), r"\s+")
    sz = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, sz) for i in range(n)])
    return z  # caller explodes and hashes the struct fields


def _sql_word_shingles(col: str = "text", n: int = DEFAULT_SHINGLE_N) -> str:
    """DuckDB twin of :func:`word_shingles`."""
    toks = f"string_split_regex(trim({col}), '\\s+')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


# ------------------------------------------------------------------ jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = DEFAULT_SHINGLE_N,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact pairwise Jaccard over word n-gram shingles via an inverted
    index: explode shingles → self-join on shingle → count common
    shingles per pair → Jaccard = inter / (|A| + |B| - inter).

    This is the exact (quadratic-in-collisions) tier — bound the input
    (a candidate set or a sampled shard) and use :func:`minhash_lsh_pairs`
    to produce candidates at scale.

    The inverted index joins on the 64-bit ``xxhash64`` of the
    n-gram's token struct, not the struct (or a concatenated string):
    the shuffle then moves 8-byte longs instead of three-string
    structs and the join equality is a long compare — measured ~20%
    faster end-to-end at sf0.1 with identical output. Shingle
    equality via hash equality is the same 2⁻⁶⁴-collision contract as
    the span-dedup and decontamination tiers (the DuckDB oracle keeps
    the literal string join, so the gate would catch a collision).
    r15 (guide §1.2 — make the per-row work cheap before the
    exchange): each shingle hashes INSIDE the array (one interpreted
    ``transform`` lambda calling the same variadic ``xxhash64`` over
    the same struct fields), so ``array_distinct`` deduplicates 8-byte
    longs through its hash-set fast path instead of the generic
    quadratic struct path, and the explode emits longs directly —
    measured 1.34 s → 0.79 s on the shingling pass at sf0.1 with a
    verified-identical (id, n_sh, tri_h) multiset. Distinctness moves
    from struct equality to hash equality, which is the contract the
    join already runs under.

    Physical shape: the input is spread across the cluster first
    (``scale_partitions`` — a one-file corpus otherwise runs the whole
    pipeline on one task), the exploded index is hash-repartitioned by
    the join key so both self-join sides are co-partitioned, and the
    join is hinted shuffle-hash — hash build beats sort-merge's two
    sorts. The operator stays LAZY: callers that
    consume the pairs more than once checkpoint/persist the result
    (``dedup_clusters`` does), which beats materializing the exploded
    index inside the operator (measured: the eager checkpoint's write
    job cost more than recomputing the cheap codegen explode).
    """
    from .partitioning import scale_partitions

    toks = F.split(F.trim(F.col(col)), r"\s+")
    sz = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, sz) for i in range(n)])
    hz = F.array_distinct(
        F.transform(
            z, lambda s: F.xxhash64(*[s[str(i)] for i in range(n)])
        )
    )
    sh = scale_partitions(df).select(
        F.col(id_col).alias("id"), hz.alias("tri_hs")
    ).withColumn("n_sh", F.size("tri_hs"))
    ex = (
        sh.select("id", "n_sh", F.explode("tri_hs").alias("tri_h"))
        .repartition(F.col("tri_h"))
    )
    a, b = ex.alias("a").hint("shuffle_hash"), ex.alias("b")
    pairs = (
        a.join(b, on="tri_h")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # e4 fixed point from exact integer counts: truncating DIV (Spark)
    # == floor // (DuckDB) for non-negatives, so no round(double, 4)
    # half-way knife edge reaches the hash compare or the threshold
    return (
        pairs.withColumn(
            "jaccard_e4",
            F.expr(
                "CAST((inter * 10000) DIV (n_a + n_b - inter) AS BIGINT)"
            ),
        )
        .where(F.col("jaccard_e4") >= F.lit(int(threshold * 10000 + 0.5)))
        .select("doc_a", "doc_b", "jaccard_e4")
    )


def ngram_jaccard_oracle(
    table: str = "documents", threshold: float = 0.5, n: int = DEFAULT_SHINGLE_N,
    predicate: str = "TRUE",
) -> str:
    sh = _sql_word_shingles("text", n)
    return f"""
        WITH sh AS (
            SELECT doc_id AS id, {sh} AS shingles
            FROM {table} WHERE {predicate}
        ),
        ex AS (
            SELECT id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
        ),
        pairs AS (
            SELECT a.id AS doc_a, b.id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
                   COUNT(*) AS inter
            FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               CAST((inter * 10000) // (n_a + n_b - inter) AS BIGINT)
                   AS jaccard_e4
        FROM pairs
        WHERE (inter * 10000) // (n_a + n_b - inter)
              >= {int(threshold * 10000 + 0.5)}
    """


# ------------------------------------------------------------------ minhash


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = DEFAULT_SHINGLE_N,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document MinHash signatures: (id, s0..s{k-1}) columns.

    Spark's higher-order-function lambdas are interpreted per element
    (outside whole-stage codegen), so computing signatures inside array
    transforms is ~10× slower than relational form. This path explodes
    n-gram token structs to rows and hashes the token fields directly
    (no shingle string, no distinct — min is multiset-insensitive);
    xxhash64 and the k affine min-aggregations all run inside codegen,
    and the groupBy benefits from map-side partial aggregation (the
    shuffle carries |docs| rows of k longs, not shingles).
    """
    from .partitioning import scale_partitions

    ex = scale_partitions(df).select(
        F.col(id_col).alias("id"), F.explode(_shingle_hashes(col, n)).alias("tri")
    ).withColumn("h", F.xxhash64(*[f"tri.{i}" for i in range(n)]))
    # expressions as ONE SQL string: building k Column trees through
    # py4j cost ~2s of driver time per call at k=32.
    # Hash family k = xxhash64(h, k): overflow-free by construction, so
    # it runs identically under ANSI mode (an earlier affine min(h*a+b)
    # relied on silent long wraparound and threw ARITHMETIC_OVERFLOW on
    # any default Spark 4 session).
    aggs = [F.expr(f"min(xxhash64(h, {k})) AS s{k}") for k in range(num_hashes)]
    return ex.groupBy("id").agg(*aggs)


def _band_rows(
    sigs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bucket) rows from a signature frame: each band's
    rows_per_band signature slots hash to one bucket id."""
    rows_per_band = num_hashes // bands
    band_structs = ", ".join(
        "struct({b} AS band, hash({cols}) AS bucket)".format(
            b=b,
            cols=", ".join(
                f"s{k}" for k in range(b * rows_per_band, (b + 1) * rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sigs.selectExpr("id", f"explode(array({band_structs})) AS bb").selectExpr(
        "id", "bb.band AS band", "bb.bucket AS bucket"
    )


def _verify_jaccard(
    docs: DataFrame,
    cand: DataFrame,
    threshold: float,
    n: int,
    col: str,
    id_col: str,
    hint,
    materialize: bool = True,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair list: shingles are
    built ONLY for docs appearing in some pair (semi-join) — at corpus
    scale this is the difference between re-shingling 100 TB and a few
    GB. ``hint`` wraps the (tiny) candidate side, broadcast or identity.

    With ``materialize`` (the production path) the candidate shingle
    frame is checkpointed (r14, guide §5): it feeds BOTH sides of the
    pair join below, and the two sides hash by different keys (doc_a
    vs doc_b) so no exchange reuse can dedupe them — without the
    checkpoint the semi-join's full corpus scan + shingling ran TWICE
    per verify call. The frame is candidate-bounded (S-curve small),
    far below the scan that builds it. ``materialize=False`` (the
    callers' plan-inspection escape hatch) keeps the fully lazy shape.
    """
    members = cand.select(F.col("doc_a").alias("mid")).union(
        cand.select(F.col("doc_b"))
    )
    in_cand = docs.join(hint(members), F.col(id_col) == F.col("mid"), "left_semi")
    sh = in_cand.select(
        F.col(id_col).alias("id"), word_shingles(col, n).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    lhs = sh.select(
        F.col("id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    rhs = sh.select(
        F.col("id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    verified = (
        lhs.join(hint(cand), on="doc_a")
        .join(rhs, on="doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard_e4",
            F.expr(
                "CAST((CAST(inter AS BIGINT) * 10000)"
                " DIV (n_a + n_b - inter) AS BIGINT)"
            ),
        )
        .where(F.col("jaccard_e4") >= F.lit(int(threshold * 10000 + 0.5)))
    )
    return verified.select("doc_a", "doc_b", "jaccard_e4")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    col: str = "text",
    id_col: str = "doc_id",
    broadcast_pairs_limit: int = 1_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs at scale: MinHash → banded LSH buckets →
    bucket-local candidate join → exact Jaccard verification.

    With r = num_hashes/bands rows per band, a pair with true Jaccard s
    collides in ≥1 band with prob 1-(1-s^r)^bands (the S-curve). The
    only shuffle touching all docs is the band-bucket exchange; the
    verification join is bucket-local. False positives are removed by
    the exact check; false negatives follow the S-curve (documented
    approximation — this is the standard web-scale contract).
    """
    sigs = minhash_signatures(df, num_hashes, n, col, id_col)
    banded = _band_rows(sigs, num_hashes, bands)

    # Candidate pairs are tiny relative to the corpus (bounded by the
    # S-curve), so persist them: they are consumed three times below
    # (pair join + two membership filters) and re-deriving them would
    # recompute the signature scan each time.
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
        .distinct()
        .persist()
    )
    try:
        # Count-gated broadcast: an UNCONDITIONAL broadcast of the
        # candidate set OOMs executors on a near-dup-heavy corpus
        # (exactly when dedup matters), but when the measured count is
        # genuinely small the broadcast saves two shuffles of the (much
        # larger) corpus side. The count is a cheap action over the
        # already-persisted candidates.
        small = cand.count() <= broadcast_pairs_limit
        hint = F.broadcast if small else (lambda d: d)

        # no .distinct() on members inside _verify_jaccard: left_semi
        # tolerates duplicate build keys and the extra shuffle costs
        # more than the slightly larger build side
        verified = _verify_jaccard(
            df, cand, threshold, n, col, id_col, hint,
            materialize=materialize,
        )
        if not materialize:
            # plan-inspection escape hatch (tests): returns the LAZY
            # frame; the caller inherits the candidate persist
            return verified
        # materialize the (small, by the S-curve) result so the
        # candidate persist can be RELEASED before returning — a
        # repeated caller (dedup_corpus in a loop) must not accrete
        # cached candidate blocks for the life of the session
        return verified.localCheckpoint(eager=True)
    finally:
        if materialize:
            cand.unpersist()


def build_lsh_index(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded MinHash index rows ``(id, band, bucket)`` for a corpus —
    the persistent artifact that makes dedup *incremental*: write it
    once per ingested corpus (ideally bucketed on ``(band, bucket)``,
    :func:`~etl_workflow_spark.sources.writers.write_bucketed`) and
    daily probes (:func:`minhash_lsh_probe`) never re-shingle or
    re-pair the 100 TB corpus again.
    """
    sigs = minhash_signatures(df, num_hashes, n, col, id_col)
    return _band_rows(sigs, num_hashes, bands)


def minhash_lsh_probe(
    new_docs: DataFrame,
    corpus: DataFrame,
    index: DataFrame | None = None,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = DEFAULT_SHINGLE_N,
    col: str = "text",
    id_col: str = "doc_id",
    broadcast_rows_limit: int = 1_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Incremental near-duplicate detection: pairs between a NEW batch
    and an already-ingested corpus, plus pairs inside the new batch —
    without ever re-pairing (or, given a prebuilt ``index``,
    re-shingling) the corpus.

    This is the daily-ingest path at 100 TB: ``minhash_lsh_pairs`` on
    corpus+batch re-runs the full self-join every day; the probe's
    corpus-side cost is one index scan (bucket-pruned when the index is
    bucketed on ``(band, bucket)``) plus shingling ONLY the matched
    candidate docs. The (tiny) new batch is the broadcast side of every
    join, so the corpus never shuffles.

    Exactness contract: with identical parameters, the result equals
    ``minhash_lsh_pairs(corpus ∪ new)`` restricted to pairs touching a
    new doc — banding is deterministic per document, so the candidate
    buckets are identical (asserted by ``test_neardup.py``). Ids must
    be unique across ``corpus`` and ``new_docs``.

    Returns (doc_a, doc_b, jaccard_e4); within-batch pairs ordered
    doc_a < doc_b, cross pairs new-doc-first.
    """
    if index is None:
        index = build_lsh_index(corpus, num_hashes, bands, n, col, id_col)
    elif "id" not in index.columns and id_col in index.columns:
        # persisted indexes usually carry the real id column name
        index = index.withColumnRenamed(id_col, "id")
    new_banded = build_lsh_index(new_docs, num_hashes, bands, n, col, id_col)

    # Count-gated broadcast of the new batch's band rows (|new| × bands
    # rows of three longs): when genuinely small the corpus-side index
    # is probed in place with zero shuffle; a bulk backfill that
    # exceeds the gate falls back to a hash join — never an OOM.
    new_banded = new_banded.persist()
    cand = None
    try:
        small = new_banded.count() <= broadcast_rows_limit
        hint = F.broadcast if small else (lambda d: d)

        cross = (
            index.join(hint(new_banded.withColumnRenamed("id", "nid")),
                       on=["band", "bucket"])
            .where(F.col("id") != F.col("nid"))
            .select(F.col("nid").alias("doc_a"), F.col("id").alias("doc_b"))
        )
        within = (
            new_banded.alias("x")
            .join(hint(new_banded.alias("y")), on=["band", "bucket"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("doc_a"), F.col("y.id").alias("doc_b"))
        )
        cand = cross.union(within).distinct().persist()
        cand_small = cand.count() <= broadcast_rows_limit
        chint = F.broadcast if cand_small else (lambda d: d)

        docs = new_docs.select(F.col(id_col), F.col(col)).unionByName(
            corpus.select(F.col(id_col), F.col(col))
        )
        verified = _verify_jaccard(
            docs, cand, threshold, n, col, id_col, chint,
            materialize=materialize,
        )
        if not materialize:
            # plan-inspection escape hatch (tests): returns the LAZY
            # frame; the caller inherits the internal persists
            return verified
        # materialize the (small, by the S-curve) result so every
        # internal persist can be RELEASED before returning: a stream
        # calls this once per micro-batch, and leaked blocks would
        # accrete for the life of the query
        return verified.localCheckpoint(eager=True)
    finally:
        if materialize:
            new_banded.unpersist()
            if cand is not None:
                cand.unpersist()


# ------------------------------------------------------------------ simhash


def simhash(df: DataFrame, col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: each token hashes to 64 bits; bit b
    of the fingerprint is 1 iff the (count-weighted) sum of ±1 votes is
    positive. Near-dups then cluster by Hamming distance.

    Built-ins only: explode tokens → per-token xxhash64 → 64 conditional
    sums in ONE aggregation pass (map-side partial agg keeps the shuffle
    at |docs| rows × 64 ints).
    """
    from .partitioning import scale_partitions

    toks = F.split(F.trim(F.col(col)), r"\s+")
    ex = scale_partitions(df).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    )
    h = ex.withColumn("th", F.xxhash64("tok"))
    # expressions as SQL strings: 64 Column-built aggregates cost
    # seconds of py4j round-trips (same finding as minhash_signatures).
    # shiftleft instead of a 1<<b literal: bit 63 overflows a long lit.
    votes = [
        F.expr(
            f"sum(CASE WHEN (th & shiftleft(1L, {b})) != 0 THEN 1 ELSE -1 END)"
            f" AS v{b}"
        )
        for b in range(bits)
    ]
    agg = h.groupBy("id").agg(*votes)
    fp = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(bits)
    )
    return agg.selectExpr(f"id AS {id_col}", f"({fp}) AS simhash")


def _seg_mask(width: int) -> int:
    """Signed-64 pigeonhole segment mask for ``width`` bits: the
    unsigned ``(1 << width) - 1`` wrapped into the two's-complement
    value a Spark ``long`` literal can hold (width 64 → -1, identity
    under AND) — a single-segment split of a full 64-bit fingerprint
    (``max_distance=0``) would otherwise overflow the literal."""
    m = (1 << width) - 1
    return m - (1 << 64) if m >= (1 << 63) else m


def hamming_pairs(fps: DataFrame, max_distance: int = 3,
                  id_col: str = "doc_id", fp_col: str = "simhash",
                  bits: int = 64) -> DataFrame:
    """Near-dup pairs by Hamming distance over 64-bit-packed
    fingerprints — SimHash by default; any other long-packed
    perceptual hash (e.g. the image dHash,
    :func:`~etl_workflow_spark.operators.multimodal.dhash_media`) via
    ``fp_col``/``bits``.

    Blocked self-join: split the ``bits``-bit fingerprint into
    ``max_distance+1`` segments — any pair within the distance budget
    shares at least one exact segment (pigeonhole), so the join is
    segment-equality, never all-pairs. ``bits`` below 64 segments only
    the populated low bits, keeping each segment discriminative
    (segmenting guaranteed-zero high bits would put every row in one
    bucket for those segments).
    """
    nseg = max_distance + 1
    if bits < nseg:
        raise ValueError(
            f"cannot split {bits} fingerprint bits into {nseg} "
            "pigeonhole segments (max_distance too large)"
        )
    seg_bits = bits // nseg
    fp = F.col(fp_col)
    segs = fps.select(
        F.col(id_col).alias("id"),
        fp.alias("__fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg"),
                        F.shiftrightunsigned(fp, s * seg_bits)
                        .bitwiseAND(
                            F.lit(
                                # the LAST segment absorbs the
                                # remainder bits so all `bits` are
                                # covered by some segment; masks of
                                # 63+ bits wrap to their signed-long
                                # two's complement (a 64-bit mask is
                                # -1 — identity under AND), or the
                                # literal would overflow
                                _seg_mask(
                                    bits - s * seg_bits
                                    if s == nseg - 1
                                    else seg_bits
                                )
                            )
                        )
                        .alias("segval"),
                    )
                    for s in range(nseg)
                ]
            )
        ).alias("sv"),
    ).select("id", "__fp", F.col("sv.seg").alias("seg"), F.col("sv.segval").alias("segval"))
    cand = (
        segs.alias("x")
        .join(segs.alias("y"), on=["seg", "segval"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("doc_a"),
            F.col("y.id").alias("doc_b"),
            F.bit_count(F.col("x.__fp").bitwiseXOR(F.col("y.__fp"))).alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= F.lit(max_distance))


def hamming_probe(new_fps: DataFrame, corpus_fps: DataFrame,
                  max_distance: int = 3, id_col: str = "doc_id",
                  fp_col: str = "simhash", bits: int = 64) -> DataFrame:
    """Cross-corpus Hamming pairing: each NEW fingerprint against an
    EXISTING corpus's fingerprints — the incremental-ingest twin of
    :func:`hamming_pairs` (which self-pairs one frame), mirroring
    :func:`minhash_lsh_probe`'s shape: the (small) batch side's
    pigeonhole segments broadcast-join the corpus side's, so the
    corpus fingerprints never self-pair and never shuffle against
    each other. Returns ``(doc_a=new id, doc_b=corpus id, hamming)``
    with the distance filter applied; within-batch pairs are NOT
    reported (run :func:`hamming_pairs` on the batch for those)."""
    nseg = max_distance + 1
    if bits < nseg:
        raise ValueError(
            f"cannot split {bits} fingerprint bits into {nseg} "
            "pigeonhole segments (max_distance too large)"
        )
    seg_bits = bits // nseg

    def _segs(fps: DataFrame) -> DataFrame:
        fp = F.col(fp_col)
        return fps.select(
            F.col(id_col).alias("id"),
            fp.alias("__fp"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("seg"),
                            F.shiftrightunsigned(fp, s * seg_bits)
                            .bitwiseAND(
                                F.lit(
                                    _seg_mask(
                                        bits - s * seg_bits
                                        if s == nseg - 1
                                        else seg_bits
                                    )
                                )
                            )
                            .alias("segval"),
                        )
                        for s in range(nseg)
                    ]
                )
            ).alias("sv"),
        ).select(
            "id", "__fp",
            F.col("sv.seg").alias("seg"),
            F.col("sv.segval").alias("segval"),
        )

    cand = (
        F.broadcast(_segs(new_fps)).alias("x")
        .join(_segs(corpus_fps).alias("y"), on=["seg", "segval"])
        .select(
            F.col("x.id").alias("doc_a"),
            F.col("y.id").alias("doc_b"),
            F.bit_count(
                F.col("x.__fp").bitwiseXOR(F.col("y.__fp"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= F.lit(max_distance))


# ------------------------------------------------------------ clustering


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    id_col: str = "doc_id",
    max_rounds: int = 20,
    small_graph_edges: int = 200_000,
    small_graph_nodes: int = 500_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs: the step that
    turns a pair list (from :func:`ngram_jaccard_pairs`,
    :func:`minhash_lsh_pairs`, or :func:`hamming_pairs`) into the
    actual dedup decision — one canonical ``cluster_id`` (the minimum
    member id) per document, plus the cluster size. Keep one doc per
    cluster and you have the deduplicated corpus.

    Algorithm: distributed min-label propagation. Each node starts
    labeled min(self, neighbors); each round every node takes the min
    of its own and its neighbors' labels; stop when no label changes.
    Rounds = graph diameter, and near-dup graphs are shallow — LSH/
    Jaccard components are quasi-cliques (diameter ≤ 2-3 in practice)
    — so this converges in a handful of rounds. Each round is ONE
    shuffle join (edges ⨝ labels) + one agg; labels are
    localCheckpoint-ed per round so lineage stays flat no matter how
    many rounds run. For adversarial long-chain graphs swap in
    alternating large-star/small-star (same edge-join primitive,
    O(log^2 n) rounds); dedup workloads never need it.

    Small-graph fast path: a verified near-dup pair list is orders of
    magnitude smaller than the corpus (it survived similarity
    verification), so when the edge count is under
    ``small_graph_edges`` AND the node count stays under
    ``small_graph_nodes`` the components are solved by driver-side
    union-find on the collected pairs, and the label frame goes back
    through the Arrow batch path (``createDataFrame(pandas.DataFrame)``)
    rather than row-by-row py4j serialization. The defaults bound the
    driver dict at ~200k edges (a Python dict entry costs ~100+ B, so
    this is tens of MB of driver heap, not the GB the old 2M default
    admitted). Above either bound the distributed loop below takes over
    unchanged.

    ``all_ids`` (one ``id_col`` per corpus document) makes the output
    total: docs in no pair come back as singletons labeled by their own
    id. Returns (doc_id, cluster_id, cluster_size).
    """
    # materialize the directed edge list BEFORE mirroring: the pair
    # generator upstream (an LSH band join or shingle self-join) runs
    # exactly once, and both union branches read the checkpoint
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).localCheckpoint(
        eager=True
    )

    if e.count() <= small_graph_edges:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in e.collect():
            u, v = row[0], row[1]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        if len(parent) <= small_graph_nodes:
            root_min: dict = {}
            for node in parent:
                r = find(node)
                m = root_min.get(r)
                if m is None or node < m:
                    root_min[r] = node
            import pandas as pd
            from pyspark.sql.types import StructField, StructType

            # explicit schema from the edge columns: inference fails on
            # an EMPTY pair list (legal input — e.g. a batch with no
            # near-dups), which must yield all-singleton output
            schema = StructType(
                [
                    StructField("id", e.schema[0].dataType),
                    StructField("label", e.schema[1].dataType),
                ]
            )
            labels = e.sparkSession.createDataFrame(
                pd.DataFrame(
                    {
                        "id": list(parent),
                        "label": [root_min[find(n)] for n in parent],
                    }
                ),
                schema=schema,
            )
            return _cluster_output(labels, all_ids, id_col)
        # too many nodes for a driver-built frame: fall through to the
        # distributed loop (the collected dict is discarded)

    adj = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # no checkpoint here: the lineage only references the (checkpointed)
    # edge list, and round 1's checkpoint materializes it anyway
    labels = (
        adj.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select(F.col("u").alias("id"), F.least(F.col("u"), F.col("m")).alias("label"))
    )
    converged = False
    # max_rounds + 1: a component whose diameter is exactly max_rounds
    # finishes propagating on the final permitted round, so one extra
    # check-only pass (which finds changed == 0) is needed to observe
    # convergence rather than spuriously raising.
    for _ in range(max_rounds + 1):
        nbr_min = (
            adj.join(labels, adj["v"] == labels["id"])
            .select(adj["u"].alias("id"), F.col("label").alias("nl"))
            .groupBy("id")
            .agg(F.min("nl").alias("nl"))
        )
        merged = labels.join(nbr_min, on="id", how="left").select(
            "id",
            "label",
            F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias(
                "new_label"
            ),
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.where(F.col("new_label") < F.col("label")).limit(1).count()
        labels = merged.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            converged = True
            break

    if not converged:
        # a component's diameter exceeded max_rounds: partial labels
        # would silently split clusters — refuse instead.
        raise RuntimeError(
            f"dedup_clusters did not converge within max_rounds={max_rounds}; "
            "the pair graph has a longer-diameter component than label "
            "propagation budgeted for — raise max_rounds or switch to the "
            "large-star/small-star variant"
        )

    return _cluster_output(labels, all_ids, id_col)


def _cluster_output(
    labels: DataFrame, all_ids: DataFrame | None, id_col: str
) -> DataFrame:
    """Shared tail: attach singletons, compute sizes in one shuffle."""
    out = labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))
    if all_ids is not None:
        out = (
            all_ids.select(id_col)
            .join(out, on=id_col, how="left")
            .select(
                id_col,
                F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            )
        )
    # single shuffle on cluster_id (vs groupBy + join = two)
    w = Window.partitionBy("cluster_id")
    return out.select(
        id_col, "cluster_id", F.count(F.lit(1)).over(w).alias("cluster_size")
    )


def dedup_clusters_oracle(
    pairs_sql: str, table: str = "documents", id_col: str = "doc_id"
) -> str:
    """Transitive-closure twin via recursive CTE (tractable at oracle
    scale; the Spark side is the distributed algorithm)."""
    return f"""
        WITH RECURSIVE
        p AS ({pairs_sql}),
        e AS (SELECT doc_a AS u, doc_b AS v FROM p
              UNION SELECT doc_b, doc_a FROM p),
        reach(id, r) AS (
            SELECT {id_col}, {id_col} FROM {table}
            UNION
            SELECT reach.id, e.v FROM reach JOIN e ON reach.r = e.u
        ),
        comp AS (SELECT id AS {id_col}, MIN(r) AS cluster_id
                 FROM reach GROUP BY id)
        SELECT {id_col}, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """


# ------------------------------------------------------- line-level dedup


def boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequent lines: every distinct (trimmed, non-empty) line
    occurring in at least ``min_docs`` DISTINCT documents — the
    boilerplate set of the C4-style cleanup recipe (navigation menus,
    cookie banners, license footers repeat across pages; prose doesn't).

    Returns (line_h, line, n_docs). One explode + one count-distinct
    aggregation keyed on the 64-bit line hash; combiner-friendly and
    linear in corpus lines.
    """
    lines = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(col), "\n")).alias("line_raw"),
    ).select(
        id_col,
        F.trim(F.col("line_raw")).alias("line"),
    ).where(F.length("line") > 0)
    return (
        lines.groupBy(F.xxhash64("line").alias("line_h"))
        .agg(
            F.first("line").alias("line"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
        .where(F.col("n_docs") >= F.lit(min_docs))
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite each document with corpus-boilerplate lines removed
    (kept lines preserve their original order; a fully-boilerplate
    document keeps an empty text). Output: (id, text, n_lines_removed).

    Scale shape: lines explode once; the boilerplate probe joins on
    the line hash — the same key the count aggregation just shuffled
    on, so the join reuses that partitioning rather than moving the
    corpus again; the rebuild is one groupBy(id) with an in-group sort
    by original position (array_sort on (pos, line) structs — no
    window, no per-group Python).
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), "\n")).alias("pos", "line_raw"),
    )
    flagged = boilerplate_lines(
        docs, min_docs=min_docs, col=col, id_col=id_col
    ).select("line_h")
    tagged = lines.withColumn(
        "line_h", F.xxhash64(F.trim(F.col("line_raw")))
    ).withColumn(
        "is_empty", F.length(F.trim(F.col("line_raw"))) == 0
    )
    kept = tagged.join(
        flagged.withColumn("__bp", F.lit(True)), "line_h", "left"
    ).withColumn(
        "drop", F.coalesce(F.col("__bp"), F.lit(False)) & ~F.col("is_empty")
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("drop"),
                                F.struct(
                                    F.col("pos"), F.col("line_raw").alias("line")
                                ),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(col),
            F.sum(F.col("drop").cast("long")).alias("n_lines_removed"),
        )
    )
    return rebuilt


def dedup_paragraphs(
    docs: DataFrame,
    sep: str = "\n\n",
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the RefinedWeb/MassiveText
    recipe): every repeated paragraph survives ONLY in its first
    occurrence — first by ``(doc_id, position)`` — and is removed from
    every later document; document-internal repeats beyond the first
    also drop. Output: (id, text, n_paras_removed), paragraph order
    preserved, empty paragraphs (formatting) always kept.

    Scale shape: paragraphs explode once; the winner per distinct
    paragraph is ``min(struct(doc_id, pos))`` — ONE combiner-friendly
    aggregation on the 64-bit paragraph hash, and the probe joins back
    on that same hash so it reuses the aggregation's partitioning. The
    rebuild is the same windowless groupBy(id) + in-group array_sort
    as :func:`strip_boilerplate_lines`. Everything is linear in corpus
    paragraphs; nothing is quadratic in repeats.

    ``sep`` is treated as a LITERAL separator (escaped before the
    regex split — a "." or "||" separator must not split on every
    character), matching the literal rejoin. Documents with NULL text
    survive with NULL text and ``n_paras_removed = 0`` via a final
    join back to the input ids (posexplode of a null array would
    otherwise silently drop them).
    """
    import re as _re

    from .partitioning import scale_partitions

    paras = scale_partitions(docs).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), _re.escape(sep))).alias(
            "pos", "para"
        ),
    ).withColumn(
        "para_h", F.xxhash64(F.trim(F.col("para")))
    ).withColumn(
        "is_empty", F.length(F.trim(F.col("para"))) == 0
    )
    winners = (
        paras.where(~F.col("is_empty"))
        .groupBy("para_h")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w"))
    )
    tagged = paras.join(winners, "para_h", "left").withColumn(
        "drop",
        ~F.col("is_empty")
        & ~(
            (F.col(f"w.{id_col}") == F.col(id_col))
            & (F.col("w.pos") == F.col("pos"))
        ),
    )
    rebuilt = (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("drop"),
                                F.struct(F.col("pos"), F.col("para").alias("p")),
                            )
                        )
                    ),
                    lambda s: s["p"],
                ),
                sep,
            ).alias("__text"),
            F.sum(F.col("drop").cast("long")).alias("n_paras_removed"),
        )
    )
    # null-text docs never reached the explode; restore them (text
    # stays NULL, nothing removed) — the join side is (id,) slim
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("__text").alias(col),
            F.coalesce(F.col("n_paras_removed"), F.lit(0).cast("long")).alias(
                "n_paras_removed"
            ),
        )
    )


def dedup_spans(
    docs: DataFrame,
    min_tokens: int = 50,
    col: str = "text",
    id_col: str = "doc_id",
    broadcast_dups_limit: int = 1_000_000,
) -> DataFrame:
    """Corpus-wide exact SPAN dedup — the ExactSubstr step of the
    Lee-et-al./RefinedWeb recipe, at window-hash granularity: any run
    of ``min_tokens`` consecutive whitespace tokens appearing verbatim
    at more than one (doc, position) survives only at its first
    occurrence (min ``(doc_id, pos)``); every other occurrence loses
    those tokens. A duplicated span of m >= min_tokens tokens is
    covered by its m-min_tokens+1 windows, so the whole span is
    removed from the losers; spans shorter than min_tokens are
    invisible — the same threshold semantics as the suffix-array
    original, without its single-node memory profile.

    Scale shape (everything linear in corpus tokens, no Python in the
    hot path): tokens hash once to longs; window hashes are
    hash-of-hashes over array slices (the `_gram_hashes` pattern —
    the lambda reads a MATERIALIZED hash column, never the
    tokenization tree); the duplicate-window aggregation shuffles
    (whash, 8 bytes) rows with map-side combine, so a corpus-hot span
    repeated k times costs every task O(1), never one straggler task
    O(k) — the duplicate set then probes back via a count-gated
    broadcast join, leaving the window rows unpartitioned by whash;
    ONLY affected documents explode to token
    granularity for the rebuild (windowless groupBy + in-group
    array_sort, as :func:`dedup_paragraphs`). Untouched documents keep
    their text byte-identical; rebuilt documents rejoin tokens with
    single spaces (token-stream semantics — the tier targets training
    corpora, not archival storage). NULL-text docs survive unchanged.
    Window equality is xxhash64 equality (collision odds 2^-64, the
    decontamination contract). Run-rarely economics: this is the
    expensive full-corpus pass of the recipe — at 100 TB schedule it
    like the suffix-array original (a dedicated job), not per-ingest;
    the incremental path for daily batches is the LSH probe tier.
    """
    from .partitioning import scale_partitions
    from .text import _gram_hashes, tokens

    if min_tokens < 2:
        raise ValueError("min_tokens must be >= 2")
    length = int(min_tokens)

    base = scale_partitions(docs.select(F.col(id_col), F.col(col)))
    toked = base.select(id_col, col, tokens(col).alias("__toks"))
    hashed = toked.select(
        id_col,
        "__toks",
        F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th"),
    )
    # Skew-guarded loser detection (r7 verdict #4): the earlier
    # window-partitionBy(whash) form put a corpus-hot span's k
    # occurrences into ONE task (sort + count in a single partition —
    # a straggler at 100× repeat). Shape now: materialize the window
    # rows ONCE (lazy checkpoint — same volume the window exchange
    # wrote, but reusable), aggregate per whash with map-side combine
    # (each task emits ≤1 row per whash, so a hot span costs every
    # task O(1), never one task O(k)), then probe the (small — only
    # duplicated windows) aggregate back with a count-gated broadcast
    # join: no whash partitioning of the window rows at all.
    windows = hashed.select(
        F.col(id_col),
        F.posexplode(_gram_hashes("__th", length)).alias("wpos", "whash"),
    ).localCheckpoint(eager=False)
    occ = F.struct(F.col(id_col), F.col("wpos"))
    dup = (
        windows.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.min(occ).alias("__first"))
        .where(F.col("__cnt") > 1)
        .select("whash", "__first")
        .localCheckpoint(eager=False)  # consumed by count + join
    )
    # bounded by duplicated content, not the corpus; over the gate the
    # join falls back to a shuffle, where AQE's skew split applies
    small = dup.count() <= broadcast_dups_limit
    hint = F.broadcast if small else (lambda d: d)
    losers = (
        windows.join(hint(dup), "whash")
        .where(occ != F.col("__first"))
        .select(id_col, "wpos")
    )
    # token indices covered by any losing window (0-based; window at
    # wpos covers wpos .. wpos+L-1), deduped across overlapping
    # windows. Lazily checkpointed: it is consumed twice (count + the
    # rebuild anti-join) and is small — loser windows × L, bounded by
    # duplicated content, not the corpus.
    removed = losers.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("wpos"), F.col("wpos") + F.lit(length - 1))
        ).alias("tpos"),
    ).distinct().localCheckpoint(eager=False)
    rem_agg = removed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens_removed")
    )
    # ONLY affected docs explode to token granularity for the rebuild
    toks_pos = (
        hashed.join(rem_agg.select(id_col), id_col, "left_semi")
        .select(id_col, F.posexplode("__toks").alias("tpos", "tok"))
    )
    kept_agg = (
        toks_pos.join(removed, [id_col, "tpos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("tpos"), F.col("tok").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                " ",
            ).alias("__text")
        )
    )
    # fully-removed docs keep an empty text, not their original
    rebuilt = rem_agg.join(kept_agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__text"), F.lit("")).alias("__text"),
        "n_tokens_removed",
    )
    return docs.select(id_col, col).join(rebuilt, id_col, "left").select(
        id_col,
        F.when(F.col("n_tokens_removed").isNotNull(), F.col("__text"))
        .otherwise(F.col(col))
        .alias(col),
        F.coalesce(
            F.col("n_tokens_removed"), F.lit(0).cast("long")
        ).alias("n_tokens_removed"),
    )


def keep_best_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    higher_is_better: bool = True,
) -> DataFrame:
    """Quality-aware dedup keep policy: given near-dup cluster
    assignments (:func:`dedup_clusters` output: ``(id, cluster_id,
    ...)``), keep the member with the best ``score_col`` per cluster
    (ties break on min id — fully deterministic), instead of the
    min-id member — the RefinedWeb/FineWeb policy of surviving the
    best-quality copy, not an arbitrary one. Documents in no cluster
    pass through untouched.

    One (cluster_id) aggregation over the (tiny) cluster map joined
    with just ``(id, score)`` — the corpus itself only ever anti-joins
    against the loser-id list, so at 100 TB the full rows never
    shuffle. Returns the surviving rows of ``docs`` unchanged.
    """
    direction = -1.0 if higher_is_better else 1.0
    # NULL scores coalesce to +inf (the worst value for the min-struct
    # aggregate in EITHER direction): struct ordering sorts NULL fields
    # first, so an unscored member would otherwise win its cluster
    # regardless of higher_is_better. An all-NULL cluster still gets a
    # winner — min-id among the +inf ties.
    member_scores = clusters.select(id_col, "cluster_id").join(
        docs.select(
            F.col(id_col),
            F.coalesce(
                F.col(score_col).cast("double") * direction,
                F.lit(float("inf")),
            ).alias("__s"),
        ),
        id_col,
    )
    winners = (
        member_scores.groupBy("cluster_id")
        .agg(F.min(F.struct(F.col("__s"), F.col(id_col))).alias("__w"))
        .select("cluster_id", F.col(f"__w.{id_col}").alias("__winner"))
    )
    losers = (
        member_scores.join(winners, "cluster_id")
        .where(F.col(id_col) != F.col("__winner"))
        .select(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def dedup_corpus(
    docs: DataFrame,
    threshold: float = 0.8,
    quality_col: str | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> DataFrame:
    """One-call corpus deduplication — the full keep-one recipe wired
    from the tiers below, returning the SURVIVING rows of ``docs``:

    1. exact tier: byte-duplicate groups collapse to their min-id
       member (cheap hash groupBy — no point near-dup-hashing copies);
    2. near-dup tier: MinHash+LSH candidate pairs at ``threshold``
       over the exact survivors (``**lsh_kwargs`` pass through:
       num_hashes, bands, n, ...);
    3. clustering: connected components over the verified pairs;
    4. keep policy: min-id member per cluster, or the best
       ``quality_col`` member when given (the RefinedWeb policy via
       :func:`keep_best_per_cluster`).

    Scale shape is the sum of its parts (each documented above): the
    corpus shuffles once for the exact hash, once for signatures;
    pairs/clusters live in pair-space; final survival is an anti-join
    against loser ids. The pair list is consumed by both clustering
    rounds, so it rides :func:`dedup_clusters`'s internal persistence.

    NULL-text documents bypass BOTH tiers and survive unconditionally —
    the null-preservation contract of :func:`dedup_spans` /
    :func:`dedup_paragraphs`. Without the bypass the exact tier's
    ``sha2(normalize)`` maps every NULL text to a NULL hash, silently
    collapsing all NULL-text docs into one "duplicate" group.
    """
    survivors, _stage1, _clusters = _dedup_corpus_parts(
        docs, threshold=threshold, quality_col=quality_col, col=col,
        id_col=id_col, **lsh_kwargs,
    )
    return survivors


def _dedup_corpus_parts(
    docs: DataFrame,
    threshold: float = 0.8,
    quality_col: str | None = None,
    col: str = "text",
    id_col: str = "doc_id",
    **lsh_kwargs,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`dedup_corpus`, decomposed for the extension recipe:
    returns ``(survivors, stage1, clusters)`` where ``stage1`` is the
    exact-tier keeper rows and ``clusters`` the near-pair component
    labels over them (keepers in no pair are absent — singletons).
    ``corpus._batch_recipe`` consumes the parts to spread universe
    contacts through within-batch components WITHOUT a second shingle
    pass; :func:`dedup_corpus` wraps this and returns only the
    survivors, so the two can never drift. Keeper-level structure is
    complete for that purpose: an exact loser shares its keeper's
    hash and shingle set, hence exactly its contacts and pairs."""
    nulls = docs.where(F.col(col).isNull())
    nonnull = docs.where(F.col(col).isNotNull())
    exact = exact_dedup(nonnull, col=col, id_col=id_col)
    keepers = exact.select(F.col("keeper_id").alias(id_col))
    stage1 = nonnull.join(keepers, id_col, "left_semi")
    pairs = minhash_lsh_pairs(
        stage1, threshold=threshold, col=col, id_col=id_col, **lsh_kwargs
    )
    clusters = dedup_clusters(pairs, all_ids=None, id_col=id_col)
    if quality_col is not None:
        survivors = keep_best_per_cluster(
            stage1, clusters, quality_col, id_col=id_col
        )
    else:
        losers = clusters.where(
            F.col(id_col) != F.col("cluster_id")
        ).select(id_col)
        survivors = stage1.join(losers, id_col, "left_anti")
    return survivors.unionByName(nulls), stage1, clusters
