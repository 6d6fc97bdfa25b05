"""Deterministic sampling for training-data pipelines.

``DataFrame.sample`` is seed-reproducible only for a fixed partitioning
— repartition the input (or rerun after a cluster resize) and the kept
set changes. Training pipelines need CONTENT-stable subsetting: the
same document is in or out of the sample regardless of layout, run, or
engine, so ablations and resumed runs see the same corpus. These
operators key the decision on a cryptographic hash of the row's id:

  deterministic_sample   keep iff sha256(salt‖key) lands below the rate
  stratified_sample      per-group rates (e.g. downsample common langs)
  split_frame            disjoint train/valid/test by hash range

All are shuffle-free filters over codegen expressions (sha2 is
JVM-side); the hash prefix comparison is done on lowercase hex strings,
which orders identically to the numeric value, so a SQL oracle can
replay the exact row set (no engine-specific RNG anywhere).

Capability analog in the reference: ``data-generator.py`` seeds numpy
(lines 12-14) so generated fixtures are reproducible — the same
property, applied to subsetting instead of generation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars = 32 bits of the digest: rate resolution 2^-32, plenty.
_HEX_SPAN = 16**8


def _bucket(key: str, salt: str) -> Column:
    return F.substring(
        F.sha2(F.concat(F.lit(salt), F.col(key).cast("string")), 256), 1, 8
    )


def _thr(rate: float) -> str:
    return format(min(max(int(rate * _HEX_SPAN), 0), _HEX_SPAN - 1), "08x")


def deterministic_sample(
    df: DataFrame, rate: float, key: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Content-stable Bernoulli sample at ``rate``.

    A row is kept iff the first 32 bits of sha256(salt‖key) fall below
    rate·2^32 — independent of partitioning, run, cluster size, and
    engine. Different ``salt`` values draw independent samples.
    """
    return df.where(_bucket(key, salt) < F.lit(_thr(rate)))


def deterministic_sample_oracle(
    rate: float, table: str = "documents", key: str = "doc_id",
    salt: str = "sample",
) -> str:
    return f"""
        SELECT * FROM {table}
        WHERE substr(sha256('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
              < '{_thr(rate)}'
    """


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source
    rebalancing step of corpus construction (e.g. keep 10% of English,
    100% of low-resource languages). Same hash decision as
    :func:`deterministic_sample`, with the threshold chosen per group.
    """
    thr: Column = F.lit(_thr(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_thr(rate))).otherwise(thr)
    return df.where(_bucket(key, salt) < thr)


def stratified_sample_oracle(
    rates: dict[str, float],
    strata_col: str,
    table: str = "documents",
    key: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{v}' THEN '{_thr(r)}'"
        for v, r in sorted(rates.items())
    )
    return f"""
        SELECT * FROM {table}
        WHERE substr(sha256('{salt}' || CAST({key} AS VARCHAR)), 1, 8)
              < (CASE {cases} ELSE '{_thr(default_rate)}' END)
    """


def target_mixture(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str,
    key: str = "doc_id",
    salt: str = "mixture",
) -> tuple[DataFrame, dict[str, float]]:
    """Downsample to a target stratum mixture (the data-mixing step of
    training-corpus construction: "30% web, 30% code, 40% books").

    Solves for the largest output that hits ``targets`` exactly with
    keep-rates ≤ 1 (no upsampling): the binding stratum — the one whose
    observed share falls shortest of its target — is kept whole, and
    every other stratum is hash-downsampled to match. Strata not named
    in ``targets`` are dropped.

    Cost: ONE small aggregation (stratum counts — rows = number of
    strata) to solve the rates, then a shuffle-free deterministic
    filter; the corpus itself never moves. Returns ``(sampled_df,
    rates)`` so the solved rates can be logged / reused.
    """
    total_target = sum(targets.values())
    if total_target <= 0:
        raise ValueError("targets must have positive total weight")
    norm = {s: w / total_target for s, w in targets.items()}
    counts = {
        r[strata_col]: r["n"]
        for r in df.where(F.col(strata_col).isin(*targets))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = [s for s in targets if counts.get(s, 0) == 0 and norm[s] > 0]
    if missing:
        raise ValueError(
            f"strata {missing} have a positive target share but no rows"
        )
    # Largest feasible output size: every stratum must supply
    # share*T rows from its count[s] available.
    t_out = min(counts[s] / norm[s] for s in targets if norm[s] > 0)
    rates = {
        s: min(1.0, (norm[s] * t_out) / counts[s]) if norm[s] > 0 else 0.0
        for s in targets
    }
    return (
        stratified_sample(
            df, rates, strata_col, key=key, salt=salt, default_rate=0.0
        ),
        rates,
    )


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    key: str = "doc_id",
    salt: str = "temp",
) -> tuple[DataFrame, dict[str, float]]:
    """Temperature-based stratum rebalancing (the multilingual
    sampling recipe of XLM-R / mT5: Conneau et al. 2020 §3.1, Xue et
    al. 2021 — sample strata with probability proportional to
    ``(n_i/N)^alpha``): flattens the head of a skewed stratum
    distribution (common languages / domains) without an explicit
    target dict — ``alpha=1`` keeps the natural mixture, ``alpha→0``
    approaches uniform. Solves the largest no-upsampling output that
    realizes the exponentiated shares (the :func:`target_mixture`
    solve), then hash-downsamples shuffle-free.

    Cross-engine determinism: each stratum weight ``(n_i/N)^alpha``
    is FIXED-POINTED at e12 before the normalizing sum, so the sum is
    an exact integer (order-free) and every downstream double — the
    share, the feasible output size, the keep rate, the 2^32 hash
    threshold — is a pure function of exact operands; the SQL twin in
    the driver gate replays the kept set row-for-row. NULL strata are
    excluded. Returns ``(sampled_df, rates)``.

    Capability analog in the reference: none — extension tier."""
    import math

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1] (got {alpha})")
    counts = {
        r[strata_col]: r["n"]
        for r in df.where(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        raise ValueError("temperature_mixture needs non-null strata")
    total = sum(counts.values())
    w_e12 = {
        s: math.floor((n / total) ** alpha * 1e12)
        for s, n in counts.items()
    }
    wsum = sum(w_e12.values())
    p = {s: w_e12[s] / wsum for s in counts}
    t_out = min(counts[s] / p[s] for s in counts if p[s] > 0)
    rates = {
        s: min(1.0, (p[s] * t_out) / counts[s]) if p[s] > 0 else 0.0
        for s in counts
    }
    return (
        stratified_sample(
            df.where(F.col(strata_col).isNotNull()), rates, strata_col,
            key=key, salt=salt, default_rate=0.0,
        ),
        rates,
    )


def deterministic_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    salt: str = "shuffle",
    num_shards: int | None = None,
    shard_col: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Reproducible global random order for training-data sharding.

    Orders rows by ``xxhash64(salt, key)`` — a fixed pseudo-random
    permutation of the keys, independent of input partitioning, run,
    and cluster size (the property ``orderBy(rand(seed))`` lacks:
    rand() is seeded per-partition, so a repartition reshuffles the
    "random" order). With ``num_shards``, shard MEMBERSHIP is a pure
    function of the key: the hash's signed order is mapped to unsigned
    (sign-bit flip) and equal-width-bucketed into ``num_shards`` cells
    — monotone in the sort order, so concatenating shards still yields
    the global permutation, and balanced because xxhash64 is uniform.
    Range boundaries SAMPLED from the data (what a bare
    ``repartitionByRange`` on the hash would pin shards to) would make
    shard contents drift across reruns at scale, where the reservoir
    sketch no longer sees every row. Pass ``shard_col`` to keep the
    shard id as an output column — writing with ``partitionBy`` on it
    gives byte-stable shard files regardless of executor layout.

    A second ``salt`` draws an independent permutation (fresh data
    order per training epoch without rewriting the corpus).

    ``tiebreak_cols`` extends the ordering BELOW (hash, key) for
    callers whose key is shared by several rows (e.g. every chunk of a
    pack shuffles as one unit): the hash/salt composition that decides
    both order and shard membership stays defined here, in one place,
    and the caller only names its intra-key order.
    """
    extra = [F.col(c) for c in (tiebreak_cols or [])]
    h = F.xxhash64(F.lit(salt), F.col(key).cast("string"))
    tagged = df.withColumn("__shuffle_h", h)
    if num_shards is not None:
        # signed→unsigned order, top 32 bits, scale to num_shards:
        # floor(t * k / 2^32) — monotone coarsening of the sort order
        u = F.col("__shuffle_h").bitwiseXOR(F.lit(-(2**63)))
        t = F.shiftrightunsigned(u, 32)
        shard = F.shiftright(t * F.lit(num_shards), 32).cast("int")
        tagged = (
            tagged.withColumn("__shard", shard)
            .repartitionByRange(num_shards, F.col("__shard"))
            .sortWithinPartitions(
                F.col("__shard"), F.col("__shuffle_h"), F.col(key), *extra
            )
        )
        if shard_col is not None:
            tagged = tagged.withColumn(shard_col, F.col("__shard"))
        tagged = tagged.drop("__shard")
    else:
        tagged = tagged.orderBy(F.col("__shuffle_h"), F.col(key), *extra)
    return tagged.drop("__shuffle_h")


def split_frame(
    df: DataFrame,
    weights: dict[str, float],
    key: str = "doc_id",
    salt: str = "split",
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive train/valid/test split by hash range.

    Ranges partition [0, 2^32): every row lands in exactly one split,
    stable under any layout — the property randomSplit lacks (its
    result depends on partitioning). Weights are normalized.
    """
    total = sum(weights.values())
    out: dict[str, DataFrame] = {}
    lo = 0.0
    b = _bucket(key, salt)
    names = list(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name] / total
        upper = F.lit("ffffffff") if i == len(names) - 1 else F.lit(_thr(hi))
        cond = (b >= F.lit(_thr(lo))) & (b < upper) if i < len(names) - 1 else (
            b >= F.lit(_thr(lo))
        )
        out[name] = df.where(cond)
        lo = hi
    return out


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    salt: str = "split",
    broadcast_pairs_limit: int = 1_000_000,
) -> dict[str, DataFrame]:
    """Train/valid/test split that near-duplicates cannot straddle.

    A hash split on ``doc_id`` puts one member of a near-dup pair in
    train and its twin in test — silent eval contamination (the model
    is scored on paraphrases of its training data). Here the split key
    is the document's dedup *cluster* (connected components over
    ``pairs``, the output of any pair generator in ``operators.dedup``),
    so every near-dup cluster lands whole in exactly one split.

    Cost on top of :func:`split_frame`: the components computation
    (bounded by the verified pair list, not the corpus) and ONE join of
    the corpus against the cluster map. The join's build side is the
    cluster assignment of *paired docs only* (singletons fall back to
    their own id via coalesce), so at corpus scale it normally stays a
    broadcast — count-gated (same contract as ``minhash_lsh_pairs``) so
    a pathologically duplicate-heavy corpus degrades to a hash join,
    never an executor OOM. Weights apply to clusters by hash range;
    with bounded cluster sizes the realized row split converges to the
    same proportions.
    """
    from .dedup import dedup_clusters

    pairs = pairs.persist()
    try:
        small = pairs.count() <= broadcast_pairs_limit
        # eager checkpoint materializes the (small) cluster map and cuts
        # its lineage to pairs, so the persist can be released HERE —
        # the returned lazy splits no longer reference it (a
        # long-running session would otherwise leak the cached blocks)
        clusters = dedup_clusters(
            pairs, all_ids=None, id_a=id_a, id_b=id_b, id_col=id_col
        ).localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
    hint = F.broadcast if small else (lambda d: d)
    keyed = (
        df.join(
            hint(clusters.select(id_col, "cluster_id")),
            on=id_col,
            how="left",
        )
        # singletons (in no pair) are their own cluster
        .withColumn("_split_key",
                    F.coalesce(F.col("cluster_id"), F.col(id_col)))
        .drop("cluster_id")
    )
    parts = split_frame(keyed, weights, key="_split_key", salt=salt)
    return {name: part.drop("_split_key") for name, part in parts.items()}


def per_group_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic k-per-group sample (eval-set construction: "k
    examples per language × source"): rows rank within their group by a
    salted content hash and the first k survive — stable across runs,
    layouts, and cluster sizes, where ``sampleBy`` fractions drift with
    partitioning and give no exact-k guarantee.

    One hash shuffle on the group key (the partitioned window); a
    skewed group costs its own size, never the corpus. A new ``salt``
    draws an independent sample. Ranking hashes are the module's
    cross-engine sha256 bucket (hex ordering == numeric ordering), so
    a SQL oracle replays the exact per-group selection.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(
        _bucket(key, salt), F.col(key)
    )
    return (
        df.withColumn("__gs_rn", F.row_number().over(w))
        .where(F.col("__gs_rn") <= k)
        .drop("__gs_rn")
    )


def weighted_sample(
    df: DataFrame,
    rate_col: str,
    key: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Per-row keep probability (importance sampling: e.g. keep docs
    with probability proportional to a quality score): row survives iff
    its content hash, mapped to [0, 1), falls below ``rate_col``. Same
    layout/run/engine stability contract as
    :func:`deterministic_sample`, still a shuffle-free codegen filter;
    rates outside [0, 1] clamp (≥1 always keeps, ≤0 always drops).
    """
    u = (
        F.conv(_bucket(key, salt), 16, 10).cast("double")
        / F.lit(float(_HEX_SPAN))
    )
    return df.where(u < F.col(rate_col).cast("double"))


def global_sample_k(
    df: DataFrame,
    k: int,
    key: str = "doc_id",
    salt: str = "ksample",
) -> DataFrame:
    """Exact-k uniform sample of the whole corpus, deterministically:
    the k rows with the smallest salted content hash (the module's
    cross-engine sha256 bucket — hex strings order exactly like their
    numeric values, so a SQL oracle replays the same k rows).
    Compiles to TakeOrderedAndProject — a per-partition k-heap merged
    at the driver, no global sort, no reservoir nondeterminism; a new
    salt redraws.
    """
    return (
        df.withColumn("__ks_h", _bucket(key, salt))
        .orderBy("__ks_h", key)
        .limit(k)
        .drop("__ks_h")
    )


def weighted_sample_k(
    df: DataFrame,
    logw_col: str,
    k: int,
    key: str = "doc_id",
    salt: str = "wksample",
) -> DataFrame:
    """Exact-k WEIGHTED sample without replacement, deterministically:
    the Gumbel-top-k trick — rank by ``log w + Gumbel(0,1)`` and take
    the top k, which draws exactly the weighted-without-replacement
    distribution (Vieira 2014 exposition of Gumbel-max). The Gumbel
    noise is a pure function of the module's cross-engine bucket hash
    of ``(salt, key)`` (sha256, like every other sampler here — NOT an
    engine-private hash), so the selection replays identically under
    any partitioning/layout (the module contract) AND a SQL oracle can
    re-derive the exact top-k; a new salt redraws. Compiles to
    TakeOrderedAndProject —
    per-partition k-heaps merged at the driver, no global sort. Rows
    with NULL ``logw_col`` or NULL ``key`` are never selected (NULL
    keys would all share one hash value, making the draw
    partition-order-dependent — the same reason the replay contract
    requires ``key`` to be UNIQUE: duplicate keys share identical
    Gumbel noise, so their draws are perfectly correlated and the
    deterministic tiebreak between them is arbitrary)."""
    # uniform in (0,1): the first 32 digest bits as an integer;
    # +1 / (2^32+2) keeps u strictly inside (0,1) so log(u) is finite.
    # Every term is exactly representable, so both engines compute
    # bit-identical u (the gumbel transform is then the same two libm
    # log calls on the same doubles)
    u = (
        F.conv(_bucket(key, salt), 16, 10).cast("double") + F.lit(1.0)
    ) / F.lit(float(_HEX_SPAN) + 2.0)
    gumbel = -F.log(-F.log(u))
    return (
        df.where(F.col(logw_col).isNotNull() & F.col(key).isNotNull())
        .withColumn("__wk", F.col(logw_col) + gumbel)
        .orderBy(F.col("__wk").desc(), F.col(key).asc())
        .limit(int(k))
        .drop("__wk")
    )
