"""Deterministic sampling: content-stable membership (invariant under
repartitioning), per-stratum rates, disjoint+exhaustive splits, and the
PII scrub's placeholder semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_workflow_spark.operators import sampling as samp
from etl_workflow_spark.operators.text import redact_pii


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_stable_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r[0] for r in samp.deterministic_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r[0]
        for r in samp.deterministic_sample(docs.repartition(13), 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_sample_salt_draws_independent_sets(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r[0] for r in samp.deterministic_sample(docs, 0.5, salt="a").select("doc_id").collect()}
    b = {r[0] for r in samp.deterministic_sample(docs, 0.5, salt="b").select("doc_id").collect()}
    assert a != b  # same rate, different draw


def test_stratified_rates_apply_per_group(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = samp.stratified_sample(
        docs, rates={"en": 0.0, "zh": 1.0}, strata_col="lang", default_rate=0.0
    )
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {"zh"}
    n_zh = docs.where(F.col("lang") == "zh").count()
    assert out.count() == n_zh  # rate 1.0 keeps every row of the stratum


def test_split_frame_disjoint_and_exhaustive(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    splits = samp.split_frame(docs, {"train": 0.8, "valid": 0.1, "test": 0.1})
    ids = {k: {r[0] for r in v.select("doc_id").collect()} for k, v in splits.items()}
    all_ids = {r[0] for r in docs.select("doc_id").collect()}
    assert ids["train"] | ids["valid"] | ids["test"] == all_ids
    assert not (ids["train"] & ids["valid"])
    assert not (ids["train"] & ids["test"])
    assert not (ids["valid"] & ids["test"])
    # rough proportions (hash-uniform; generous tolerance for 500 docs)
    assert len(ids["train"]) > 0.6 * len(all_ids)


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or see https://x.io/p?q=1 now"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["redacted"] == "mail me at <EMAIL> or see <URL> now"
    assert (got[1]["n_emails"], got[1]["n_urls"]) == (1, 1)
    assert got[2]["redacted"] == "no pii here"
    assert (got[2]["n_emails"], got[2]["n_urls"]) == (0, 0)


def test_target_mixture_hits_proportions(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    targets = {"en": 0.5, "zh": 0.25, "es": 0.25}
    out, rates = samp.target_mixture(docs, targets, "lang")
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) <= set(targets)
    total = sum(counts.values())
    assert total > 0
    # binding stratum kept (almost) whole; every rate feasible
    assert max(rates.values()) <= 1.0
    assert any(r > 0.95 for r in rates.values())
    # achieved shares within hash-sampling tolerance of the target
    for lang, share in targets.items():
        assert abs(counts.get(lang, 0) / total - share) < 0.12


def test_target_mixture_drops_unnamed_strata(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out, _ = samp.target_mixture(docs, {"en": 1.0}, "lang")
    assert out.where(F.col("lang") != "en").count() == 0


def test_target_mixture_missing_stratum_raises(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        samp.target_mixture(docs, {"xx_not_a_lang": 1.0}, "lang")


def test_deterministic_shuffle_stable_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    a = [r["doc_id"] for r in samp.deterministic_shuffle(docs).collect()]
    b = [
        r["doc_id"]
        for r in samp.deterministic_shuffle(docs.repartition(7)).collect()
    ]
    assert a == b  # same global order regardless of input layout
    assert a != sorted(a)  # and it is actually permuted


def test_deterministic_shuffle_salt_changes_order(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    a = [r["doc_id"] for r in samp.deterministic_shuffle(docs, salt="e1").collect()]
    b = [r["doc_id"] for r in samp.deterministic_shuffle(docs, salt="e2").collect()]
    assert sorted(a) == sorted(b)
    assert a != b


def test_deterministic_shuffle_sharded_keeps_total_order(spark, sf_dir):
    """num_shards path: concatenating shards in partition order yields
    the same sequence as the global sort."""
    docs = _docs(spark, sf_dir).select("doc_id")
    want = [r["doc_id"] for r in samp.deterministic_shuffle(docs).collect()]
    sharded = samp.deterministic_shuffle(docs, num_shards=5)
    # collect() preserves partition order then intra-partition order
    got = [r["doc_id"] for r in sharded.collect()]
    assert got == want


def test_leakage_safe_split_keeps_clusters_whole(spark, sf_dir):
    """No near-dup pair may straddle splits, and the split must stay
    disjoint + exhaustive over the corpus."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.dedup import minhash_lsh_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    parts = samp.leakage_safe_split(
        docs, pairs, {"train": 0.8, "valid": 0.1, "test": 0.1}
    )

    assignment: dict[int, str] = {}
    for name, part in parts.items():
        for r in part.select("doc_id").collect():
            assert r.doc_id not in assignment, "splits overlap"
            assignment[r.doc_id] = name
    assert len(assignment) == docs.count(), "split not exhaustive"
    assert parts["train"].columns == docs.columns, "helper columns leaked"

    pair_rows = pairs.collect()
    assert pair_rows, "fixture must contain near-dup pairs"
    for r in pair_rows:
        assert assignment[r.doc_a] == assignment[r.doc_b], (
            f"near-dup pair ({r.doc_a},{r.doc_b}) straddles "
            f"{assignment[r.doc_a]}/{assignment[r.doc_b]}"
        )


def test_leakage_safe_split_transitive_clusters(spark):
    """Chained pairs (a-b, b-c) must land whole: the split key is the
    connected component, not the pair."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2, 9000), (2, 3, 9000), (50, 51, 9000)],
        ["doc_a", "doc_b", "jaccard_e4"],
    )
    parts = samp.leakage_safe_split(docs, pairs, {"a": 0.5, "b": 0.5})
    where = {}
    for name, part in parts.items():
        for r in part.select("doc_id").collect():
            where[r.doc_id] = name
    assert where[1] == where[2] == where[3]
    assert where[50] == where[51]
    assert len(where) == 100


def test_deterministic_shuffle_shard_membership_is_pure(spark, sf_dir):
    """Shard id must be a function of the key alone — identical across
    reruns and input layouts (a range exchange pinned to SAMPLED
    boundaries would drift at scale)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    a = {
        r.doc_id: r.shard
        for r in samp.deterministic_shuffle(
            docs, num_shards=5, shard_col="shard"
        ).collect()
    }
    b = {
        r.doc_id: r.shard
        for r in samp.deterministic_shuffle(
            docs.repartition(11), num_shards=5, shard_col="shard"
        ).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(5))


def test_per_group_sample_exact_k_and_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = samp.per_group_sample(docs, ["lang"], k=5)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(5, full[lang])
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in samp.per_group_sample(
            docs.repartition(13), ["lang"], k=5
        ).select("doc_id").collect()
    }
    assert a == b, "sample must be layout-independent"
    c = {
        r.doc_id
        for r in samp.per_group_sample(docs, ["lang"], k=5, salt="other")
        .select("doc_id").collect()
    }
    assert c != a, "a new salt must draw a different sample"


def test_weighted_sample_tracks_rate_and_is_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn(
        "keep_rate", F.when(F.col("doc_id") % 2 == 0, 0.9).otherwise(0.1)
    )
    out = samp.weighted_sample(docs, "keep_rate")
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    evens = {r.doc_id for r in docs.where("doc_id % 2 = 0").collect()}
    odds = {r.doc_id for r in docs.where("doc_id % 2 = 1").collect()}
    # high-rate stratum keeps far more than the low-rate one
    assert len(kept & evens) / len(evens) > 0.7
    assert len(kept & odds) / len(odds) < 0.3
    again = {
        r.doc_id
        for r in samp.weighted_sample(
            docs.repartition(9), "keep_rate"
        ).select("doc_id").collect()
    }
    assert again == kept
    # clamping: rate 1.0 keeps everything, 0.0 drops everything
    allkeep = docs.withColumn("keep_rate", F.lit(1.0))
    assert samp.weighted_sample(allkeep, "keep_rate").count() == docs.count()
    nokeep = docs.withColumn("keep_rate", F.lit(0.0))
    assert samp.weighted_sample(nokeep, "keep_rate").count() == 0


def test_global_sample_k_exact_and_plan(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = samp.global_sample_k(docs, 17)
    rows = {r.doc_id for r in out.collect()}
    assert len(rows) == 17
    again = {
        r.doc_id
        for r in samp.global_sample_k(docs.repartition(5), 17).collect()
    }
    assert again == rows
    assert rows != {
        r.doc_id
        for r in samp.global_sample_k(docs, 17, salt="other").collect()
    }
    plan = samp.global_sample_k(docs, 17)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, "must not global-sort"


def test_weighted_sample_k_contract(spark):
    """Gumbel-top-k exact-k weighted sampling: deterministic per salt,
    layout-invariant, exactly k rows, NULL weights never selected, and
    heavily-weighted rows dominate the draw."""
    from etl_workflow_spark.operators.sampling import weighted_sample_k

    import math

    rows = [(i, math.log(10000.0) if i < 20 else 0.0) for i in range(200)]
    rows.append((900, None))
    df = spark.createDataFrame(rows, "doc_id long, logw double")
    got = weighted_sample_k(df, "logw", 20, key="doc_id", salt="a")
    ids = {r["doc_id"] for r in got.collect()}
    assert len(ids) == 20 and 900 not in ids
    # 20 rows at weight 10000 vs 180 at weight 1: heavy rows dominate
    assert len([i for i in ids if i < 20]) >= 18
    # deterministic + layout-invariant
    again = {r["doc_id"] for r in weighted_sample_k(
        df.repartition(17), "logw", 20, key="doc_id", salt="a"
    ).collect()}
    assert again == ids
    # a new salt redraws (checked on the equal-weight subset — at
    # weight ratio 10000 the top-20 is the heavy set under any salt)
    light = df.where("doc_id >= 20 and doc_id < 900")
    la = {r["doc_id"] for r in weighted_sample_k(
        light, "logw", 20, key="doc_id", salt="a").collect()}
    lb = {r["doc_id"] for r in weighted_sample_k(
        light, "logw", 20, key="doc_id", salt="b").collect()}
    assert la != lb
    # schema passes through unchanged (helper column dropped)
    assert got.columns == ["doc_id", "logw"]
    # NULL keys never selected (all NULL keys share one hash value, so
    # selection among them would be partition-order-dependent)
    with_null_keys = df.union(
        spark.createDataFrame(
            [(None, math.log(10000.0))] * 5, "doc_id long, logw double"
        )
    )
    nk = {r["doc_id"] for r in weighted_sample_k(
        with_null_keys, "logw", 20, key="doc_id", salt="a"
    ).collect()}
    assert nk == ids and None not in nk


def test_temperature_mixture_flattens_skew(spark):
    """Temperature sampling (r12): alpha=1 keeps the natural mixture
    (every stratum whole); smaller alpha flattens the head — the
    dominant stratum is downsampled hardest; alpha near 0 approaches
    uniform; the kept set is layout-invariant and salt-dependent;
    rates replay the documented closed form."""
    import math

    from etl_workflow_spark.operators.sampling import temperature_mixture

    rows = (
        [(i, "en") for i in range(900)]
        + [(i + 1000, "fr") for i in range(90)]
        + [(i + 2000, "is") for i in range(10)]
        + [(9999, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    full, rates1 = temperature_mixture(df, "lang", alpha=1.0)
    assert rates1 == {"en": 1.0, "fr": 1.0, "is": 1.0}
    assert full.count() == 1000  # NULL stratum excluded, rest whole

    samp, rates = temperature_mixture(df, "lang", alpha=0.5)
    # rarest stratum binds: kept whole; head downsampled hardest
    assert rates["is"] == 1.0
    assert rates["en"] < rates["fr"] < 1.0
    # replay the closed form: e12 fixed-point weights -> exact shares
    w = {s: math.floor((n / 1000) ** 0.5 * 1e12)
         for s, n in (("en", 900), ("fr", 90), ("is", 10))}
    ws = sum(w.values())
    p = {s: w[s] / ws for s in w}
    t_out = min(n / p[s] for s, n in (("en", 900), ("fr", 90), ("is", 10)))
    for s, n in (("en", 900), ("fr", 90), ("is", 10)):
        assert rates[s] == min(1.0, (p[s] * t_out) / n)
    # layout invariance + different salt -> different draw
    a = {r["doc_id"] for r in samp.collect()}
    b = {r["doc_id"] for r in temperature_mixture(
        df.repartition(7), "lang", alpha=0.5)[0].collect()}
    assert a == b
    c = {r["doc_id"] for r in temperature_mixture(
        df, "lang", alpha=0.5, salt="other")[0].collect()}
    assert c != a
    # observed mixture is flatter than natural (en share drops)
    from collections import Counter

    got = Counter(r["lang"] for r in samp.collect())
    assert got["en"] / sum(got.values()) < 0.9

    import pytest as _pt

    with _pt.raises(ValueError, match="alpha"):
        temperature_mixture(df, "lang", alpha=0.0)
    with _pt.raises(ValueError, match="non-null"):
        temperature_mixture(
            spark.createDataFrame([(1, None)], "doc_id long, lang string"),
            "lang",
        )
