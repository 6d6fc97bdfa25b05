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
