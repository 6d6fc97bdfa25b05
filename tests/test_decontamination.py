"""Benchmark decontamination (13-gram overlap) vs a pure-Python oracle.

The oracle recomputes the published recipe — lowercase, strip
non-alnum, whitespace-split, word n-grams, any-overlap — row by row on
the collected sample, so the Spark implementation's normalization,
n-gram construction, hashing, and join shape are all under test.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from etl_workflow_spark.operators.text import (
    decontaminate,
    ngram_contamination,
)


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = re.sub(r"[^a-z0-9\s]", " ", text.lower()).split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


@pytest.mark.parametrize("n", [5, 13])
def test_matches_python_oracle(spark, docs, n):
    # Benchmark: excerpts of some real docs (guaranteed overlap) plus a
    # string that overlaps nothing.
    sample = [r["text"] for r in docs.orderBy("doc_id").limit(3).collect()]
    bench_rows = [(t[: len(t) // 2],) for t in sample] + [
        ("zz qq xx " * 40,)
    ]
    bench = spark.createDataFrame(bench_rows, ["text"])

    bench_grams: set[str] = set()
    for (t,) in bench_rows:
        bench_grams |= _py_ngrams(t, n)

    expected = {
        r["doc_id"]: len(_py_ngrams(r["text"], n) & bench_grams)
        for r in docs.collect()
    }
    got = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in ngram_contamination(docs, bench, n=n).collect()
    }
    assert got == expected
    assert any(v > 0 for v in got.values())  # the overlap actually fired


def test_decontaminate_drops_exactly_the_flagged(spark, docs):
    sample = [r["text"] for r in docs.orderBy("doc_id").limit(2).collect()]
    bench = spark.createDataFrame([(t,) for t in sample], ["text"])
    flagged = {
        r["doc_id"]
        for r in ngram_contamination(docs, bench, n=8)
        .filter("contaminated")
        .collect()
    }
    assert flagged  # full-text benchmark must flag its own sources
    clean_ids = {
        r["doc_id"] for r in decontaminate(docs, bench, n=8).collect()
    }
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert clean_ids == all_ids - flagged


def test_short_docs_are_never_contaminated(spark):
    docs = spark.createDataFrame(
        [(1, "only four words here"), (2, "")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([("only four words here",)], ["text"])
    out = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(docs, bench, n=13).collect()
    }
    # Both sides have < 13 words: no n-grams exist, nothing can match.
    assert out == {1: False, 2: False}


def test_benchmark_side_broadcasts(spark, docs):
    """Scale shape: the probe must be a broadcast join (the corpus
    side never shuffles to meet the benchmark)."""
    from etl_workflow_spark.plans import physical_plan

    bench = spark.createDataFrame([("a b c d e f g h i j k l m",)], ["text"])
    plan = physical_plan(ngram_contamination(docs, bench, n=13))
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------ LM-proxy score


def _py_norm_tokens(text):
    import re

    return [t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t]


def test_ngram_lm_score_matches_python_oracle(spark):
    """Exact parity with a hand-computed bigram log-frequency model."""
    import math
    from collections import Counter

    from etl_workflow_spark.operators.text import ngram_lm_counts, ngram_lm_score

    ref_texts = [
        "the cat sat on the mat",
        "the cat ran over the hill",
        "a dog sat on the mat",
    ]
    probe_texts = {
        1: "the cat sat quietly",          # mix of known/unknown bigrams
        2: "zx qv totally novel bigrams",  # all OOV
        3: "word",                         # < n words
    }
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], ["doc_id", "text"]
    )
    probe = spark.createDataFrame(
        list(probe_texts.items()), ["doc_id", "text"]
    )

    counts = Counter()
    for t in ref_texts:
        toks = _py_norm_tokens(t)
        counts.update(zip(toks, toks[1:]))

    expected = {}
    for i, t in probe_texts.items():
        toks = _py_norm_tokens(t)
        grams = list(zip(toks, toks[1:]))
        logs = [math.log(counts[g]) for g in grams if g in counts]
        oov = sum(1 for g in grams if g not in counts)
        expected[i] = (
            len(grams),
            math.floor(sum(logs) / len(logs) * 1e6) if logs else None,
            (oov * 1_000_000) // len(grams) if grams else 0,
        )

    lm = ngram_lm_counts(ref, n=2)
    got = {
        r.doc_id: (r.n_grams, r.avg_logfreq_e6, r.oov_ratio_e6)
        for r in ngram_lm_score(probe, lm, n=2).collect()
    }
    assert got == expected


def test_ngram_lm_score_separates_fluent_from_gibberish(spark, sf_dir):
    """Scoring the corpus against itself: real documents must score
    strictly better than shuffled-vocabulary gibberish."""
    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import ngram_lm_counts, ngram_lm_score

    docs = table(spark, sf_dir, "documents")
    lm = ngram_lm_counts(docs, n=2)

    fluent = ngram_lm_score(docs.limit(50), lm, n=2)
    import pyspark.sql.functions as F

    gibberish = docs.limit(50).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(
            " ", F.reverse(F.split(F.col("text"), r"\s+"))
        ).alias("text"),
    )
    g_score = ngram_lm_score(gibberish, lm, n=2)

    f_avg = fluent.agg(F.avg("oov_ratio_e6")).collect()[0][0]
    g_avg = g_score.agg(F.avg("oov_ratio_e6")).collect()[0][0]
    assert g_avg > f_avg, (f_avg, g_avg)


# --------------------------------------------------- corpus containment


def test_corpus_containment_python_oracle(spark):
    """Exact parity with a set-based Python computation, global and
    per-source."""
    from etl_workflow_spark.operators.text import corpus_containment

    a_texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
    ]
    b_rows = [
        (1, "the quick brown fox jumps high today", "s1"),
        (2, "entirely novel content nothing shared here at all", "s1"),
        (3, "pack my box with five dozen liquor jugs exactly", "s2"),
    ]
    A = spark.createDataFrame(
        [(i, t) for i, t in enumerate(a_texts)], ["doc_id", "text"]
    )
    B = spark.createDataFrame(b_rows, ["doc_id", "text", "source"])

    def grams(text, n=3):
        toks = text.lower().split()
        return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    ag = set().union(*(grams(t) for t in a_texts))

    # global
    bg = set().union(*(grams(t) for _, t, _ in b_rows))
    shared = len(bg & ag)
    row = corpus_containment(A, B).collect()[0]
    assert (row.n_grams_b, row.n_shared) == (len(bg), shared)
    assert row.containment_e6 == (shared * 1_000_000) // len(bg)

    # per source
    by_src = {}
    for _, t, s in b_rows:
        by_src.setdefault(s, set()).update(grams(t))
    got = {
        r.source: (r.n_grams_b, r.n_shared, r.containment_e6)
        for r in corpus_containment(A, B, group_col="source").collect()
    }
    for s, g in by_src.items():
        sh = len(g & ag)
        assert got[s] == (len(g), sh, (sh * 1_000_000) // len(g))
    # s2 is a superset-extension of an A document: high containment
    assert got["s2"][2] > got["s1"][2]


def test_corpus_containment_approx_tracks_exact(spark, sf_dir):
    """HLL tier must agree with the exact tier within sketch error on a
    real corpus split (overlap by construction: shared documents)."""
    from pyspark.sql import functions as F

    from etl_workflow_spark.catalog import table
    from etl_workflow_spark.operators.text import (
        corpus_containment,
        corpus_containment_approx,
    )

    docs = table(spark, sf_dir, "documents")
    A = docs.where(F.col("doc_id") % 3 != 2)         # 2/3 of corpus
    B = docs.where(F.col("doc_id") % 3 != 0)         # overlaps A on %3==1
    exact = corpus_containment(A, B).collect()[0]
    approx = corpus_containment_approx(A, B).collect()[0]

    assert exact.n_grams_b > 0 and exact.n_shared > 0
    # cardinalities within a few percent (lg_k=14 → ~0.8% std error)
    assert abs(approx.n_grams_b_est - exact.n_grams_b) / exact.n_grams_b < 0.05
    # containment within 5 points (subtraction amplifies sketch error)
    assert abs(approx.containment_e6 - exact.containment_e6) < 50_000


# ------------------------------------------- surgical span removal


def _surgical_oracle(text, bench_texts, n, margin):
    """Pure-Python twin of remove_contaminated_spans for one doc."""
    def norm(t):
        s = re.sub(r"[^a-z0-9]", "", t.lower())
        return s if s else t.lower()  # punct-only: no wildcard

    bench_grams = set()
    for b in bench_texts:
        bt = [norm(t) for t in b.split()]
        for i in range(len(bt) - n + 1):
            bench_grams.add(tuple(bt[i:i + n]))
    toks = text.split()
    hs = [norm(t) for t in toks]
    starts = [
        i for i in range(len(hs) - n + 1)
        if tuple(hs[i:i + n]) in bench_grams
    ]
    drop = set()
    for s in starts:
        drop.update(range(s - margin, s + n + margin))
    kept = [t for i, t in enumerate(toks) if i not in drop]
    if not starts:
        return text, 0  # untouched docs pass through byte-identical
    return " ".join(kept), len(toks) - len(kept)


@pytest.mark.parametrize("margin", [0, 2])
def test_remove_contaminated_spans_python_oracle(spark, margin):
    from etl_workflow_spark.operators.text import (
        remove_contaminated_spans,
    )

    bench = ["the secret answer is forty two exactly"]
    texts = {
        # punctuation INSIDE a token ("two,") normalizes away without
        # moving boundaries; a hyphenated merge ("forty-two") would NOT
        # match — that is the documented in-place-normalization contract
        1: ("intro words then The Secret answer IS forty two, exactly "
            "and the rest of the useful document keeps going fine"),
        2: "totally unrelated content   with  odd   spacing preserved",
        3: "short doc",
        4: "the secret answer is forty two exactly",  # whole doc
        5: None,
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    bdf = spark.createDataFrame([(t,) for t in bench], "text string")
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in remove_contaminated_spans(
            docs, bdf, n=6, margin=margin
        ).collect()
    }
    for k, v in texts.items():
        if v is None:
            assert out[k] == (None, 0)
        else:
            assert out[k] == _surgical_oracle(v, bench, 6, margin), k
    # doc 1 was surgically cut, not dropped; doc 2 kept raw spacing
    assert out[1][1] > 0 and "useful document" in out[1][0]
    assert out[2] == (texts[2], 0)
    assert out[4][0] == ""  # fully contaminated doc becomes empty


def test_remove_contaminated_spans_edge_contracts(spark):
    """The three empirically-found failure modes stay fixed:
    punct-only tokens are not wildcards, NULL/duplicate ids still get
    excised (hits key on (id, text)), and leading tabs neither create
    phantom tokens nor leak leading spaces into rebuilt text."""
    from etl_workflow_spark.operators.text import (
        remove_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [("price is 5 . see table one",),
         ("the secret answer is forty two",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            # ',' vs benchmark '.' at the aligned slot: NOT a match
            (1, "price is 5 , see table one ok"),
            # identical punct '.' IS a match -> excised
            (2, "price is 5 . see table one ok"),
            # NULL id still excised (key = (id, text))
            (None, "pad the secret answer is forty two tail"),
            # duplicate id, different texts: windows must not cross
            (7, "left the secret answer is forty two right"),
            (7, "nothing shared with any benchmark at all here now"),
            # leading tab: no phantom token, no leading space in rebuild
            (9, "\tthe secret answer is forty two tail words"),
        ],
        "doc_id int, text string",
    )
    rows = remove_contaminated_spans(docs, bench, n=6).collect()
    by_text = {r["text"]: r["n_removed_tokens"] for r in rows}
    assert by_text.get("price is 5 , see table one ok") == 0
    assert by_text.get("ok") == 7  # identical-punct doc excised
    assert by_text.get("pad tail") == 6  # NULL id excised
    assert by_text.get("left right") == 6  # dup id, right text excised
    assert by_text.get(
        "nothing shared with any benchmark at all here now"
    ) == 0
    assert by_text.get("tail words") == 6  # no leading space, no phantom
