"""C4-style boilerplate line removal vs a pure-Python oracle."""

from __future__ import annotations

from collections import Counter

from etl_workflow_spark.operators.dedup import (
    boilerplate_lines,
    strip_boilerplate_lines,
)

BANNER = "Accept cookies to continue"
FOOTER = "(c) 2023 Example Corp - all rights reserved"

DOCS = [
    (1, f"{BANNER}\nThe quick brown fox.\n\n{FOOTER}"),
    (2, f"{BANNER}\nJumps over the lazy dog.\n{FOOTER}"),
    (3, f"{BANNER}\nA completely different body.\n{FOOTER}"),
    (4, "No boilerplate at all here.\nJust prose."),
    (5, f"{BANNER}\n{FOOTER}"),  # fully boilerplate -> empty text
    (6, f"  {BANNER}  \nIndented banner still counts (trim).")
]


def _py_strip(docs, min_docs):
    counts = Counter()
    for _, text in docs:
        seen = {ln.strip() for ln in text.split("\n") if ln.strip()}
        counts.update(seen)
    bp = {ln for ln, c in counts.items() if c >= min_docs}
    out = {}
    for did, text in docs:
        kept, removed = [], 0
        for ln in text.split("\n"):
            if ln.strip() and ln.strip() in bp:
                removed += 1
            else:
                kept.append(ln)
        out[did] = ("\n".join(kept), removed)
    return bp, out


def test_boilerplate_lines_counts_distinct_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["line"]: r["n_docs"] for r in boilerplate_lines(df, 3).collect()}
    assert got == {BANNER: 5, FOOTER: 4}


def test_strip_matches_python_oracle(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    _, want = _py_strip(DOCS, 3)
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in strip_boilerplate_lines(df, 3).collect()
    }
    assert got == want
    assert got[5][0] == ""  # fully-boilerplate doc survives, empty
    assert got[4] == (DOCS[3][1], 0)  # untouched doc byte-identical


def test_strip_on_real_corpus_is_conservative(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = strip_boilerplate_lines(docs, min_docs=2)
    assert out.count() == docs.count()  # every doc survives
    rows = [r["doc_id"] for r in out.collect()]
    assert len(rows) == len(set(rows))  # one row per doc


def test_duplicate_lines_within_one_doc_dont_flag(spark):
    df = spark.createDataFrame(
        [(1, "same line\nsame line\nsame line"), (2, "other")],
        ["doc_id", "text"],
    )
    assert boilerplate_lines(df, 2).count() == 0  # distinct DOCS, not lines


# ------------------------------------------------- paragraph-level dedup


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    """A repeated paragraph survives only at its first (doc_id, pos)
    occurrence; order and empty paragraphs are preserved."""
    from etl_workflow_spark.operators.dedup import dedup_paragraphs

    shared = "this exact paragraph repeats across documents verbatim"
    docs = spark.createDataFrame(
        [
            (1, f"intro one\n\n{shared}\n\noutro one"),
            (2, f"{shared}\n\nunique two"),
            (3, f"unique three\n\n{shared}\n\n{shared}"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}

    assert out[1].text == f"intro one\n\n{shared}\n\noutro one"
    assert out[1].n_paras_removed == 0
    assert out[2].text == "unique two"
    assert out[2].n_paras_removed == 1
    assert out[3].text == "unique three"
    assert out[3].n_paras_removed == 2


def test_dedup_paragraphs_python_oracle(spark):
    """Exact parity with a sequential keep-first-seen pass."""
    import random

    from etl_workflow_spark.operators.dedup import dedup_paragraphs

    rnd = random.Random(5)
    pool = [f"paragraph number {i} with some words" for i in range(12)]
    rows = []
    for d in range(30):
        paras = [rnd.choice(pool) for _ in range(rnd.randrange(1, 6))]
        rows.append((d, "\n\n".join(paras)))

    seen = set()
    expected = {}
    for d, text in rows:  # rows are already in doc_id order
        kept, removed = [], 0
        for p in text.split("\n\n"):
            key = p.strip()
            if key and key in seen:
                removed += 1
                continue
            if key:
                seen.add(key)
            kept.append(p)
        expected[d] = ("\n\n".join(kept), removed)

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.text, r.n_paras_removed)
        for r in dedup_paragraphs(docs).collect()
    }
    assert got == expected


def test_dedup_paragraphs_literal_separator_and_null_text(spark):
    """The separator is literal (regex metacharacters must not split
    per-character) and NULL-text documents survive with NULL text."""
    from etl_workflow_spark.operators.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta||gamma delta"),
            (2, "gamma delta||unique two"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs, sep="||").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].text == "alpha beta||gamma delta"
    assert out[2].text == "unique two"
    assert out[2].n_paras_removed == 1
    assert out[3].text is None
    assert out[3].n_paras_removed == 0
