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


# ------------------------------------------------------- span-level dedup


def _span_dedup_oracle(rows, L):
    """Sequential reference: windows of L tokens keyed by content;
    every occurrence except the global min (doc_id, pos) loses its
    covered tokens."""
    occ = {}
    toks = {}
    for d, text in rows:
        if text is None:
            continue
        t = text.split(" ")
        toks[d] = t
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p:p + L]), []).append((d, p))
    removed = {}
    for places in occ.values():
        if len(places) < 2:
            continue
        keep = min(places)
        for d, p in places:
            if (d, p) != keep:
                removed.setdefault(d, set()).update(range(p, p + L))
    out = {}
    for d, text in rows:
        if d in removed:
            kept = [t for i, t in enumerate(toks[d]) if i not in removed[d]]
            out[d] = (" ".join(kept), len(removed[d]))
        else:
            out[d] = (text, 0)
    return out


def test_dedup_spans_python_oracle(spark):
    """Exact parity with the sequential reference, including within-doc
    repeats, overlapping windows, short docs, and NULL text."""
    from etl_workflow_spark.operators.dedup import dedup_spans

    rows = [
        (1, "a b c d e f"),                    # winner of the shared span
        (2, "x y a b c d e z"),                # loses the 5-token span
        (3, "q w e r t"),                      # unique
        (4, None),                             # must survive as NULL
        (5, "a b"),                            # shorter than a window
        (6, "p q r s p q r s"),                # within-doc repeat
        (7, "x y a b c d e z"),                # full duplicate of 2
    ]
    expected = _span_dedup_oracle(rows, 3)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in dedup_spans(docs, min_tokens=3).collect()
    }
    assert got == expected
    # the winner's text is byte-identical, not re-joined
    assert got[1][0] == "a b c d e f" and got[1][1] == 0
    assert got[4] == (None, 0)


def test_dedup_spans_randomized_oracle(spark):
    import random

    from etl_workflow_spark.operators.dedup import dedup_spans

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(20)]
    shared = [rnd.choice(vocab) for _ in range(6)]
    rows = []
    for d in range(40):
        t = [rnd.choice(vocab) for _ in range(rnd.randrange(2, 15))]
        if rnd.random() < 0.4:
            at = rnd.randrange(0, len(t) + 1)
            t = t[:at] + shared + t[at:]
        rows.append((d, " ".join(t)))
    expected = _span_dedup_oracle(rows, 4)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in dedup_spans(docs, min_tokens=4).collect()
    }
    assert got == expected


def test_dedup_spans_fully_removed_doc_keeps_empty_text(spark):
    from etl_workflow_spark.operators.dedup import dedup_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in dedup_spans(docs, min_tokens=3).collect()
    }
    assert got[1] == ("a b c", 0)
    assert got[2] == ("", 3)


def test_gopher_quality_flags_rules(spark):
    """Published Gopher page rules (r12): each rule is exercised in
    both directions with hand-built pages; NULL text yields NULL
    metrics and a NULL verdict (unknown, not false)."""
    from etl_workflow_spark.operators.text import gopher_quality_flags

    good_line = (
        "The old system and the new system have to work with the data."
    )
    pages = [
        (1, "\n".join([good_line] * 5)),           # passes everything
        (2, "word " * 30),                          # too few words < 50
        (3, "\n".join(["- item one of the list"] * 60)),  # all bullets
        (4, "\n".join([good_line] * 4 + ["trails off the page..."] * 4)),
        (5, "#### #### " * 30),                     # symbol-heavy
        (6, None),                                  # NULL text
        (7, ""),                                    # empty text
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["passes_gopher"] is True
    assert out[1]["n_required_stops"] >= 2
    # 65 words, 5 non-empty lines, no bullets/ellipses
    assert out[1]["n_words"] == 65
    assert out[1]["bullet_line_ratio_e4"] == 0
    assert out[2]["passes_gopher"] is False          # word count
    assert out[3]["passes_gopher"] is False          # bullet ratio
    assert out[3]["bullet_line_ratio_e4"] == 10000
    assert out[4]["passes_gopher"] is False          # ellipsis lines
    assert out[4]["ellipsis_line_ratio_e4"] == 5000
    assert out[5]["passes_gopher"] is False          # symbols + stops
    assert out[5]["alpha_word_ratio_e4"] == 0
    assert out[6]["passes_gopher"] is None
    assert out[6]["n_words"] is None
    assert out[7]["n_words"] == 0
    assert out[7]["passes_gopher"] is False


def test_c4_line_filter_rules(spark):
    """C4 line/page cleanup (r12): terminal-punctuation and min-words
    line rules (paper default: 5 words — r13 ADVICE fix), the
    javascript line rule, lorem-ipsum / brace page drops, the >= 3
    surviving-lines page rule, NULL propagation, and the threshold
    parameters."""
    from etl_workflow_spark.operators.text import c4_line_filter

    keep1 = "This line ends with a period and has many words."
    keep2 = "Does this line survive the filter?"
    keep3 = 'He said the quote ends here: "done."'
    four = "Just four terminated words."              # < paper's 5
    pages = [
        (1, "\n".join([
            keep1,
            "no terminal punctuation here",
            four,
            "This one mentions javascript libraries everywhere.",
            keep2,
            keep3,
        ])),
        (2, f"{keep1}\n{keep2}"),                    # only 2 survive
        (3, f"{keep1}\n{keep2}\n{keep3}\nlorem ipsum dolor."),
        (4, keep1 + " {code block}\n" + keep2 + "\n" + keep3),
        (5, None),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["dropped"] is False
    assert out[1]["n_lines"] == 6 and out[1]["n_kept"] == 3
    assert out[1]["kept_text"] == "\n".join([keep1, keep2, keep3])
    assert out[2]["dropped"] is True                 # < 3 kept lines
    assert out[2]["kept_text"] is None
    assert out[3]["dropped"] is True                 # lorem ipsum
    assert out[4]["dropped"] is True                 # brace
    assert out[5]["dropped"] is None
    assert out[5]["kept_text"] is None
    # parameterized thresholds: at min_words=3 (the pre-r13 value) the
    # 4-word line survives page 1's cut; at min_lines=4 page 1 drops
    relaxed = {
        r["doc_id"]: r
        for r in c4_line_filter(df, min_words=3).collect()
    }
    assert relaxed[1]["n_kept"] == 4
    assert four in relaxed[1]["kept_text"]
    strict = {
        r["doc_id"]: r
        for r in c4_line_filter(df, min_lines=4).collect()
    }
    assert strict[1]["dropped"] is True


def test_page_filters_match_duckdb_oracle(spark):
    """The crafted edge pages replay bit-for-bit through the DuckDB
    twins (the driver gate only sees the corpus + probe docs; this
    pins the rule edges)."""
    import duckdb

    from etl_workflow_spark.operators.text import (
        c4_line_filter,
        c4_line_filter_oracle,
        gopher_quality_flags,
        gopher_quality_flags_oracle,
    )

    pages = [
        (1, "The old system and the new system have to work.\n" * 60),
        (2, "- bullet\n- bullet\nProse line with the usual words."),
        (3, "ends with dots...\nstill counts the line.\nThird one."),
        (4, None),
        (5, ""),
        (6, "word " * 55 + "the of and."),
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in pages)
        + ") v(doc_id, text)",
        [x for row in pages for x in row],
    )
    for op, oracle in (
        (gopher_quality_flags, gopher_quality_flags_oracle),
        (c4_line_filter, c4_line_filter_oracle),
    ):
        got = {
            r["doc_id"]: tuple(r)
            for r in op(df).collect()
        }
        want = {
            r[0]: tuple(r)
            for r in con.execute(oracle(table="pages")).fetchall()
        }
        assert got == want, op.__name__
    # non-default thresholds travel to BOTH engines (r13)
    got = {
        r["doc_id"]: tuple(r)
        for r in c4_line_filter(df, min_words=3, min_lines=2).collect()
    }
    want = {
        r[0]: tuple(r)
        for r in con.execute(
            c4_line_filter_oracle(table="pages", min_words=3, min_lines=2)
        ).fetchall()
    }
    assert got == want
