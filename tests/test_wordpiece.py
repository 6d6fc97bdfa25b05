"""WordPiece tokenizer: trainer vs a naive full-rescore oracle,
greedy MaxMatch encode semantics, Spark/local parity, decode.

Reference analog: none — extension-tier tokenizer family #3 (BPE and
unigram are the other two). The naive oracle re-derives every merge by
recomputing pair and token counts from scratch with Fraction-exact
scores, so the production trainer's incremental bookkeeping and its
cross-multiplied integer comparisons are both checked independently.
"""
from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_workflow_spark.operators.text import (
    _make_wordpiece_encoder,
    learn_wordpiece,
    train_wordpiece,
    wordpiece_decode,
    wordpiece_encode,
)


def _naive_wordpiece(words, vocab_size, lowercase=True, min_pair_count=2):
    """Full-rescore reference trainer: independent arithmetic
    (Fraction-exact scores instead of cross-multiplication),
    independent merge application."""
    if lowercase:
        folded = {}
        for w, c in words:
            folded[w.lower()] = folded.get(w.lower(), 0) + int(c)
        words = list(folded.items())
    seqs = {w: [w[0], *("##" + ch for ch in w[1:])] for w, _ in words}
    wc = dict(words)
    vocab = ["[UNK]", *sorted({t for s in seqs.values() for t in s})]
    seen = set(vocab)
    while len(vocab) < vocab_size:
        pairs, toks = {}, {}
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
            for t in seq:
                toks[t] = toks.get(t, 0) + wc[w]
        if not pairs:
            break
        best, bs = None, None
        for p, c in pairs.items():
            # filter-and-continue, NOT break-on-rare-best: the score
            # c/(l*r) is maximized by rare pairs, so min_pair_count is
            # an eligibility filter (published semantics), never a
            # stopping rule (r11 bug: the first hapax pair halted
            # training; this oracle replicated it and so couldn't see
            # it)
            if c < min_pair_count:
                continue
            s = Fraction(c, toks[p[0]] * toks[p[1]])
            if best is None or s > bs or (s == bs and p < best):
                best, bs = p, s
        if best is None:
            break
        merged = best[0] + best[1][2:]
        if merged not in seen:
            vocab.append(merged)
            seen.add(merged)
        for w, seq in seqs.items():
            out, j = [], 0
            while j < len(seq):
                if (
                    j + 1 < len(seq)
                    and seq[j] == best[0]
                    and seq[j + 1] == best[1]
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seqs[w] = out
    return vocab


def test_learn_wordpiece_matches_naive_oracle():
    tables = [
        [("hugging", 5), ("hugs", 8), ("hug", 10), ("bug", 4), ("bun", 3)],
        [("aaa", 7), ("aab", 7), ("abb", 7)],  # engineered score ties
        [("x", 5)],  # single 1-char word: no pairs at all
        [("Mix", 2), ("mix", 3), ("MIX", 1)],  # case folding
    ]
    for words in tables:
        got = learn_wordpiece(words, vocab_size=25)
        want = _naive_wordpiece(words, vocab_size=25)
        assert got["vocab"] == want
        assert got["vocab"][0] == "[UNK]"


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_learn_wordpiece_matches_naive_oracle_random(words):
    for mpc in (1, 2):
        got = learn_wordpiece(words, vocab_size=30, min_pair_count=mpc)
        assert got["vocab"] == _naive_wordpiece(
            words, vocab_size=30, min_pair_count=mpc
        )


def test_learn_wordpiece_hapax_pairs_do_not_halt_training():
    """r12 regression (ADVICE): the hapax pairs ('zq', 'xv') have the
    best score c/(l*r) = 1/1, so the r11 trainer broke out of the
    merge loop immediately and learned ZERO merges under the default
    min_pair_count=2. With the filter-and-continue fix the frequent
    'hash*' family still merges."""
    words = [
        ("hashing", 50), ("hashed", 40), ("hash", 100),
        ("zq", 1), ("xv", 1),
    ]
    got = learn_wordpiece(words, vocab_size=40, min_pair_count=2)
    base = {"[UNK]"} | {
        t
        for w, _ in words
        for t in [w[0], *("##" + ch for ch in w[1:])]
    }
    merges = [t for t in got["vocab"] if t not in base]
    assert merges, "no merges learned — hapax pair halted training"
    # the hapax pairs themselves must never merge
    assert "zq" not in merges and "xv" not in merges
    # and the trainer agrees with the independently-fixed oracle
    assert got["vocab"] == _naive_wordpiece(
        words, vocab_size=40, min_pair_count=2
    )


def test_wordpiece_greedy_maxmatch_semantics():
    model = {
        "format": "spark-graft-wordpiece/v1",
        "vocab": ["[UNK]", "un", "##able", "unab", "##le", "a", "##b"],
        "lowercase": True,
        "unk": "[UNK]",
        "max_input_chars_per_word": 10,
    }
    enc = _make_wordpiece_encoder(model)
    # longest FIRST match wins even when it forces a worse tail:
    # 'unable' -> unab + ##le, never un + ##able
    assert enc("unable") == ["unab", "##le"]
    assert enc("ab") == ["a", "##b"]
    # no piece at some position -> the WHOLE word is [UNK]
    assert enc("unax") == ["[UNK]"]
    # over max_input_chars_per_word -> [UNK] wholesale
    assert enc("a" * 11) == ["[UNK]"]
    # lowercase recorded in the model is applied before matching
    assert enc("UNABLE") == ["unab", "##le"]
    # NULL/empty contract
    assert enc(None) is None
    assert enc("   ") == []
    # wrong-format models are refused driver-side
    with pytest.raises(ValueError, match="train_wordpiece"):
        _make_wordpiece_encoder({"format": "spark-graft-bpe/v1"})


def test_wordpiece_spark_matches_local(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(120)
    model = train_wordpiece(docs, vocab_size=200)
    assert model["vocab"][0] == "[UNK]"
    assert len(model["vocab"]) <= 200
    got = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_encode(docs, model).collect()
    }
    ids = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_encode(docs, model, ids=True).collect()
    }
    local = _make_wordpiece_encoder(model)
    to_id = {s: i for i, s in enumerate(model["vocab"])}
    for r in docs.collect():
        want = local(r["text"])
        assert got[r["doc_id"]] == want
        assert ids[r["doc_id"]] == [to_id[t] for t in want]
    # every emitted piece is a real vocab entry
    assert set().union(*got.values()) <= set(model["vocab"])


def test_wordpiece_decode_round_trips_in_vocab_text(spark):
    df = spark.createDataFrame(
        [(1, "the quick   brown fox"), (2, None), (3, "  ")],
        "doc_id long, text string",
    )
    model = train_wordpiece(df, vocab_size=100, min_pair_count=1)
    out = wordpiece_decode(
        wordpiece_encode(df, model), col="wp_tokens"
    ).collect()
    by_id = {r["doc_id"]: r["text_decoded"] for r in out}
    # lossy by design: whitespace normalizes to single spaces
    assert by_id[1] == "the quick brown fox"
    assert by_id[2] is None
    assert by_id[3] == ""
    # decode is codegen, not a Python UDF
    plan = (
        wordpiece_decode(wordpiece_encode(df, model), col="wp_tokens")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
