"""Text-analysis operators for large-scale training-data pipelines.

The reference's only text hook is the trigram GIN index on
``products.name`` (``database-schema.sql:5,64``) — capability, not a
query. These operators provide the text surface a 100 TB document
pipeline needs: token counting, quality scoring, language ID, and
document fingerprinting — all as narrow, shuffle-free projections of
built-in JVM functions (no Python in the hot path), so they scale
linearly with input splits.

Every function has a DuckDB oracle twin built from the same primitive
semantics (split on single space, lower(), literal stopword lists) so
the correctness gate can hash-compare results.
"""

from __future__ import annotations

import math
import re as _re_mod
import zlib as _zlib_mod

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword lists per language for the n-gram/stopword-hit heuristic.
# Deliberately tiny and literal so Spark and the SQL oracle agree.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "des"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = LANG_MARKERS["en"]


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (JVM-side regex split, empty-safe)."""
    return F.split(F.trim(F.col(col)), r"\s+")


def _sql_tokens(col: str = "text") -> str:
    return f"string_split_regex(trim({col}), '\\s+')"


def _n_tokens(col: str) -> Column:
    """Empty-safe whitespace token count (split of "" yields [""])."""
    return F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def _passes_quality(col: str) -> Column:
    """The quality verdict shared by text_quality and text_profile."""
    toks = tokens(col)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS_EN)))
    avg_word_len = F.round(
        (F.length(F.regexp_replace(F.col(col), r"\s+", "")) / n_tok), 4
    )
    return (
        (n_tok >= F.lit(5))
        & (avg_word_len.between(2.0, 12.0))
        & (stop_hits / n_tok >= F.lit(0.01))
    )


def _lang_pred(col: str) -> Column:
    """Argmax language prediction shared by lang_id and text_profile."""
    toks = tokens(col)
    codes = sorted(LANG_MARKERS)

    def marker_filter(markers: tuple[str, ...]):
        return lambda w: F.lower(w).isin(*markers)

    hits = {
        c: F.size(F.filter(toks, marker_filter(LANG_MARKERS[c]))) for c in codes
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for c in reversed(codes):
        pred = F.when(hits[c] == best, F.lit(c)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def token_count(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate is the classic chars/4 heuristic plus one per
    token boundary — deterministic, no tokenizer dependency, and a
    reasonable budget proxy for LLM-pipeline sizing.
    """
    n_tok = _n_tokens(col)
    return df.select(
        F.col(id_col),
        n_tok.cast("int").alias("n_tokens"),
        (F.ceil(F.length(F.col(col)) / F.lit(4)) + n_tok).cast("int").alias("n_subwords_est"),
        F.length(F.col(col)).cast("int").alias("n_chars_actual"),
    )


def token_count_oracle(table: str = "documents") -> str:
    t = _sql_tokens("text")
    return f"""
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len({t}) END AS INT) AS n_tokens,
               CAST(CAST(ceil(length(text) / 4.0) AS BIGINT)
                    + (CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len({t}) END) AS INT) AS n_subwords_est,
               CAST(length(text) AS INT) AS n_chars_actual
        FROM {table}
    """


def text_quality(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality heuristics: length, word stats, stopword & punctuation
    ratios, alpha ratio — the standard pre-training filter features
    (C4/Gopher-style), all as built-in expressions.

    Ratio outputs are BIGINT fixed-point in 1e-4 units computed with
    truncating integer division of exact integer counts — identical in
    Spark (DIV) and DuckDB (//), unlike ``round(double, 4)`` whose
    half-way semantics differ across engines (the r3/r4 hash-fails).
    """
    toks = tokens(col)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS_EN)))
    n_chars = F.length(F.col(col))
    n_alpha = F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?]", ""))
    n_nospace = F.length(F.regexp_replace(F.col(col), r"\s+", ""))
    # integer counts first, fixed-point DIV second: both operands are
    # non-negative BIGINTs, so truncating DIV (Spark) and floor //
    # (DuckDB) agree bit-for-bit; NULLIF guards ANSI div-by-zero on
    # degenerate empty text (NULL on both engines)
    d = df.select(
        F.col(id_col),
        n_chars.cast("int").alias("n_chars"),
        n_tok.cast("int").alias("n_words"),
        stop_hits.cast("bigint").alias("_sh"),
        n_punct.cast("bigint").alias("_np"),
        n_alpha.cast("bigint").alias("_na"),
        n_nospace.cast("bigint").alias("_ns"),
        _passes_quality(col).alias("passes_quality"),
    )
    return d.select(
        id_col,
        "n_chars",
        "n_words",
        F.expr(
            "CAST((_ns * 10000) DIV NULLIF(CAST(n_words AS BIGINT), 0)"
            " AS BIGINT)"
        ).alias("avg_word_len_e4"),
        F.expr(
            "CAST((_sh * 10000) DIV NULLIF(CAST(n_words AS BIGINT), 0)"
            " AS BIGINT)"
        ).alias("stopword_ratio_e4"),
        F.expr(
            "CAST((_np * 10000) DIV NULLIF(CAST(n_chars AS BIGINT), 0)"
            " AS BIGINT)"
        ).alias("punct_ratio_e4"),
        F.expr(
            "CAST((_na * 10000) DIV NULLIF(CAST(n_chars AS BIGINT), 0)"
            " AS BIGINT)"
        ).alias("alpha_ratio_e4"),
        "passes_quality",
    )


def text_profile(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-scan per-document text profile: language prediction, quality
    verdict, and token count fused into a SINGLE projection.

    Running ``lang_id`` + ``text_quality`` + ``token_count`` separately
    and joining costs three corpus scans plus two shuffles; at 100 TB
    the fused form is the difference between one pass and three. The
    expressions are the same builders the individual operators use, so
    the semantics cannot drift.
    """
    return df.select(
        F.col(id_col),
        _lang_pred(col).alias("lang_pred"),
        _passes_quality(col).alias("passes_quality"),
        _n_tokens(col).cast("int").alias("n_tokens"),
    )


def text_quality_oracle(table: str = "documents") -> str:
    t = _sql_tokens("text")
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
        WITH q AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({t}) AS n_words,
                   round(length(regexp_replace(text, '\\s+', '', 'g'))
                         / CAST(len({t}) AS DOUBLE), 4) AS avg_word_len,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                        AS BIGINT) AS n_nospace,
                   CAST(len(list_filter({t}, w -> lower(w) IN ({stop_list})))
                        AS BIGINT) AS stop_hits,
                   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                        AS BIGINT) AS n_punct,
                   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        AS BIGINT) AS n_alpha
            FROM {table}
        )
        SELECT doc_id,
               CAST(n_chars AS INT) AS n_chars,
               CAST(n_words AS INT) AS n_words,
               CAST((n_nospace * 10000)
                    // NULLIF(CAST(n_words AS BIGINT), 0) AS BIGINT)
                   AS avg_word_len_e4,
               CAST((stop_hits * 10000)
                    // NULLIF(CAST(n_words AS BIGINT), 0) AS BIGINT)
                   AS stopword_ratio_e4,
               CAST((n_punct * 10000)
                    // NULLIF(CAST(n_chars AS BIGINT), 0) AS BIGINT)
                   AS punct_ratio_e4,
               CAST((n_alpha * 10000)
                    // NULLIF(CAST(n_chars AS BIGINT), 0) AS BIGINT)
                   AS alpha_ratio_e4,
               (n_words >= 5 AND avg_word_len BETWEEN 2.0 AND 12.0
                AND stop_hits / CAST(n_words AS DOUBLE) >= 0.01) AS passes_quality
        FROM q
    """


def normalize_text(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
) -> DataFrame:
    """Unicode + whitespace normalization — the canonical first step
    of a text pipeline (one representation per grapheme before any
    hashing, dedup, or tokenization; NFC is the W3C/WHATWG default):

    1. Unicode-normalize to ``form`` (NFC/NFKC/NFD/NFKD) — the ONE
       Python step (Arrow-batched ``pandas_udf`` over stdlib
       ``unicodedata``; Spark has no built-in normalizer), everything
       else is JVM codegen;
    2. strip C0/C1 control characters (keeping tab + newline);
    3. collapse space/tab runs to one space;
    4. collapse 3+ newline runs to exactly two (paragraph breaks
       survive, vertical noise dies);
    5. trim outer whitespace.

    Returns ``(id, text_norm, changed)`` with NULL-propagating
    ``changed`` (NULL text → NULL, not false). The DuckDB twin
    (:func:`normalize_text_oracle`) replays NFC via utf8proc's
    ``nfc_normalize`` — parity across the unicodedata/utf8proc pair
    is pinned by pytest fixtures (composed/decomposed é, combining
    marks, ligatures untouched under NFC); only NFC has a DuckDB
    replay, the other forms are pytest-tier.

    Capability analog in the reference: none — extension tier."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _unorm(sr: "pd.Series") -> "pd.Series":
        return sr.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    _unorm(F.col(col)),
                    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f"
                    "\x80-\x9f]",
                    "",
                ),
                "[ \t]+",
                " ",
            ),
            "\n{3,}",
            "\n\n",
        )
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("text_norm"),
        F.when(F.col(col).isNull(), F.lit(None).cast("boolean"))
        .otherwise(~cleaned.eqNullSafe(F.col(col)))
        .alias("changed"),
    )


def normalize_text_oracle(table: str = "documents") -> str:
    """DuckDB twin of :func:`normalize_text` (NFC form): utf8proc
    ``nfc_normalize`` + the identical regex cleanup chain."""
    return f"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(regexp_replace(
                   nfc_normalize(text),
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]',
                   '', 'g'),
                   '[ \\t]+', ' ', 'g'),
                   '\\n{{3,}}', chr(10) || chr(10), 'g')) AS text_norm,
               CASE WHEN text IS NULL THEN NULL
                    ELSE trim(regexp_replace(regexp_replace(regexp_replace(
                        nfc_normalize(text),
                        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]',
                        '', 'g'),
                        '[ \\t]+', ' ', 'g'),
                        '\\n{{3,}}', chr(10) || chr(10), 'g'))
                        IS DISTINCT FROM text END AS changed
        FROM {table}
    """


def compression_ratio(
    df: DataFrame, col: str = "text", id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Deflate compression ratio as a repetitiveness/quality signal
    (the CCNet / RefinedWeb proxy: highly-compressible pages are
    boilerplate, templates, or keyword stuffing; near-incompressible
    ones are often encoded junk): ``ratio_e4 = compressed_bytes *
    10000 div raw_bytes`` with zlib at a PINNED level, computed in an
    Arrow-batched pandas UDF (compression is inherently Python-side
    here; one corpus pass, no shuffle). Deterministic for a fixed
    zlib build — the pytest oracle replays the same stdlib call;
    there is deliberately NO DuckDB twin (no SQL compress function),
    so this operator is pytest-tier, stated honestly. Typical prose
    lands ~3000-6000; below ~1500 is heavily templated; 10000+ means
    incompressible (already-compressed or random bytes). NULL text →
    NULL ratio; empty text → NULL (no bytes to measure).

    Capability analog in the reference: none — extension tier."""
    return _compression_frame(df, col, int(level)).select(
        F.col(id_col),
        F.col("__cr_raw").alias("raw_bytes"),
        F.col("__cr_comp").alias("compressed_bytes"),
        F.col("__cr_e4").alias("compression_ratio_e4"),
    )


def _compression_frame(df: DataFrame, col: str, level: int) -> DataFrame:
    """:func:`compression_ratio`'s metrics APPENDED to ``df`` as
    ``__cr_``-prefixed columns, original columns intact — shared by
    the public operator (a projection of this) and the training-set
    recipe's page-filter tier, which gates on ``__cr_e4`` in place
    (row-local predicate, no join back on ids)."""
    import zlib

    lv = int(level)

    @F.pandas_udf("bigint")
    def _clen(sr: "pd.Series") -> "pd.Series":
        return sr.map(
            lambda x: None if x is None
            else len(zlib.compress(x.encode("utf-8"), lv))
        )

    return df.withColumns(
        {
            "__cr_raw": F.length(F.encode(F.col(col), "UTF-8"))
            .cast("bigint"),
            "__cr_comp": _clen(F.col(col)),
        }
    ).withColumn(
        "__cr_e4",
        F.expr("(__cr_comp * 10000) DIV NULLIF(__cr_raw, 0)"),
    )


def _lm_token_frame(
    df: DataFrame, col: str, id_col: str | None, checkpoint: bool
) -> DataFrame:
    """The LM scorers' shared tokenized corpus ``(id, __t array)`` —
    the exact extraction of :func:`vocab_counts` (lowercase) /
    :func:`adjacent_bigram_counts`. With ``checkpoint`` (the self-fit
    path, where the count fit(s) AND the scoring pass all consume it)
    the frame is localCheckpointed so one call tokenizes the corpus
    ONCE, not once per consumer (r12 verdict note; the same treatment
    ``bm25_topk``/``expand_queries`` got) — blocks live
    executor-side memory-and-disk and are context-cleaned with the
    result, unlike persist()."""
    from .partitioning import scale_partitions

    toks = F.filter(
        F.split(F.trim(F.lower(F.col(col))), r"\s+"),
        lambda t: t != "",
    )
    keep = [F.col(id_col)] if id_col is not None else []
    out = scale_partitions(df.where(F.col(col).isNotNull())).select(
        *keep, toks.alias("__t")
    )
    return out.localCheckpoint(eager=True) if checkpoint else out


def _lm_ngram_explode(
    tok_src: DataFrame, n: int, id_col: str | None = None
) -> DataFrame:
    """Adjacent word n-grams from the shared tokenized frame: one
    codegen ``arrays_zip`` of the ``n`` shifted slices, exploded to
    ``(w1..wn)`` rows (plus the id when requested — the per-document
    scoring shape; without it, the corpus-count shape)."""
    t = F.col("__t")
    span = F.size(t) - F.lit(n - 1)
    zipped = F.arrays_zip(
        *[F.slice(t, i + 1, span).alias(f"w{i + 1}") for i in range(n)]
    )
    keep = [F.col(id_col)] if id_col else []
    return (
        tok_src.where(F.size(t) >= n)
        .select(*keep, F.explode(zipped).alias("p"))
        .select(
            *keep, *[F.col(f"p.w{i + 1}").alias(f"w{i + 1}") for i in range(n)]
        )
    )


def lm_score(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Bigram language-model scoring — the CCNet-style perplexity
    quality filter (Wenzek et al. 2020: score pages under a reference
    LM, drop the worst tail), fully relational: per adjacent token
    pair, Laplace-smoothed ``log P(w2|w1) = ln((B(w1,w2) + 1) /
    (U(w1) + V))`` with each pair's contribution e9-floored BEFORE the
    per-document integer sum (the module's order-free cross-engine
    convention), so scores are shuffle-proof and SQL-replayable.

    ``unigrams``/``bigrams`` default to one fit pass over ``df``
    itself (the exact :func:`vocab_counts` +
    :func:`adjacent_bigram_counts` extraction the tokenizer/
    collocation tiers use, read from ONE localCheckpointed tokenized
    frame so the self-fit call tokenizes the corpus once, not three
    times — r13); pass
    the reference-corpus tables (or the persisted vocab/bigram stores
    via :func:`~etl_workflow_spark.streaming.incremental
    .lm_score_from_stores`) to score one corpus under ANOTHER
    corpus's model — the actual CCNet shape, with zero re-scan of the
    reference. Shapes at 100 TB: document pairs group per (id, w1,
    w2) before joining the count tables (distinct-pair-bounded
    joins); V is one scalar count action (bounded driver state).

    Returns one row per document: ``(id, n_pairs int,
    logprob_e9_sum bigint, avg_nll_e6 bigint)`` — ``avg_nll_e6`` is
    truncating integer division of non-negative operands (identical
    in Spark DIV and DuckDB //); documents with fewer than two tokens
    report ``n_pairs 0`` and NULL scores (nothing to measure).

    Position in the LM-signal family (three tiers, deliberately
    distinct): :func:`ngram_lm_score` is the cheap PROXY (mean
    unconditional log-frequency of hashed grams + OOV ratio — no
    probabilities, no smoothing); THIS operator is the proper
    conditional model (normalized, smoothed P(w2|w1) — actual
    per-token NLL you can threshold like CCNet does, cross-engine
    hash-checked); :func:`unigram_logprob` scores under a TRAINED
    subword tokenizer's piece distribution (how well does my
    tokenizer fit this text). Reach for the proxy when you only need
    a ranking, this one when the threshold must mean something.

    ``materialize=False`` (measurement/plan-inspection escape hatch,
    the dedup-module convention) skips the self-fit checkpoints so
    the full lazy plan stays visible; results are identical.

    Capability analog in the reference: none — extension tier."""
    tok_src = _lm_token_frame(
        df, col, id_col,
        checkpoint=materialize and (unigrams is None or bigrams is None),
    )
    if unigrams is None:
        # identical extraction to vocab_counts(lowercase=True), read
        # from the shared tokenized frame instead of re-tokenizing.
        # Materialized because it is consumed TWICE (the V-size count
        # action below and the scoring join) — without the checkpoint
        # each consumer re-runs the corpus-wide explode+agg; the
        # vocabulary-bounded result is far smaller than the pass that
        # builds it (r14, guide §5: reuse > recompute).
        unigrams = (
            tok_src.select(F.explode("__t").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("count"))
        )
        if materialize:
            unigrams = unigrams.localCheckpoint(eager=True)
    if bigrams is None:
        # identical extraction to adjacent_bigram_counts, same source
        bigrams = (
            _lm_ngram_explode(tok_src, 2)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("n_pair"))
        )
    v_size = unigrams.count()
    if v_size == 0:
        raise ValueError("lm_score needs a non-empty unigram table")
    pairs = (
        _lm_ngram_explode(tok_src, 2, id_col=id_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    logp = F.log(
        (F.coalesce(F.col("__cb"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("__cu"), F.lit(0)) + F.lit(int(v_size)))
    )
    scored = (
        pairs.join(
            bigrams.select(
                "w1", "w2", F.col("n_pair").alias("__cb")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            unigrams.select(
                F.col("token").alias("w1"), F.col("count").alias("__cu")
            ),
            "w1",
            "left",
        )
        .withColumn(
            "__e9",
            F.floor(logp * F.lit(1e9)) * F.col("__m"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__m").cast("int").alias("n_pairs"),
            F.sum("__e9").alias("logprob_e9_sum"),
        )
    )
    return (
        df.select(F.col(id_col)).distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            "logprob_e9_sum",
            F.expr(
                "((-logprob_e9_sum) DIV NULLIF(n_pairs, 0)) DIV 1000"
            ).alias("avg_nll_e6"),
        )
    )


def lm_score_oracle(table: str = "documents") -> str:
    """DuckDB twin of :func:`lm_score` (self-fit form): identical
    extraction, identically-parenthesized smoothed log, e9 floor
    before the integer sum, truncating division of non-negative
    operands."""
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    return f"""
        WITH toks AS (
            SELECT doc_id, {t} AS ts FROM {table}
            WHERE text IS NOT NULL
        ),
        uni AS (
            SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
        ),
        vstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
        big AS (
            SELECT pr['a'] AS w1, pr['b'] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT unnest([struct_pack(a := ts[i], b := ts[i + 1])
                               for i in generate_series(1, len(ts) - 1)])
                           AS pr
                FROM toks WHERE len(ts) >= 2
            ) GROUP BY 1, 2
        ),
        dpc AS (
            SELECT doc_id, pr['a'] AS w1, pr['b'] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM (
                SELECT doc_id,
                       unnest([struct_pack(a := ts[i], b := ts[i + 1])
                               for i in generate_series(1, len(ts) - 1)])
                           AS pr
                FROM toks WHERE len(ts) >= 2
            ) GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT dpc.doc_id,
                   CAST(SUM(dpc.m) AS INT) AS n_pairs,
                   CAST(SUM(
                       CAST(FLOOR(ln(
                           (COALESCE(big.c, 0) + CAST(1.0 AS DOUBLE))
                           / (COALESCE(uni.c, 0) + vstat.v)
                       ) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
                       * dpc.m
                   ) AS BIGINT) AS logprob_e9_sum
            FROM dpc
            LEFT JOIN big USING (w1, w2)
            LEFT JOIN uni ON uni.token = dpc.w1
            CROSS JOIN vstat
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(s.n_pairs, 0) AS n_pairs,
               s.logprob_e9_sum,
               CAST(((-s.logprob_e9_sum) // NULLIF(s.n_pairs, 0))
                    // 1000 AS BIGINT) AS avg_nll_e6
        FROM (SELECT DISTINCT doc_id FROM {table}) d
        LEFT JOIN scored s USING (doc_id)
    """


def lm_score_backoff(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    trigrams: DataFrame | None = None,
    alpha: float = 0.4,
    materialize: bool = True,
) -> DataFrame:
    """Stupid-backoff trigram scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation") — the higher-order tier
    above :func:`lm_score`'s bigram-Laplace model, one step toward the
    CCNet 5-gram shape while staying fully relational. Per trigram
    position, the published backoff chain with the paper's
    ``alpha = 0.4``::

        S(w3|w1,w2) = c(w1w2w3)/c(w1w2)          if c(w1w2w3) > 0
                    = alpha * c(w2w3)/c(w2)       elif c(w2w3) > 0
                    = alpha^2 * (c(w3)+1)/(N+V)   otherwise

    The unigram leaf is Laplace-floored — a deliberate, documented
    deviation from the paper (which assumes a closed vocabulary and
    scores the leaf c(w3)/N): an OOV token must score finite for the
    filter to rank junk pages at all. Each position's ``ln S`` is
    e9-floored BEFORE the per-document integer sum (the module's
    order-free cross-engine convention), so the score is shuffle-proof
    and the DuckDB twin replays it bit-for-bit.

    ``unigrams``/``bigrams``/``trigrams`` default to one fit pass over
    ``df`` itself, all three read from ONE localCheckpointed tokenized
    frame (tokenize once, not four times); pass reference-corpus
    tables — or the persisted stores via
    :func:`~etl_workflow_spark.streaming.incremental
    .lm_score_backoff_from_stores` — to score under another corpus's
    model with zero re-scan of the reference. Scale shape matches
    :func:`lm_score`: document trigrams group per (id, w1, w2, w3)
    before probing the count tables (distinct-trigram-bounded joins);
    N and V are two scalar actions over the vocabulary table.

    Returns ``(id, n_ctx int, logprob_e9_sum bigint, avg_nll_e6
    bigint)`` — documents with fewer than three tokens report
    ``n_ctx 0`` and NULL scores.

    r13: this is the ``order=3`` instance of
    :func:`lm_score_backoff_n` (delegated, so the two cannot drift);
    the generalized form reaches the actual CCNet 5-gram shape.

    Capability analog in the reference: none — extension tier."""
    counts: dict[int, DataFrame] = {}
    if unigrams is not None:
        counts[1] = unigrams
    if bigrams is not None:
        counts[2] = bigrams.select(
            "w1", "w2", F.col("n_pair").alias("n_gram")
        )
    if trigrams is not None:
        counts[3] = trigrams.select(
            "w1", "w2", "w3", F.col("n_tri").alias("n_gram")
        )
    return lm_score_backoff_n(
        df, order=3, col=col, id_col=id_col,
        counts=counts or None, alpha=alpha, materialize=materialize,
    )


def adjacent_ngram_counts(
    df: DataFrame, n: int, col: str = "text"
) -> DataFrame:
    """Corpus adjacent word n-gram counts ``(w1..wn, n_gram)`` for any
    order — the generic extraction behind the 4/5-gram stores feeding
    :func:`lm_score_backoff_n` (orders 2 and 3 keep their named
    public twins for the store writers' column contracts)."""
    k = int(n)
    if k < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    tok_src = _lm_token_frame(df, col, None, checkpoint=False)
    if k == 1:
        return (
            tok_src.select(F.explode("__t").alias("w1"))
            .groupBy("w1")
            .agg(F.count(F.lit(1)).alias("n_gram"))
        )
    return (
        _lm_ngram_explode(tok_src, k)
        .groupBy(*[f"w{i + 1}" for i in range(k)])
        .agg(F.count(F.lit(1)).alias("n_gram"))
    )


def lm_score_backoff_n(
    df: DataFrame,
    order: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
    counts: dict[int, DataFrame] | None = None,
    alpha: float = 0.4,
    materialize: bool = True,
) -> DataFrame:
    """Stupid backoff at ARBITRARY order (Brants et al. 2007) — the
    actual CCNet shape at ``order=5``: per full-context position, the
    highest-order n-gram with a nonzero count scores as its MLE,
    discounted by ``alpha`` per backed-off order, with the
    alpha^(order-1)-discounted Laplace unigram leaf for the
    never-seen tail (same documented deviation as the trigram
    instance). Each position's ``ln S`` e9-floors BEFORE the
    per-document integer sum, so any order is shuffle-proof and
    SQL-replayable (:func:`lm_score_backoff_n_oracle` generates the
    DuckDB twin for the same order).

    ``counts`` maps each order to its count table — ``1`` as
    ``(token, count)`` (or ``(w1, n_gram)``), ``k >= 2`` as
    ``(w1..wk, n_gram)``; missing orders self-fit from ``df``, all
    fits AND the scoring pass reading one localCheckpointed tokenized
    frame. Scale shape: document n-grams group per (id, w1..wn)
    before the 2(order−1)+1 count-table probes — every join is
    equi-join on distinct-n-gram-bounded frames; N and V are one
    scalar action. Documents with fewer than ``order`` tokens report
    ``n_ctx 0`` and NULL scores (the trigram instance's convention:
    only full-context positions score).

    Capability analog in the reference: none — extension tier."""
    a = float(alpha)
    if not (0.0 < a <= 1.0):
        raise ValueError(f"alpha must be in (0, 1] (got {alpha})")
    n = int(order)
    if not (2 <= n <= 8):
        raise ValueError(f"order must be in 2..8 (got {order})")
    given = dict(counts or {})
    bad_orders = [k for k in given if not (1 <= int(k) <= n)]
    if bad_orders:
        raise ValueError(
            f"counts keys {sorted(bad_orders)} outside 1..{n}"
        )
    fit_any = any(k not in given for k in range(1, n + 1))
    tok_src = _lm_token_frame(
        df, col, id_col, checkpoint=materialize and fit_any
    )
    tabs: dict[int, DataFrame] = {}
    for k in range(1, n + 1):
        if k in given:
            if k == 1:
                uni = given[1]
                if "token" in uni.columns:
                    uni = uni.select(
                        F.col("token").alias("w1"),
                        F.col("count").alias("n_gram"),
                    )
                tabs[1] = uni
            else:
                tabs[k] = given[k]
        elif k == 1:
            # consumed three times (the N/V scalar action, the order-2
            # context join, the unigram leaf join): materialize so the
            # corpus-wide explode+agg runs once (r14, guide §5)
            tabs[1] = (
                tok_src.select(F.explode("__t").alias("w1"))
                .groupBy("w1")
                .agg(F.count(F.lit(1)).alias("n_gram"))
            )
            if materialize:
                tabs[1] = tabs[1].localCheckpoint(eager=True)
        else:
            tabs[k] = (
                _lm_ngram_explode(tok_src, k)
                .groupBy(*[f"w{i + 1}" for i in range(k)])
                .agg(F.count(F.lit(1)).alias("n_gram"))
            )
            if materialize and k < n:
                # orders below the top join twice (as the gram table
                # at k and the context table at k+1); the top order
                # joins once and stays lazy
                tabs[k] = tabs[k].localCheckpoint(eager=True)
    tot = tabs[1].agg(
        F.count(F.lit(1)).alias("v"), F.sum("n_gram").alias("n")
    ).collect()[0]
    v_size, n_total = int(tot["v"]), int(tot["n"] or 0)
    if v_size == 0:
        raise ValueError(
            "lm_score_backoff_n needs a non-empty unigram table"
        )
    grams = (
        _lm_ngram_explode(tok_src, n, id_col=id_col)
        .groupBy(id_col, *[f"w{i + 1}" for i in range(n)])
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    scored = grams
    for k in range(n, 1, -1):
        lo = n - k
        keys = [f"w{lo + i + 1}" for i in range(k)]
        gk = tabs[k].select(
            *[F.col(f"w{i + 1}").alias(keys[i]) for i in range(k)],
            F.col("n_gram").alias(f"__g{k}"),
        )
        scored = scored.join(gk, keys, "left")
        ctx_keys = keys[:-1]
        xk = tabs[k - 1].select(
            *[
                F.col(f"w{i + 1}").alias(ctx_keys[i])
                for i in range(k - 1)
            ],
            F.col("n_gram").alias(f"__x{k}"),
        )
        scored = scored.join(xk, ctx_keys, "left")
    scored = scored.join(
        tabs[1].select(
            F.col("w1").alias(f"w{n}"), F.col("n_gram").alias("__leaf")
        ),
        f"w{n}",
        "left",
    )
    s = None
    for k in range(n, 1, -1):
        g = F.coalesce(F.col(f"__g{k}"), F.lit(0)).cast("double")
        x = F.coalesce(F.col(f"__x{k}"), F.lit(0)).cast("double")
        ratio = g / x
        if k == n:
            tier = ratio
        else:
            coeff = F.lit(a)
            for _ in range(n - k - 1):
                coeff = coeff * F.lit(a)
            tier = coeff * ratio
        cond = (g > 0) & (x > 0)
        s = F.when(cond, tier) if s is None else s.when(cond, tier)
    leaf_coeff = F.lit(a)
    for _ in range(n - 2):
        leaf_coeff = leaf_coeff * F.lit(a)
    leaf = leaf_coeff * (
        (F.coalesce(F.col("__leaf"), F.lit(0)).cast("double") + F.lit(1.0))
        / F.lit(float(n_total + v_size))
    )
    s = s.otherwise(leaf)
    scored = (
        scored.withColumn(
            "__e9", F.floor(F.log(s) * F.lit(1e9)) * F.col("__m")
        )
        .groupBy(id_col)
        .agg(
            F.sum("__m").cast("int").alias("n_ctx"),
            F.sum("__e9").alias("logprob_e9_sum"),
        )
    )
    return (
        df.select(F.col(id_col)).distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ctx"), F.lit(0)).alias("n_ctx"),
            "logprob_e9_sum",
            F.expr(
                "((-logprob_e9_sum) DIV NULLIF(n_ctx, 0)) DIV 1000"
            ).alias("avg_nll_e6"),
        )
    )


def lm_score_backoff_oracle(
    table: str = "documents", alpha: float = 0.4
) -> str:
    """DuckDB twin of :func:`lm_score_backoff` (self-fit form):
    identical extraction, the identically-parenthesized backoff chain,
    e9 floor before the integer sum."""
    a = repr(float(alpha))
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    return f"""
        WITH toks AS (
            SELECT doc_id, {t} AS ts FROM {table}
            WHERE text IS NOT NULL
        ),
        uni AS (
            SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
        ),
        vstat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM uni
        ),
        big AS (
            SELECT pr['a'] AS w1, pr['b'] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT unnest([struct_pack(a := ts[i], b := ts[i + 1])
                               for i in generate_series(1, len(ts) - 1)])
                           AS pr
                FROM toks WHERE len(ts) >= 2
            ) GROUP BY 1, 2
        ),
        tri AS (
            SELECT pr['a'] AS w1, pr['b'] AS w2, pr['c'] AS w3,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT unnest([struct_pack(a := ts[i], b := ts[i + 1],
                                           c := ts[i + 2])
                               for i in generate_series(1, len(ts) - 2)])
                           AS pr
                FROM toks WHERE len(ts) >= 3
            ) GROUP BY 1, 2, 3
        ),
        dtc AS (
            SELECT doc_id, pr['a'] AS w1, pr['b'] AS w2, pr['c'] AS w3,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM (
                SELECT doc_id,
                       unnest([struct_pack(a := ts[i], b := ts[i + 1],
                                           c := ts[i + 2])
                               for i in generate_series(1, len(ts) - 2)])
                           AS pr
                FROM toks WHERE len(ts) >= 3
            ) GROUP BY 1, 2, 3, 4
        ),
        scored AS (
            SELECT dtc.doc_id,
                   CAST(SUM(dtc.m) AS INT) AS n_ctx,
                   CAST(SUM(
                       CAST(FLOOR(ln(
                           CASE
                             WHEN COALESCE(tri.c, 0) > 0
                                  AND COALESCE(bctx.c, 0) > 0
                             THEN CAST(COALESCE(tri.c, 0) AS DOUBLE)
                                  / CAST(COALESCE(bctx.c, 0) AS DOUBLE)
                             WHEN COALESCE(b23.c, 0) > 0
                                  AND COALESCE(u2.c, 0) > 0
                             THEN {a} * (
                                  CAST(COALESCE(b23.c, 0) AS DOUBLE)
                                  / CAST(COALESCE(u2.c, 0) AS DOUBLE))
                             ELSE {a} * {a} * (
                                  (CAST(COALESCE(u3.c, 0) AS DOUBLE)
                                   + CAST(1.0 AS DOUBLE))
                                  / CAST(vstat.n + vstat.v AS DOUBLE))
                           END
                       ) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
                       * dtc.m
                   ) AS BIGINT) AS logprob_e9_sum
            FROM dtc
            LEFT JOIN tri ON tri.w1 = dtc.w1 AND tri.w2 = dtc.w2
                          AND tri.w3 = dtc.w3
            LEFT JOIN big bctx ON bctx.w1 = dtc.w1 AND bctx.w2 = dtc.w2
            LEFT JOIN big b23 ON b23.w1 = dtc.w2 AND b23.w2 = dtc.w3
            LEFT JOIN uni u2 ON u2.token = dtc.w2
            LEFT JOIN uni u3 ON u3.token = dtc.w3
            CROSS JOIN vstat
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(s.n_ctx, 0) AS n_ctx,
               s.logprob_e9_sum,
               CAST(((-s.logprob_e9_sum) // NULLIF(s.n_ctx, 0))
                    // 1000 AS BIGINT) AS avg_nll_e6
        FROM (SELECT DISTINCT doc_id FROM {table}) d
        LEFT JOIN scored s USING (doc_id)
    """


def lm_score_backoff_n_oracle(
    table: str = "documents", order: int = 5, alpha: float = 0.4
) -> str:
    """DuckDB twin GENERATOR for :func:`lm_score_backoff_n` at any
    order: emits the CTE chain (one n-gram count table per order),
    the identical join sequence, the identically-parenthesized
    backoff CASE, and the e9-floor-before-sum accounting. At
    ``order=3`` it is semantically identical to the hand-written
    :func:`lm_score_backoff_oracle` (pytest-pinned)."""
    a = repr(float(alpha))
    n = int(order)
    if not (2 <= n <= 8):
        raise ValueError(f"order must be in 2..8 (got {order})")
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")

    def gram_cte(k: int, name: str, with_doc: bool) -> str:
        fields = ", ".join(
            f"a{i + 1} := ts[i + {i}]" for i in range(k)
        )
        sel = ", ".join(f"pr['a{i + 1}'] AS w{i + 1}" for i in range(k))
        doc = "doc_id, " if with_doc else ""
        groups = ", ".join(
            str(i + 1) for i in range((1 if with_doc else 0) + k)
        )
        cnt = "m" if with_doc else "c"
        return f"""{name} AS (
            SELECT {doc}{sel}, CAST(COUNT(*) AS BIGINT) AS {cnt}
            FROM (
                SELECT {doc}
                       unnest([struct_pack({fields})
                               for i in generate_series(1,
                                   len(ts) - {k - 1})]) AS pr
                FROM toks WHERE len(ts) >= {k}
            ) GROUP BY {groups}
        )"""

    ctes = [
        f"""toks AS (
            SELECT doc_id, {t} AS ts FROM {table}
            WHERE text IS NOT NULL
        )""",
        """uni AS (
            SELECT t AS w1, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
        )""",
        """vstat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS v,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM uni
        )""",
    ]
    for k in range(2, n + 1):
        ctes.append(gram_cte(k, f"g{k}", False))
    ctes.append(gram_cte(n, "dtc", True))

    joins, cases = [], []
    for k in range(n, 1, -1):
        lo = n - k
        keys = [f"w{lo + i + 1}" for i in range(k)]
        on_g = " AND ".join(
            f"gj{k}.w{i + 1} = dtc.{keys[i]}" for i in range(k)
        )
        joins.append(f"LEFT JOIN g{k} gj{k} ON {on_g}")
        ctx_keys = keys[:-1]
        if k - 1 == 1:
            joins.append(
                f"LEFT JOIN uni xj{k} ON xj{k}.w1 = dtc.{ctx_keys[0]}"
            )
        else:
            on_x = " AND ".join(
                f"xj{k}.w{i + 1} = dtc.{ctx_keys[i]}"
                for i in range(k - 1)
            )
            joins.append(f"LEFT JOIN g{k - 1} xj{k} ON {on_x}")
        coeff = "" if k == n else (f"{a} * " * (n - k))
        cases.append(
            f"WHEN COALESCE(gj{k}.c, 0) > 0"
            f" AND COALESCE(xj{k}.c, 0) > 0"
            f" THEN {coeff}(CAST(COALESCE(gj{k}.c, 0) AS DOUBLE)"
            f" / CAST(COALESCE(xj{k}.c, 0) AS DOUBLE))"
        )
    joins.append(f"LEFT JOIN uni leafu ON leafu.w1 = dtc.w{n}")
    leaf_coeff = f"{a} * " * (n - 1)
    leaf = (
        f"{leaf_coeff}((CAST(COALESCE(leafu.c, 0) AS DOUBLE)"
        " + CAST(1.0 AS DOUBLE))"
        " / CAST(vstat.n + vstat.v AS DOUBLE))"
    )
    nl = "\n            "
    return f"""
        WITH {(',' + nl).join(ctes)},
        scored AS (
            SELECT dtc.doc_id,
                   CAST(SUM(dtc.m) AS INT) AS n_ctx,
                   CAST(SUM(
                       CAST(FLOOR(ln(
                           CASE {' '.join(cases)}
                           ELSE {leaf} END
                       ) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
                       * dtc.m
                   ) AS BIGINT) AS logprob_e9_sum
            FROM dtc
            {nl.join(joins)}
            CROSS JOIN vstat
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(s.n_ctx, 0) AS n_ctx,
               s.logprob_e9_sum,
               CAST(((-s.logprob_e9_sum) // NULLIF(s.n_ctx, 0))
                    // 1000 AS BIGINT) AS avg_nll_e6
        FROM (SELECT DISTINCT doc_id FROM {table}) d
        LEFT JOIN scored s USING (doc_id)
    """


def lm_score_kn(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    unigrams: DataFrame | None = None,
    bigrams: DataFrame | None = None,
    discount: float = 0.75,
    materialize: bool = True,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999's interpolated form with a fixed absolute
    discount) — the smoothing the KenLM/CCNet lineage actually uses,
    completing the LM-filter family's third smoothing regime
    (Laplace: :func:`lm_score`; stupid backoff:
    :func:`lm_score_backoff`; KN: this). Per adjacent pair::

        P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
                   + D·N1+(w1·)/c(w1) · Pcont(w2)
        Pcont(w2) = (N1+(·w2) + 1) / (N1+(··) + V)

    where the continuation counts N1+ are DISTINCT-neighbor counts
    derived from the bigram table itself — no third table, so the
    persisted vocab + bigram stores already hold the full model
    (:func:`~etl_workflow_spark.streaming.incremental
    .lm_score_kn_from_stores`). Two documented deviations from the
    closed-vocabulary paper, both needed for a filter that must score
    arbitrary pages finitely: the continuation distribution is
    Laplace-floored (an unseen continuation word scores > 0), and a
    history with no observed continuations (c(w1) = 0, OR w1 seen
    only document-finally so N1+(w1·) = 0 while c(w1w2) = 0) falls
    back to Pcont(w2) alone.

    Fixed-point convention as the siblings: each pair's ``ln P``
    e9-floored BEFORE the per-document integer sum; truncating
    ``avg_nll_e6``; documents with fewer than two tokens report
    ``n_pairs 0`` and NULL scores. Self-fit reads both counts and the
    scoring pass from one localCheckpointed tokenized frame.

    Capability analog in the reference: none — extension tier."""
    d_disc = float(discount)
    if not (0.0 < d_disc < 1.0):
        raise ValueError(f"discount must be in (0, 1) (got {discount})")
    fit_any = unigrams is None or bigrams is None
    tok_src = _lm_token_frame(
        df, col, id_col, checkpoint=materialize and fit_any
    )
    # Self-fit count tables are materialized (r14, guide §5): the
    # unigram table is consumed twice (V-size count + scoring join)
    # and the bigram table FOUR times (n_types count, the c12 join,
    # and both continuation-statistic regroups) — without the
    # checkpoints each consumer re-ran the corpus-wide explode+agg;
    # the vocabulary-/distinct-pair-bounded results are far smaller
    # than the passes that build them. Caller-supplied tables (the
    # store path) are left untouched.
    if unigrams is None:
        unigrams = (
            tok_src.select(F.explode("__t").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("count"))
        )
        if materialize:
            unigrams = unigrams.localCheckpoint(eager=True)
    if bigrams is None:
        bigrams = (
            _lm_ngram_explode(tok_src, 2)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("n_pair"))
        )
        if materialize:
            bigrams = bigrams.localCheckpoint(eager=True)
    v_size = unigrams.count()
    if v_size == 0:
        raise ValueError("lm_score_kn needs a non-empty unigram table")
    # continuation statistics from the bigram table alone: distinct
    # successors per history, distinct predecessors per continuation,
    # and the total distinct-pair count (one scalar action)
    fanout = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).alias("__n1f")
    )
    contin = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).alias("__n1b")
    )
    n_types = int(bigrams.count())
    pairs = (
        _lm_ngram_explode(tok_src, 2, id_col=id_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    c12 = F.coalesce(F.col("__c12"), F.lit(0)).cast("double")
    c1 = F.coalesce(F.col("__c1"), F.lit(0)).cast("double")
    n1f = F.coalesce(F.col("__n1f"), F.lit(0)).cast("double")
    n1b = F.coalesce(F.col("__n1b"), F.lit(0)).cast("double")
    pcont = (n1b + F.lit(1.0)) / F.lit(float(n_types + v_size))
    interp = (
        F.greatest(c12 - F.lit(d_disc), F.lit(0.0)) / c1
        + (F.lit(d_disc) * n1f / c1) * pcont
    )
    # the interpolated branch divides by c(w1), so it requires c1 > 0
    # even when c12 > 0: a caller-supplied bigram table can contain a
    # pair whose w1 is missing from the caller's unigram table
    # (impossible under self-fit / the store path, where both tables
    # derive from one source) — such rows route to the pcont fallback
    # instead of dividing by zero
    p = F.when((c1 > 0) & ((c12 > 0) | (n1f > 0)), interp).otherwise(
        pcont
    )
    scored = (
        pairs.join(
            bigrams.select("w1", "w2", F.col("n_pair").alias("__c12")),
            ["w1", "w2"],
            "left",
        )
        .join(
            unigrams.select(
                F.col("token").alias("w1"), F.col("count").alias("__c1")
            ),
            "w1",
            "left",
        )
        .join(fanout, "w1", "left")
        .join(contin, "w2", "left")
        .withColumn("__e9", F.floor(F.log(p) * F.lit(1e9)) * F.col("__m"))
        .groupBy(id_col)
        .agg(
            F.sum("__m").cast("int").alias("n_pairs"),
            F.sum("__e9").alias("logprob_e9_sum"),
        )
    )
    return (
        df.select(F.col(id_col)).distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            "logprob_e9_sum",
            F.expr(
                "((-logprob_e9_sum) DIV NULLIF(n_pairs, 0)) DIV 1000"
            ).alias("avg_nll_e6"),
        )
    )


def lm_score_kn_oracle(
    table: str = "documents", discount: float = 0.75
) -> str:
    """DuckDB twin of :func:`lm_score_kn` (self-fit form): identical
    extraction, continuation counts from the same bigram table, the
    identically-parenthesized interpolation, e9 floor before the
    integer sum."""
    dd = repr(float(discount))
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    return f"""
        WITH toks AS (
            SELECT doc_id, {t} AS ts FROM {table}
            WHERE text IS NOT NULL
        ),
        uni AS (
            SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1
        ),
        big AS (
            SELECT pr['a'] AS w1, pr['b'] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM (
                SELECT unnest([struct_pack(a := ts[i], b := ts[i + 1])
                               for i in generate_series(1, len(ts) - 1)])
                           AS pr
                FROM toks WHERE len(ts) >= 2
            ) GROUP BY 1, 2
        ),
        fanout AS (
            SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1f FROM big GROUP BY 1
        ),
        contin AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM big GROUP BY 1
        ),
        gstat AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM big)
                   + (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS nv
        ),
        dpc AS (
            SELECT doc_id, pr['a'] AS w1, pr['b'] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM (
                SELECT doc_id,
                       unnest([struct_pack(a := ts[i], b := ts[i + 1])
                               for i in generate_series(1, len(ts) - 1)])
                           AS pr
                FROM toks WHERE len(ts) >= 2
            ) GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT dpc.doc_id,
                   CAST(SUM(dpc.m) AS INT) AS n_pairs,
                   CAST(SUM(
                       CAST(FLOOR(ln(
                           CASE WHEN COALESCE(uni.c, 0) > 0
                                  AND (COALESCE(big.c, 0) > 0
                                       OR COALESCE(fanout.n1f, 0) > 0)
                           THEN
                             GREATEST(CAST(COALESCE(big.c, 0) AS DOUBLE)
                                      - {dd}, CAST(0.0 AS DOUBLE))
                             / CAST(COALESCE(uni.c, 0) AS DOUBLE)
                             + ({dd}
                                * CAST(COALESCE(fanout.n1f, 0) AS DOUBLE)
                                / CAST(COALESCE(uni.c, 0) AS DOUBLE))
                               * ((CAST(COALESCE(contin.n1b, 0) AS DOUBLE)
                                   + CAST(1.0 AS DOUBLE))
                                  / CAST(gstat.nv AS DOUBLE))
                           ELSE
                             (CAST(COALESCE(contin.n1b, 0) AS DOUBLE)
                              + CAST(1.0 AS DOUBLE))
                             / CAST(gstat.nv AS DOUBLE)
                           END
                       ) * CAST(1000000000.0 AS DOUBLE)) AS BIGINT)
                       * dpc.m
                   ) AS BIGINT) AS logprob_e9_sum
            FROM dpc
            LEFT JOIN big USING (w1, w2)
            LEFT JOIN uni ON uni.token = dpc.w1
            LEFT JOIN fanout ON fanout.w1 = dpc.w1
            LEFT JOIN contin ON contin.w2 = dpc.w2
            CROSS JOIN gstat
            GROUP BY 1
        )
        SELECT d.doc_id,
               COALESCE(s.n_pairs, 0) AS n_pairs,
               s.logprob_e9_sum,
               CAST(((-s.logprob_e9_sum) // NULLIF(s.n_pairs, 0))
                    // 1000 AS BIGINT) AS avg_nll_e6
        FROM (SELECT DISTINCT doc_id FROM {table}) d
        LEFT JOIN scored s USING (doc_id)
    """


#: The Gopher required-stopword set (Rae et al. 2021, A1.1): a page
#: must contain at least two of these to look like running English
#: prose rather than boilerplate or listings.
GOPHER_REQUIRED_STOPS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_flags(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    "Scaling Language Models", Appendix A1.1) as one shuffle-free
    projection: word-count bounds, mean word length bounds,
    symbol-to-word ratio (# and ellipses), bullet-started and
    ellipsis-ended line fractions, alphabetic-word fraction, and the
    required-stopword test — the standard pre-training page filter
    between raw crawl and tokenization.

    All ratios are BIGINT fixed-point in 1e-4 units from truncating
    integer division of exact counts (the module's cross-engine
    convention), and every threshold compares integers — so
    ``passes_gopher`` replays bit-for-bit in SQL. NULL text yields
    NULL metrics and a NULL verdict (unknown, not false) on both
    engines. Thresholds follow the paper: 50 <= words <= 100000,
    3 <= mean word length <= 10, symbol ratio <= 0.1, bullet lines
    <= 0.9, ellipsis lines <= 0.3, alpha words >= 0.8, >= 2 required
    stopwords.

    Capability analog in the reference: none — extension tier."""
    return _gopher_frame(df, col).select(
        F.col(id_col),
        F.col("__gq_nw").cast("int").alias("n_words"),
        F.col("__gq_mwl").alias("mean_word_len_e4"),
        F.col("__gq_swr").alias("symbol_word_ratio_e4"),
        F.col("__gq_blr").alias("bullet_line_ratio_e4"),
        F.col("__gq_elr").alias("ellipsis_line_ratio_e4"),
        F.col("__gq_awr").alias("alpha_word_ratio_e4"),
        F.col("__gq_req").alias("n_required_stops"),
        F.col("__gq_passes").alias("passes_gopher"),
    )


def _gopher_frame(df: DataFrame, col: str) -> DataFrame:
    """:func:`gopher_quality_flags`'s counts, ratios, and verdict
    APPENDED to ``df`` as ``__gq_``-prefixed columns, original columns
    intact — shared by the public operator (a projection of this) and
    the training-set recipe's page-filter tier, which gates on
    ``__gq_passes`` in place (row-local predicate, no join back on
    ids). Still one shuffle-free codegen projection."""
    toks = tokens(col)
    # size(NULL) is -1 in non-ANSI Spark (legacy sizeOfNull), so every
    # array-size-derived count is explicitly NULL-guarded — a -1 count
    # would turn the NULL-text verdict into a hard false (and 10000
    # ratios) instead of the contracted NULL = unknown
    nn = F.col(col).isNotNull()

    def _guard(c):
        return F.when(nn, c).cast("bigint")

    n_hash = F.length(
        F.regexp_replace(F.col(col), r"[^#]", "")
    ).cast("bigint")
    n_ellipsis = _guard(
        F.size(F.split(F.col(col), r"\.\.\.")) - F.lit(1)
    )
    lines = F.filter(
        F.split(F.col(col), "\n"), lambda ln: F.trim(ln) != ""
    )
    lws = F.transform(toks, F.lower)
    n_req = sum(
        (
            F.array_contains(lws, w).cast("int")
            for w in GOPHER_REQUIRED_STOPS
        ),
        F.lit(0),
    ).cast("int")
    return (
        df.withColumns(
            {
                "__gq_nw": _guard(_n_tokens(col)),
                "__gq_ns": F.length(
                    F.regexp_replace(F.col(col), r"\s+", "")
                ).cast("bigint"),
                "__gq_sym": n_hash + n_ellipsis,
                "__gq_nl": _guard(F.size(lines)),
                "__gq_nb": _guard(
                    F.size(
                        F.filter(
                            lines, lambda ln: F.trim(ln).rlike("^[-•*]")
                        )
                    )
                ),
                "__gq_ne": _guard(
                    F.size(
                        F.filter(
                            lines,
                            lambda ln: F.trim(ln).rlike(r"\.\.\.$"),
                        )
                    )
                ),
                "__gq_naw": _guard(
                    F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
                ),
                "__gq_req": n_req,
            }
        )
        .withColumns(
            {
                "__gq_mwl": F.expr(
                    "(__gq_ns * 10000) DIV NULLIF(__gq_nw, 0)"
                ),
                "__gq_swr": F.expr(
                    "(__gq_sym * 10000) DIV NULLIF(__gq_nw, 0)"
                ),
                "__gq_blr": F.expr(
                    "(__gq_nb * 10000) DIV NULLIF(__gq_nl, 0)"
                ),
                "__gq_elr": F.expr(
                    "(__gq_ne * 10000) DIV NULLIF(__gq_nl, 0)"
                ),
                "__gq_awr": F.expr(
                    "(__gq_naw * 10000) DIV NULLIF(__gq_nw, 0)"
                ),
            }
        )
        .withColumn(
            "__gq_passes",
            F.expr(
                "__gq_nw BETWEEN 50 AND 100000"
                " AND __gq_mwl BETWEEN 30000 AND 100000"
                " AND __gq_swr <= 1000"
                " AND __gq_blr <= 9000"
                " AND __gq_elr <= 3000"
                " AND __gq_awr >= 8000"
                " AND __gq_req >= 2"
            ),
        )
    )


def gopher_quality_flags_oracle(table: str = "documents") -> str:
    """DuckDB twin of :func:`gopher_quality_flags` — the same exact
    counts and truncating integer divisions."""
    t = _sql_tokens("text")
    req = " + ".join(
        "(CASE WHEN list_contains(lws, '" + w + "') THEN 1 ELSE 0 END)"
        for w in GOPHER_REQUIRED_STOPS
    )
    return f"""
        WITH g AS (
            SELECT doc_id,
                   CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len({t}) END AS BIGINT) AS nw,
                   CAST(length(regexp_replace(text, '\\s+', '', 'g'))
                        AS BIGINT) AS ns,
                   CAST(length(regexp_replace(text, '[^#]', '', 'g'))
                        + (len(string_split(text, '...')) - 1)
                        AS BIGINT) AS sym,
                   list_filter(string_split(text, chr(10)),
                               l -> trim(l) <> '') AS lines,
                   list_transform({t}, w -> lower(w)) AS lws,
                   CAST(len(list_filter({t},
                        w -> regexp_matches(w, '[A-Za-z]')))
                        AS BIGINT) AS naw
            FROM {table}
        ),
        h AS (
            SELECT doc_id, nw, ns, sym, naw,
                   CAST(len(lines) AS BIGINT) AS nl,
                   CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '^[-•*]')))
                        AS BIGINT) AS nb,
                   CAST(len(list_filter(lines,
                        l -> regexp_matches(trim(l), '\\.\\.\\.$')))
                        AS BIGINT) AS ne,
                   -- NULL text must stay NULL (unknown), but
                   -- list_contains(NULL) -> NULL would fold to 0
                   -- through the CASE sum while the engine keeps NULL
                   CAST(CASE WHEN lws IS NULL THEN NULL
                             ELSE ({req}) END AS INT)
                       AS n_required_stops
            FROM g
        )
        SELECT doc_id,
               CAST(nw AS INT) AS n_words,
               (ns * 10000) // NULLIF(nw, 0) AS mean_word_len_e4,
               (sym * 10000) // NULLIF(nw, 0) AS symbol_word_ratio_e4,
               (nb * 10000) // NULLIF(nl, 0) AS bullet_line_ratio_e4,
               (ne * 10000) // NULLIF(nl, 0) AS ellipsis_line_ratio_e4,
               (naw * 10000) // NULLIF(nw, 0) AS alpha_word_ratio_e4,
               n_required_stops,
               (nw BETWEEN 50 AND 100000
                AND (ns * 10000) // NULLIF(nw, 0)
                    BETWEEN 30000 AND 100000
                AND (sym * 10000) // NULLIF(nw, 0) <= 1000
                AND (nb * 10000) // NULLIF(nl, 0) <= 9000
                AND (ne * 10000) // NULLIF(nl, 0) <= 3000
                AND (naw * 10000) // NULLIF(nw, 0) >= 8000
                AND n_required_stops >= 2) AS passes_gopher
        FROM h
    """


def c4_line_filter(
    df: DataFrame, col: str = "text", id_col: str = "doc_id",
    min_words: int = 5, min_lines: int = 3,
) -> DataFrame:
    """The C4 line-and-page cleanup (Raffel et al. 2020, §2.2) as one
    shuffle-free projection: keep only lines that end in terminal
    punctuation (``. ! ? "``), contain at least ``min_words`` words
    (paper default 5), and do not mention "javascript"; drop the whole
    page when it contains "lorem ipsum" or a ``{`` (code), or when
    fewer than ``min_lines`` lines survive. Deliberate deviation from
    the paper, stated: the paper's page rule counts SENTENCES ("fewer
    than 3 sentences"); this operator uses surviving LINES as the
    sentence proxy (no sentence segmenter in the relational tier) —
    ``min_lines`` parameterizes it. Returns ``(id, n_lines, n_kept,
    kept_text, dropped)`` with ``kept_text`` NULL for dropped pages —
    pure string/array built-ins, so the rebuilt text hash-checks
    cross-engine. NULL text propagates NULLs (unknown, not dropped).

    Capability analog in the reference: none — extension tier."""
    return _c4_frame(df, col, int(min_words), int(min_lines)).select(
        F.col(id_col),
        F.col("__c4_nl").alias("n_lines"),
        F.col("__c4_nk").alias("n_kept"),
        F.col("__c4_kept_text").alias("kept_text"),
        F.col("__c4_dropped").alias("dropped"),
    )


def _c4_frame(df: DataFrame, col: str, mw: int, ml: int) -> DataFrame:
    """:func:`c4_line_filter`'s counts, rebuilt page, and verdict
    APPENDED to ``df`` as ``__c4_``-prefixed columns, original columns
    intact — shared by the public operator (a projection of this) and
    the training-set recipe's page-filter tier, which gates on
    ``__c4_dropped`` and optionally rewrites the text column to
    ``__c4_kept_text`` in place (row-local, no join back on ids)."""

    def _keep(ln):
        lt = F.trim(ln)
        words = F.filter(
            F.split(lt, r"\s+"), lambda w: w != ""
        )
        return (
            (lt != "")
            & lt.rlike('[.!?"]$')
            & (F.size(words) >= mw)
            & ~F.lower(lt).contains("javascript")
        )

    lines = F.split(F.col(col), "\n")
    kept = F.filter(lines, _keep)
    page_drop = (
        F.lower(F.col(col)).contains("lorem ipsum")
        | F.col(col).contains("{")
    )
    # size(NULL) = -1 in non-ANSI Spark: guard so NULL text reports
    # NULL counts and a NULL verdict, matching the SQL twin
    nn = F.col(col).isNotNull()
    return df.withColumns(
        {
            "__c4_nl": F.when(nn, F.size(lines)).cast("int"),
            "__c4_nk": F.when(nn, F.size(kept)).cast("int"),
            "__c4_karr": kept,
            "__c4_pd": page_drop,
        }
    ).withColumns(
        {
            "__c4_kept_text": F.when(
                F.col("__c4_pd") | (F.col("__c4_nk") < ml), F.lit(None)
            ).otherwise(F.array_join(F.col("__c4_karr"), "\n")),
            "__c4_dropped": F.col("__c4_pd") | (F.col("__c4_nk") < ml),
        }
    )


def c4_line_filter_oracle(
    table: str = "documents", min_words: int = 5, min_lines: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_filter` — identical per-line
    predicate and page verdict (same threshold parameters)."""
    mw, ml = int(min_words), int(min_lines)
    keep = (
        "l -> trim(l) <> '' "
        "AND regexp_matches(trim(l), '[.!?\"]$') "
        "AND len(list_filter(string_split_regex(trim(l), '\\s+'), "
        f"w -> w <> '')) >= {mw} "
        "AND NOT contains(lower(trim(l)), 'javascript')"
    )
    return f"""
        WITH c AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS lines,
                   list_filter(string_split(text, chr(10)), {keep})
                       AS kept,
                   (contains(lower(text), 'lorem ipsum')
                    OR contains(text, '{{')) AS d
            FROM {table}
        )
        SELECT doc_id,
               CAST(len(lines) AS INT) AS n_lines,
               CAST(len(kept) AS INT) AS n_kept,
               CASE WHEN d OR len(kept) < {ml} THEN NULL
                    ELSE array_to_string(kept, chr(10)) END AS kept_text,
               (d OR len(kept) < {ml}) AS dropped
        FROM c
    """


def lang_id(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: count marker-word hits per language,
    predict the argmax (ties broken by language code order), 'und' when
    nothing hits. A deterministic n-gram-style heuristic — the scale
    path for real corpora swaps in fastText via mapInPandas without
    changing the plan shape.
    """
    toks = tokens(col)
    codes = sorted(LANG_MARKERS)

    def marker_filter(markers: tuple[str, ...]):
        # single-arg lambda: pyspark passes one Column per parameter,
        # so defaults-as-closure would receive the array index arg.
        return lambda w: F.lower(w).isin(*markers)

    hits = {
        c: F.size(F.filter(toks, marker_filter(LANG_MARKERS[c]))) for c in codes
    }
    best = F.greatest(*hits.values())
    # First code (sorted order) reaching the max wins ties — same CASE
    # ordering in the SQL oracle; _lang_pred is the shared builder.
    return df.select(
        F.col(id_col),
        _lang_pred(col).alias("lang_pred"),
        best.cast("int").alias("marker_hits"),
    )


def lang_id_oracle(table: str = "documents") -> str:
    t = _sql_tokens("text")
    codes = sorted(LANG_MARKERS)
    hit_exprs = {
        c: "len(list_filter(%s, w -> lower(w) IN (%s)))"
        % (t, ", ".join(f"'{w}'" for w in LANG_MARKERS[c]))
        for c in codes
    }
    hit_cols = ", ".join(f"{e} AS h_{c}" for c, e in hit_exprs.items())
    best = "greatest(" + ", ".join(f"h_{c}" for c in codes) + ")"
    case = " ".join(f"WHEN h_{c} = best THEN '{c}'" for c in codes)
    return f"""
        WITH h AS (SELECT doc_id, {hit_cols} FROM {table}),
        b AS (SELECT doc_id, *, {best} AS best FROM h)
        SELECT doc_id,
               CASE WHEN best > 0 THEN (CASE {case} END) ELSE 'und' END AS lang_pred,
               CAST(best AS INT) AS marker_hits
        FROM b
    """


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle is byte-identical: character classes, \S, {m,}.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://\S+"


def redact_pii(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrubbing — the standard pre-training compliance pass:
    replace emails and URLs with typed placeholder tokens and count the
    hits per document (the counts feed the quality/compliance report).

    Pure JVM regex (codegen, shuffle-free projection); the pattern set
    is deliberately small and cross-engine — a production pass extends
    the same shape with more patterns (phones, IP addresses, keys).
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(col), PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
    )
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(F.col(col), F.lit(PII_EMAIL), 0))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col(col), F.lit(PII_URL), 0))
        .cast("int")
        .alias("n_urls"),
    )


def redact_pii_oracle(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                              '{PII_URL}', '<URL>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PII_URL}')) AS INT) AS n_urls
        FROM {table}
    """


def fingerprint(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: SHA-256 over whitespace-normalized,
    lowercased text. Content-addressed identity for exact dedup across
    shards — stable across partitioning, engines, and runs.
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.sha2(normalized, 256).alias("fingerprint"),
        F.length(normalized).cast("int").alias("n_chars_norm"),
    )


def fingerprint_oracle(table: str = "documents") -> str:
    return f"""
        SELECT doc_id,
               sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS fingerprint,
               CAST(length(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                    AS INT) AS n_chars_norm
        FROM {table}
    """


def _norm_token_hashes(col: str) -> Column:
    """Per-token 64-bit hashes of aggressively normalized text
    (lowercase, alnum-only, whitespace-split) — the normalization the
    published decontamination recipes use so trivial formatting
    differences don't hide an overlap."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(col)), r"[^a-z0-9\s]", " ")),
        r"\s+",
    )
    return F.transform(toks, lambda t: F.xxhash64(t))


def _gram_hashes(th_col: str, n: int) -> Column:
    """n-gram hashes from a MATERIALIZED token-hash array column.

    Two deliberate shapes, each worth ~an order of magnitude at sf0.1
    (measured 9.5 s → 0.3 s together):

    - The lambda reads the token hashes through a bound column
      reference (``F.col(th_col)``), never the tokenization expression
      itself. A lambda body re-evaluates any outer EXPRESSION it
      captures once per element — embedding the split/regexp tree here
      re-tokenizes the whole document for every gram index (quadratic
      in document length). An attribute reference is O(1).
    - Grams are hashed as ``xxhash64(slice(hashes, i, n))`` over
      8-byte longs instead of join-then-hash strings, so the exploded
      probe stream is longs, not ~13-word strings. Hash-of-hashes is
      order- and boundary-sensitive, so hash equality == n-gram
      equality up to collision (2^-64).

    Empty array when the doc has < n words.
    """
    th = F.col(th_col)
    k = F.size(th)
    grams = F.transform(
        F.sequence(F.lit(1), k - F.lit(n - 1)),
        lambda i: F.xxhash64(F.slice(th, i, n)),
    )
    return F.when(k >= F.lit(n), grams).otherwise(
        F.array().cast("array<bigint>")
    )


def _ws_tokens(col: str) -> Column:
    """Non-empty whitespace tokens: ``tokens()``'s split leaves a
    phantom "" first element when text LEADS with a tab/newline (trim
    strips only spaces) — dropping empties here keeps hash positions
    and rebuild positions aligned AND keeps the phantom out of gram
    matching."""
    return F.filter(tokens(col), lambda t: t != F.lit(""))


def _aligned_hashes(toks: Column) -> Column:
    """Per-token hashes normalized IN PLACE (lowercase + strip
    non-alnum inside each token, never re-splitting), so position i of
    the hash array IS position i of ``toks`` — the alignment surgical
    span removal needs. :func:`_norm_token_hashes` (the flag-level
    recipe) folds punctuation into token boundaries, which re-splits:
    fine when only the hit count matters, fatal when hits must map
    back to raw-token positions. A token that normalizes to "" (pure
    punctuation) falls back to its lowercased raw form — hashing all
    of them as "" would make every punctuation token a WILDCARD that
    matches every other one (verified: ',' vs '.' aligned inside
    otherwise-matching grams caused false excision)."""
    return F.transform(
        toks,
        lambda t: F.xxhash64(
            F.when(
                F.regexp_replace(F.lower(t), "[^a-z0-9]", "") == "",
                F.lower(t),
            ).otherwise(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
        ),
    )


def remove_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    margin: int = 0,
    col: str = "text",
    id_col: str = "doc_id",
    bench_col: str = "text",
) -> DataFrame:
    """Surgical benchmark decontamination: instead of dropping a
    contaminated document (:func:`decontaminate`), remove ONLY the
    token windows that collide with a held-out set's ``n``-grams
    (± ``margin`` extra tokens each side) and keep the rest — the
    GPT-3-style excision recipe for documents too valuable to drop.

    Matching normalizes per token in place (:func:`_aligned_hashes`),
    a slightly stricter overlap definition than
    :func:`ngram_contamination`'s boundary-folding normalization —
    use the flag operator for audit counts and this one for the
    rewrite. Rebuilt text is whitespace-normalized (single spaces),
    the module's standard rebuild convention; untouched and NULL-text
    documents pass through byte-identical. Adds ``n_removed_tokens``.

    Scale shape: the benchmark's gram hashes build once and broadcast;
    the corpus explodes to hash-only (key, pos, gram) rows probed by
    semi-join — the corpus never shuffles for the probe, and only the
    per-doc hit-start aggregation exchanges (bounded by hit count).
    Hits key on ``xxhash64(id, text)``, not ``id_col`` alone: a NULL
    id would never equi-join its hits back (contamination shipping
    untouched), and duplicate ids with different texts would
    cross-pollinate windows. The rebuild is codegen HOFs, evaluated
    ONCE behind a materialized column; its cost per doc is tokens ×
    hit-starts, fine while per-doc collisions are few (they are —
    eval sets are MBs against a 100 TB corpus).
    """
    from .partitioning import scale_partitions

    bench_hashes = (
        benchmark.select(
            _aligned_hashes(_ws_tokens(bench_col)).alias("__th")
        )
        .select(F.explode(_gram_hashes("__th", n)).alias("gram_h"))
        .distinct()
    )
    key = F.xxhash64(F.col(id_col), F.col(col)).alias("__key")
    doc_grams = (
        scale_partitions(docs)
        .select(key, _aligned_hashes(_ws_tokens(col)).alias("__th"))
        .select(
            "__key",
            F.posexplode(_gram_hashes("__th", n)).alias("__pos", "gram_h"),
        )
    )
    hit_starts = (
        doc_grams.join(F.broadcast(bench_hashes), "gram_h", "left_semi")
        .groupBy("__key")
        .agg(F.collect_set("__pos").alias("__starts"))
    )
    toks = _ws_tokens(col)
    lo = F.lit(int(margin))
    hi = F.lit(int(n - 1 + margin))
    # gram at 0-based start s covers tokens [s, s+n-1]; drop token i
    # when any hit-start's (margin-widened) window covers it. __starts
    # is read through a column reference (the HOF capture rule), and
    # __kept is materialized once — referencing the filter expression
    # from both outputs would run the tokens×hits scan twice per row.
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__starts"), lambda s: (i >= s - lo) & (i <= s + hi)
        ),
    )
    untouched = F.col("__starts").isNull() | F.col(col).isNull()
    return (
        docs.withColumn("__key", F.xxhash64(F.col(id_col), F.col(col)))
        .join(hit_starts, "__key", "left")
        .withColumn("__kept", F.when(~untouched, kept))
        .withColumn(
            "n_removed_tokens",
            F.when(untouched, F.lit(0))
            .otherwise(F.size(toks) - F.size(F.col("__kept")))
            .cast("long"),
        )
        .withColumn(
            col,
            F.when(untouched, F.col(col)).otherwise(
                F.concat_ws(" ", F.col("__kept"))
            ),
        )
        .drop("__starts", "__key", "__kept")
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    col: str = "text",
    id_col: str = "doc_id",
    bench_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a held-out evaluation set (the 13-gram-overlap
    recipe the GPT-3/PaLM training reports describe).

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval sets are MBs against a 100 TB corpus), so its distinct
    n-gram *hashes* build once and broadcast; the corpus explodes to
    (doc_id, gram_hash) — linear in token count, hash-only width — and
    probes the broadcast set with a semi-join aggregated back per doc.
    The 100 TB side never shuffles for the probe; the only exchange is
    the per-doc hit-count aggregation, keyed on ``id_col``.

    Returns every input doc with ``n_contaminated_ngrams`` and a
    ``contaminated`` flag; feed to :func:`decontaminate` to drop hits.
    """
    from .partitioning import scale_partitions

    bench_hashes = (
        benchmark.select(_norm_token_hashes(bench_col).alias("__th"))
        .select(F.explode(_gram_hashes("__th", n)).alias("gram_h"))
        .distinct()
    )
    doc_grams = (
        scale_partitions(docs)
        .select(F.col(id_col), _norm_token_hashes(col).alias("__th"))
        .select(id_col, F.explode(_gram_hashes("__th", n)).alias("gram_h"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_hashes), "gram_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    col: str = "text",
    id_col: str = "doc_id",
    bench_col: str = "text",
) -> DataFrame:
    """The filtering form: training docs with every benchmark-overlap
    doc removed (broadcast-probe + anti-join on the flagged ids)."""
    flagged = ngram_contamination(
        docs, benchmark, n=n, col=col, id_col=id_col, bench_col=bench_col
    ).filter(F.col("contaminated"))
    return docs.join(flagged.select(id_col), id_col, "left_anti")


def repetition_signals(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family):
    documents dominated by one token, one bigram, or copy-pasted lines
    are low-quality training data and get filtered on these scores.

      distinct_token_ratio   |distinct tokens| / |tokens|
      top_token_fraction     occurrences of the most frequent token / n
      top_2gram_fraction     occurrences of the most frequent bigram /
                             (n - 1)
      dup_line_fraction      1 - |distinct lines| / |lines|

    Mode-of-a-group ("most frequent X") is computed by explode →
    count → max — two narrow shuffles on the doc id — NOT by an
    in-array higher-order aggregate, which would be an interpreted
    O(len²) lambda per document. The three branches join on the doc id
    they were just aggregated on, so AQE coalesces them cheaply.
    """
    toks = F.split(F.trim(F.col(col)), r"\s+")
    lines = F.split(F.col(col), "\n", -1)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("nd"),
        F.size(lines).alias("nl"),
        F.size(F.array_distinct(lines)).alias("ndl"),
        toks.alias("_toks"),
    )
    tok_max = (
        base.select(id_col, F.explode("_toks").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("max_tok"))
    )
    sz = F.greatest(F.size(F.col("_toks")) - F.lit(1), F.lit(0))
    z = F.arrays_zip(F.slice("_toks", 1, sz), F.slice("_toks", 2, sz))
    grams = F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    gram_max = (
        base.select(id_col, F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("max_gram"))
    )
    return (
        base.drop("_toks")
        .join(tok_max, on=id_col, how="left")
        .join(gram_max, on=id_col, how="left")
        .select(
            id_col,
            F.col("n").cast("int").alias("n_tokens"),
            # e4 fixed point from exact integer counts (truncating DIV
            # == DuckDB // for non-negatives): no round(double, 4)
            # half-way knife edge can reach the hash compare
            F.expr(
                "CAST((CAST(nd AS BIGINT) * 10000)"
                " DIV NULLIF(CAST(n AS BIGINT), 0) AS BIGINT)"
            ).alias("distinct_token_ratio_e4"),
            F.expr(
                "CAST((CAST(COALESCE(max_tok, 0) AS BIGINT) * 10000)"
                " DIV NULLIF(CAST(n AS BIGINT), 0) AS BIGINT)"
            ).alias("top_token_fraction_e4"),
            F.expr(
                "CAST((CAST(COALESCE(max_gram, 0) AS BIGINT) * 10000)"
                " DIV CAST(GREATEST(n - 1, 1) AS BIGINT) AS BIGINT)"
            ).alias("top_2gram_fraction_e4"),
            F.expr(
                "CAST((CAST(nl - ndl AS BIGINT) * 10000)"
                " DIV NULLIF(CAST(nl AS BIGINT), 0) AS BIGINT)"
            ).alias("dup_line_fraction_e4"),
        )
    )


def repetition_signals_oracle(table: str = "documents") -> str:
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
        WITH t AS (
            SELECT doc_id, {toks} AS toks,
                   string_split(text, chr(10)) AS lines
            FROM {table}
        ),
        base AS (
            SELECT doc_id, len(toks) AS n, len(list_distinct(toks)) AS nd,
                   len(lines) AS nl, len(list_distinct(lines)) AS ndl
            FROM t
        ),
        tokc AS (
            SELECT doc_id, MAX(c) AS max_tok FROM (
                SELECT doc_id, tok, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
                GROUP BY 1, 2
            ) GROUP BY 1
        ),
        gramc AS (
            SELECT doc_id, MAX(c) AS max_gram FROM (
                SELECT doc_id, gram, COUNT(*) AS c
                FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               generate_series(1, greatest(len(toks) - 1, 0)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS gram
                    FROM t
                )
                GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT b.doc_id, CAST(n AS INT) AS n_tokens,
               CAST((CAST(nd AS BIGINT) * 10000)
                    // NULLIF(CAST(n AS BIGINT), 0) AS BIGINT)
                   AS distinct_token_ratio_e4,
               CAST((CAST(COALESCE(max_tok, 0) AS BIGINT) * 10000)
                    // NULLIF(CAST(n AS BIGINT), 0) AS BIGINT)
                   AS top_token_fraction_e4,
               CAST((CAST(COALESCE(max_gram, 0) AS BIGINT) * 10000)
                    // CAST(greatest(n - 1, 1) AS BIGINT) AS BIGINT)
                   AS top_2gram_fraction_e4,
               CAST((CAST(nl - ndl AS BIGINT) * 10000)
                    // NULLIF(CAST(nl AS BIGINT), 0) AS BIGINT)
                   AS dup_line_fraction_e4
        FROM base b
        LEFT JOIN tokc USING (doc_id)
        LEFT JOIN gramc USING (doc_id)
    """


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the keyword
    profile used for topic routing and near-dup triage.

    tf = in-doc count; idf = ln((N+1)/(df+1)) + 1 (the smoothed sklearn
    form — never zero, no divide-by-zero on corpus-wide terms). Shape:
    explode → (doc, term) count → term document-frequency agg → join.
    The corpus size N is ONE scalar count action (bounded driver state,
    same contract as the IVF quantizer); the df side joins by term —
    term cardinality scales sublinearly with corpus size, and the join
    carries only (term, df). Ranking sorts on the UNROUNDED score with
    a term-name tiebreak so both engines rank identically; the score is
    fixed-pointed only at the output edge (``score_e4`` = floor of
    score*1e4 — scores are always positive since the smoothed idf >= 1,
    and floor avoids the .00005 HALF_UP-vs-HALF_EVEN knife edge that
    ``round(double, 4)`` hash-failed on in rounds 3-4).
    """
    from pyspark.sql.window import Window

    from .partitioning import scale_partitions

    tf = (
        scale_partitions(df)
        .select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(col)), r"\s+")).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(id_col).distinct().count()
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(docfreq, on="term").withColumn(
        "score",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.floor(F.col("score") * 10000).alias("score_e4"),
            "rank",
        )
    )


def tfidf_top_terms_oracle(k: int = 5, table: str = "documents") -> str:
    return f"""
        WITH tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\\s+')) AS term
                FROM {table}
            ) GROUP BY 1, 2
        ),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM {table}),
        docfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * (ln((n.n_docs + 1.0) / (docfreq.df + 1)) + 1.0)
                       AS score
            FROM tf JOIN docfreq USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tf, score,
                   CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, term) AS INT)
                       AS rank
            FROM scored
        )
        SELECT doc_id, term, CAST(tf AS INT) AS tf,
               CAST(floor(score * 10000) AS BIGINT) AS score_e4, rank
        FROM ranked WHERE rank <= {k}
    """


# ------------------------------------------------------------ fuzzy search


def _query_trigrams(query: str) -> list[str]:
    q = query.lower()
    return sorted({q[i : i + 3] for i in range(max(len(q) - 2, 0))})


def fuzzy_name_search(
    df: DataFrame,
    query: str,
    col: str = "p_name",
    id_col: str = "p_partkey",
    k: int = 20,
    min_sim_e4: int = 500,
) -> DataFrame:
    """Trigram fuzzy lookup — the pg_trgm analog.

    The reference enables the ``pg_trgm`` extension and puts a trigram
    GIN index on ``products.name`` (``database-schema.sql:5,64``) for
    typo-tolerant product search. Same semantics here: character
    3-grams of the lowercased name, Jaccard similarity against the
    query's trigram set, top-k above a floor.

    Similarity is BIGINT fixed-point (1e-4 units) from integer set
    sizes — bit-identical in Spark and the DuckDB oracle, no float
    knife edge. The scan is a narrow projection + per-row array ops
    (JVM codegen, no shuffle until the top-k sort), so at 100 TB it is
    a single pass; the top-k is a TakeOrderedAndProject, not a full
    sort.
    """
    qgrams = _query_trigrams(query)
    qlit = "array(" + ", ".join("'" + g.replace("'", "\\'") + "'" for g in qgrams) + ")"
    d = (
        df.select(F.col(id_col), F.col(col), F.lower(F.col(col)).alias("_nm"))
        .withColumn(
            "_tri",
            F.expr(
                "array_distinct(filter(transform("
                "sequence(1, greatest(length(_nm) - 2, 1)), "
                "i -> substring(_nm, i, 3)), t -> length(t) = 3))"
            ),
        )
        .withColumn("_inter", F.expr(f"CAST(size(array_intersect(_tri, {qlit})) AS BIGINT)"))
        .withColumn("_union", F.expr(f"CAST(size(array_union(_tri, {qlit})) AS BIGINT)"))
        .withColumn(
            "sim_e4", F.expr("CAST((_inter * 10000) DIV _union AS BIGINT)")
        )
    )
    return (
        d.where(F.col("sim_e4") >= F.lit(min_sim_e4))
        .orderBy(F.desc("sim_e4"), F.col(id_col))
        .limit(k)
        .select(id_col, col, "sim_e4")
    )


def fuzzy_name_search_oracle(
    query: str,
    col: str = "p_name",
    id_col: str = "p_partkey",
    k: int = 20,
    min_sim_e4: int = 500,
    table: str = "part",
) -> str:
    qgrams = _query_trigrams(query)
    qlist = "[" + ", ".join("'" + g.replace("'", "''") + "'" for g in qgrams) + "]"
    return f"""
        WITH n AS (
            SELECT {id_col}, {col}, lower({col}) AS nm FROM {table}
        ),
        t AS (
            SELECT {id_col}, {col},
                   list_distinct(list_filter(list_transform(
                       range(1, greatest(length(nm) - 2, 1) + 1),
                       i -> substr(nm, CAST(i AS INT), 3)),
                       x -> length(x) = 3)) AS tri
            FROM n
        ),
        s AS (
            SELECT {id_col}, {col},
                   CAST(len(list_intersect(tri, {qlist})) AS BIGINT) AS inter,
                   CAST(len(list_distinct(list_concat(tri, {qlist})))
                        AS BIGINT) AS un
            FROM t
        )
        SELECT {id_col}, {col},
               CAST((inter * 10000) // un AS BIGINT) AS sim_e4
        FROM s
        WHERE (inter * 10000) // un >= {min_sim_e4}
        ORDER BY sim_e4 DESC, {id_col}
        LIMIT {k}
    """


# ---------------------------------------------------- LM-proxy quality


def ngram_lm_counts(
    reference: DataFrame,
    n: int = 2,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram frequency table ``(gram_h, cnt)`` — the "language
    model" side of CCNet-style LM-proxy filtering. Built once from a
    trusted reference corpus and persisted; scoring joins against it.

    Grams hash through :func:`_gram_hashes` (longs end-to-end, never
    gram strings); the groupBy is map-side partial, so the shuffle
    carries distinct grams, not occurrences.
    """
    from .partitioning import scale_partitions

    return (
        scale_partitions(reference)
        .select(_norm_token_hashes(col).alias("__th"))
        .select(F.explode(_gram_hashes("__th", n)).alias("gram_h"))
        .groupBy("gram_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_score(
    docs: DataFrame,
    counts: DataFrame,
    n: int = 2,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM-proxy quality score: the mean log-frequency of
    the document's word n-grams under a reference corpus's n-gram
    distribution (:func:`ngram_lm_counts`), plus the out-of-vocabulary
    gram ratio. The cheap stand-in for CCNet's KenLM perplexity filter:
    fluent in-domain text reuses frequent reference grams (high mean
    log-freq, low OOV); gibberish and boilerplate-mangled text does not.

    Scale shape: docs explode to (doc_id, gram_h) longs and LEFT-join
    the counts table on the gram hash — both sides hash-partition on
    ``gram_h``, and when the reference table is small it broadcasts
    (Catalyst decides from its size; no collect here). One per-doc
    aggregation closes it. Returns
    (doc_id, n_grams, avg_logfreq_e6, oov_ratio_e6); the mean is over
    IN-VOCABULARY grams (OOV mass is its own signal, not a -inf term),
    and docs with < n words — or all grams OOV — score NULL avg.
    """
    doc_grams = (
        docs.select(F.col(id_col), _norm_token_hashes(col).alias("__th"))
        .select(id_col, F.explode(_gram_hashes("__th", n)).alias("gram_h"))
    )
    scored = doc_grams.join(counts, "gram_h", "left")
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.avg(F.log(F.col("cnt").cast("double"))).alias("_avg_lf"),
        F.sum(F.when(F.col("cnt").isNull(), 1).otherwise(0)).alias("_oov"),
    )
    out = agg.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.floor(F.col("_avg_lf") * 1e6).cast("long").alias("avg_logfreq_e6"),
        F.expr(
            "CAST((_oov * 1000000) DIV n_grams AS BIGINT)"
        ).alias("oov_ratio_e6"),
    )
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            "avg_logfreq_e6",
            F.coalesce("oov_ratio_e6", F.lit(0)).cast("long").alias(
                "oov_ratio_e6"
            ),
        )
    )


# ------------------------------------------------------- web-corpus prep


_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),  # LAST: "&amp;lt;" must become "&lt;", not "<"
)


def strip_html(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style HTML→text: drop script/style/comment blocks, strip
    tags, unescape the common entities, collapse whitespace — the
    first stage of a web-crawl corpus pipeline, entirely as chained
    ``regexp_replace`` (codegen; no parser dependency, no Python).

    Deliberately a cleaner, not a browser: malformed markup degrades to
    leftover text rather than an error, matching the published C4
    recipe's tolerance. Output: (id, text) with ``col`` replaced.
    """
    x = F.col(col)
    # block elements whose CONTENT must go, then comments; (?s) lets
    # the block patterns span lines, (?i) matches any tag case
    for pat in (
        r"(?is)<script\b[^>]*>.*?</script\s*>",
        r"(?is)<style\b[^>]*>.*?</style\s*>",
        r"(?s)<!--.*?-->",
    ):
        x = F.regexp_replace(x, pat, " ")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    for ent, rep in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.trim(F.regexp_replace(x, r"\s+", " "))
    return df.select(F.col(id_col), x.alias(col))


def url_domain(col: str = "url") -> Column:
    """Registrable host of a URL, lowercased, ``www.`` stripped —
    ``parse_url`` is a built-in, so this stays JVM-side."""
    host = F.lower(F.parse_url(F.col(col), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def filter_by_domain(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    include_subdomains: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents whose URL's domain is on a blocklist (the
    standard crawl-hygiene step). The blocklist is tiny against a
    100 TB corpus, so the anti-join broadcasts; with
    ``include_subdomains`` a blocked ``example.com`` also drops
    ``cdn.example.com`` via a suffix key — built by exploding each
    host's dot-suffixes (bounded by label count, ~constant per row),
    NOT by a non-equi join.

    ``id_col`` must name a unique row id: the subdomain path collects
    blocked ids and anti-joins back on it, so a non-unique id would
    silently drop every row sharing an id with a blocked one. Raises
    if the column is absent rather than guessing by position.
    """
    if include_subdomains and id_col not in df.columns:
        raise ValueError(
            f"filter_by_domain needs unique id column {id_col!r} "
            f"(have: {df.columns}); pass id_col="
        )
    host = url_domain(url_col)
    if not include_subdomains:
        keyed = df.withColumn("__dom", host)
        return keyed.join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("__dom"))),
            on="__dom",
            how="left_anti",
        ).drop("__dom")
    # all dot-suffixes of the host: a.b.c -> [a.b.c, b.c, c]
    labels = F.split(host, r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    exploded = df.withColumn("__suf", F.explode(suffixes))
    blocked_ids = exploded.join(
        F.broadcast(blocklist.select(F.col(domain_col).alias("__suf"))),
        on="__suf",
        how="left_semi",
    ).select(id_col).distinct()
    return df.join(F.broadcast(blocked_ids), on=id_col, how="left_anti")


def corpus_containment(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    n: int = 3,
    col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """How much of corpus B's content already exists in corpus A — the
    acquisition question of corpus curation ("what does this crawl add
    beyond what we have?"), answered as n-gram containment:
    ``|grams(B) ∩ grams(A)| / |grams(B)|`` over DISTINCT word n-grams.

    With ``group_col`` the containment is reported per group of B
    (e.g. per source), so a mostly-redundant feed is visible before it
    is paid for. Scale shape: both sides reduce to distinct 64-bit gram
    hashes (map-side partial distinct — the shuffle carries distinct
    grams, not occurrences); the overlap is one semi-join on the hash,
    and the output is |groups| rows. Returns (group?, n_grams_b,
    n_shared, containment_e6) with exact integer fixed-point.
    """
    from .partitioning import scale_partitions

    def _grams(df: DataFrame, keep: list) -> DataFrame:
        return (
            scale_partitions(df)
            .select(*keep, _norm_token_hashes(col).alias("__th"))
            .select(*keep, F.explode(_gram_hashes("__th", n)).alias("gram_h"))
        )

    a_grams = _grams(corpus_a, []).distinct()
    keys = [group_col] if group_col else []
    b_grams = _grams(corpus_b, keys).distinct()
    shared = b_grams.join(a_grams, "gram_h", "left_semi")

    def _agg(g: DataFrame, out: str) -> DataFrame:
        return (g.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))
                if keys else g.agg(F.count(F.lit(1)).alias(out)))

    totals = _agg(b_grams, "n_grams_b")
    hits = _agg(shared, "n_shared")
    joined = (
        totals.join(hits, on=keys, how="left")
        if keys
        else totals.crossJoin(hits)
    )
    return joined.select(
        *keys,
        F.col("n_grams_b").cast("long").alias("n_grams_b"),
        F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        F.expr(
            "CAST((COALESCE(n_shared, 0) * 1000000)"
            " DIV NULLIF(n_grams_b, 0) AS BIGINT)"
        ).alias("containment_e6"),
    )


def corpus_containment_approx(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    n: int = 3,
    col: str = "text",
    lg_k: int = 14,
) -> DataFrame:
    """The 100 TB tier of :func:`corpus_containment`: containment from
    HyperLogLog sketches instead of an exact distinct semi-join.
    ``|A∩B| = |A| + |B| - |A∪B|`` with each cardinality estimated by a
    Datasketches HLL (``hll_sketch_agg`` / ``hll_union`` — built-ins,
    JVM-side): ONE pass over each corpus, constant-size sketches
    (~2^lg_k bytes) as the only data reaching the driver plan, no gram
    shuffle at all — where the exact tier's distinct + semi-join moves
    every distinct gram of both corpora.

    Standard HLL error (~1.04/√2^lg_k ≈ 0.8% at the default lg_k=14)
    propagates through the subtraction, so containment of very small
    overlaps is noisy — use the exact tier to audit; this tier decides
    "is this feed mostly redundant" at fleet scale. Returns one row:
    (n_grams_a_est, n_grams_b_est, n_shared_est, containment_e6).
    """
    def _sketch(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(_norm_token_hashes(col).alias("__th"))
            .select(F.explode(_gram_hashes("__th", n)).alias("gram_h"))
            .agg(F.hll_sketch_agg("gram_h", F.lit(lg_k)).alias(out))
        )

    joined = _sketch(corpus_a, "sa").crossJoin(_sketch(corpus_b, "sb"))
    est = joined.select(
        F.hll_sketch_estimate("sa").alias("ea"),
        F.hll_sketch_estimate("sb").alias("eb"),
        F.hll_sketch_estimate(F.hll_union("sa", "sb")).alias("eu"),
    )
    return est.select(
        F.col("ea").cast("long").alias("n_grams_a_est"),
        F.col("eb").cast("long").alias("n_grams_b_est"),
        F.greatest(F.lit(0), (F.col("ea") + F.col("eb") - F.col("eu")))
        .cast("long")
        .alias("n_shared_est"),
        F.expr(
            "CAST((GREATEST(0, ea + eb - eu) * 1000000)"
            " DIV NULLIF(eb, 0) AS BIGINT)"
        ).alias("containment_e6"),
    )


# ------------------------------------------------- tokenizer training


def vocab_counts(
    df: DataFrame,
    col: str = "text",
    lowercase: bool = True,
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus word-frequency table ``(token, count)`` — the distributed
    half of tokenizer training: at 100 TB the corpus aggregates down to
    a vocabulary table of at most a few hundred million rows, and every
    subsequent tokenizer step (BPE merges, unigram EM pruning) iterates
    over THAT table, never the corpus again (the standard split in
    published BPE/SentencePiece practice; see :func:`bpe_pair_counts`).

    One explode + one combiner-friendly groupBy shuffle: partial
    counts aggregate map-side, so the exchange carries distinct-token
    partials per partition, not corpus tokens. Without ``top_k`` the
    table comes back UNORDERED (sorting a vocabulary someone is about
    to re-aggregate would be a wasted range shuffle); ``top_k`` uses
    ``orderBy(...).limit`` — Spark's distributed take-ordered, one
    per-partition top-k then a driver merge of k×partitions rows —
    never a single-partition global window, deterministic with ties
    on count breaking by token.

    Capability analog in the reference: the GROUP BY term counting of
    the summary endpoints (`main.py:109-135`) — re-aimed at tokenizer
    vocabularies.
    """
    tok = F.explode(tokens(col)).alias("token")
    t = df.where(F.col(col).isNotNull()).select(tok).where(
        F.col("token") != ""
    )
    if lowercase:
        t = t.select(F.lower(F.col("token")).alias("token"))
    out = (
        t.groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= F.lit(int(min_count)))
    )
    if top_k is not None:
        # ordered take only when the caller wants the top slice — an
        # unconditional global sort would range-shuffle the whole
        # vocabulary for consumers (bpe_pair_counts) that immediately
        # re-aggregate it
        out = out.orderBy(
            F.col("count").desc(), F.col("token").asc()
        ).limit(int(top_k))
    return out


def vocab_counts_oracle(
    lowercase: bool = True,
    min_count: int = 1,
    top_k: int | None = None,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`vocab_counts`."""
    tok = f"unnest({_sql_tokens('text')})"
    word = "lower(token)" if lowercase else "token"
    limit = f"LIMIT {int(top_k)}" if top_k is not None else ""
    return f"""
        WITH toks AS (
            SELECT {tok} AS token FROM {table} WHERE text IS NOT NULL
        )
        SELECT {word} AS token, COUNT(*) AS count
        FROM toks WHERE token <> ''
        GROUP BY 1 HAVING COUNT(*) >= {int(min_count)}
        ORDER BY count DESC, token ASC {limit}
    """


def bpe_pair_counts(
    vocab: DataFrame,
    top_k: int | None = None,
) -> DataFrame:
    """Weighted adjacent-symbol pair frequencies over a
    :func:`vocab_counts` table — the table a BPE trainer consumes to
    pick its next merge: ``(left, right, pair_count)`` where
    ``pair_count = Σ word_count × occurrences-of-pair-in-word``.

    Runs over the VOCABULARY (distinct words × their counts), never
    the corpus — the point of the two-phase split: the first merge
    decision needs exactly this table, and subsequent BPE iterations
    mutate a symbol table that fits one machine (vocabularies cap at
    ~10⁸ distinct words even at web scale, and shrink exponentially
    as merges proceed), so the published trainers all run the merge
    loop driver-side over the aggregated counts. Spark's job is the
    corpus→counts collapse, done here with explode + one
    combiner-friendly shuffle; per-character splitting stays in
    codegen (``split('')``).
    """
    chars = F.split(F.col("token"), "")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(chars) - 2),
        lambda i: F.struct(
            F.element_at(chars, i + 1).alias("left"),
            F.element_at(chars, i + 2).alias("right"),
        ),
    )
    out = (
        vocab.where(F.length("token") >= 2)
        .select(F.col("count"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("left").asc(),
                 F.col("right").asc())
    )
    if top_k is not None:
        out = out.limit(int(top_k))
    return out


def train_bpe(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 1000,
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
    byte_fallback: bool = False,
) -> dict:
    """Learn a BPE merge table from a corpus (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") and
    return a JSON-serializable model for :func:`bpe_encode`.

    The published two-phase split, same as every production trainer
    (subword-nmt, SentencePiece, HF tokenizers): Spark does the ONE
    corpus-sized pass — :func:`vocab_counts`' explode + combiner-
    friendly shuffle down to ``(word, count)`` — and the merge loop
    then iterates driver-side over that aggregated table, never
    touching the corpus again. ``max_words`` bounds the driver
    collect with a deterministic top-k by count (tail words are
    frequency-noise for merge decisions; capping the trainer's word
    table is exactly what SentencePiece's sentence/word limits do).
    Words never merge across boundaries (the corpus is whitespace
    pre-tokenized by :func:`tokens`); no end-of-word marker is added.

    Merge selection is highest pair count, ties broken by ``(left,
    right)`` ascending — the same order :func:`bpe_pair_counts`
    publishes, so the first learned merge always equals that table's
    top row. Learning stops early when the best pair's count drops
    below ``min_pair_count`` (default 2: a pair seen once generalizes
    to nothing, per subword-nmt practice).

    Model fields: ``merges`` (ordered ``[left, right]`` lists),
    ``symbols`` (every base character + merged symbol, deterministic
    order — index = token id for ``bpe_encode(ids=True)``, with the
    final id reserved for OOV), ``lowercase`` (recorded so encode
    preprocesses exactly like training), ``byte_fallback`` (when
    True, the 256 reserved ``<0xNN>`` pieces are appended and encode
    decomposes out-of-vocabulary characters AND inter-word whitespace
    into them — no input is unrepresentable, the OOV id is never
    emitted, and :func:`bpe_decode` round-trips the exact input
    modulo the lowercase normalization; the GPT-2/SentencePiece
    byte-fallback recipe).

    Capability analog in the reference: none (nearest: the term
    counting of the summary endpoints, `main.py:109-135`); this is
    extension-tier surface for LLM training-data pipelines.
    """
    vocab = vocab_counts(
        df, col=col, lowercase=lowercase, min_count=min_count,
        top_k=int(max_words),
    )
    return _learn_from_vocab(
        vocab, num_merges, lowercase, min_pair_count, byte_fallback
    )


def _learn_from_vocab(
    vocab: DataFrame, num_merges: int, lowercase: bool, min_pair_count: int,
    byte_fallback: bool = False,
) -> dict:
    """Shared tail of :func:`train_bpe` and the vocabulary store's
    ``train_bpe_from_store`` — one place for the collect + merge-loop
    handoff, so the two 'identical result' entry points cannot drift."""
    words = [(r["token"], int(r["count"])) for r in vocab.collect()]
    return learn_bpe(
        words, num_merges=num_merges, lowercase=lowercase,
        min_pair_count=min_pair_count, byte_fallback=byte_fallback,
    )


def learn_bpe(
    words: list[tuple[str, int]],
    num_merges: int = 1000,
    lowercase: bool = True,
    min_pair_count: int = 2,
    byte_fallback: bool = False,
) -> dict:
    """Driver-side BPE merge loop over an aggregated ``(word, count)``
    table (see :func:`train_bpe` for the distributed half and the
    model contract). Incremental pair-count maintenance: each merge
    re-indexes only the words that contain the merged pair, so the
    loop is O(affected words × word length) per merge, not a full
    vocabulary re-scan — the standard efficient formulation.

    ``lowercase=True`` (the default, matching :func:`vocab_counts`)
    lowercases the input words and folds their counts, so a
    mixed-case word table can't produce symbols the (lowercasing)
    encoder could never emit.
    """
    if lowercase:
        folded: dict[str, int] = {}
        for w, c in words:
            lw = w.lower()
            folded[lw] = folded.get(lw, 0) + int(c)
        words = list(folded.items())
    seqs: list[list[str]] = [list(w) for w, _ in words]
    wc: list[int] = [int(c) for _, c in words]
    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], dict[int, int]] = {}
    for i, seq in enumerate(seqs):
        _index_word(stats, where, i, seq, wc[i], +1)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        if not stats:
            break
        # highest count, ties by (left, right) ascending — the exact
        # publication order of bpe_pair_counts
        pair = min(stats, key=lambda p: (-stats[p], p))
        if stats[pair] < int(min_pair_count):
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in sorted(where.get(pair, {})):
            old = seqs[i]
            new = _merge_word(old, pair, merged)
            _index_word(stats, where, i, old, wc[i], -1)
            _index_word(stats, where, i, new, wc[i], +1)
            seqs[i] = new
        # fully merged: every occurrence was rewritten, so the pair's
        # count is exactly zero and _index_word already dropped it

    base = sorted({ch for w, _ in words for ch in w})
    symbols = _dedup_symbols(base, merges)
    if byte_fallback:
        # reserved byte pieces LAST (stable learned-symbol ids);
        # _dedup_symbols has already guaranteed no duplicates among
        # the learned strings, and any literal '<0xNN>' the corpus
        # happened to learn keeps its first id (documented
        # reserved-piece caveat in decode_bpe_tokens)
        seen = set(symbols)
        symbols = symbols + [t for t in _BYTE_TOKENS if t not in seen]
    return {
        "format": "spark-graft-bpe/v1",
        "merges": [[left, right] for left, right in merges],
        "symbols": symbols,
        "lowercase": bool(lowercase),
        "byte_fallback": bool(byte_fallback),
    }


#: Reserved byte-fallback pieces, SentencePiece-style: ``<0x00>`` …
#: ``<0xFF>``. Appended to a model's symbol table when trained with
#: ``byte_fallback=True``; encode decomposes out-of-vocabulary
#: characters (and inter-word whitespace) into these, so no input is
#: unrepresentable and decode is exact.
_BYTE_TOKENS = [f"<0x{i:02X}>" for i in range(256)]
_BYTE_SET = frozenset(_BYTE_TOKENS)


def _dedup_symbols(
    base: list[str], merges: list[tuple[str, str]]
) -> list[str]:
    """The model's symbol table: base characters then merged strings,
    de-duplicated preserving first occurrence. Distinct merge pairs
    CAN concatenate to the same string (e.g. (a,bc) and (ab,c) both
    yield 'abc'); without the de-dup, ``bpe_encode``'s
    ``{symbol: index}`` map would silently shadow the earlier index,
    breaking the documented index==token-id bijection and overcounting
    vocabulary size (the OOV id is ``len(symbols)``)."""
    seen: set[str] = set()
    symbols: list[str] = []
    for s in [*base, *(left + right for left, right in merges)]:
        if s not in seen:
            seen.add(s)
            symbols.append(s)
    return symbols


def _index_word(stats, where, i, seq, count, sign) -> None:
    """Add (+1) or remove (-1) word i's adjacent-pair contributions.
    Counts are exact, so a removed pair hits exactly zero and is
    dropped — stats never carries dead entries."""
    for a, b in zip(seq, seq[1:]):
        p = (a, b)
        n = stats.get(p, 0) + sign * count
        if n:
            stats[p] = n
        else:
            stats.pop(p, None)
        occ = where.setdefault(p, {})
        k = occ.get(i, 0) + sign
        if k:
            occ[i] = k
        else:
            occ.pop(i, None)
            if not occ:
                where.pop(p, None)


def _merge_word(seq: list[str], pair: tuple[str, str], merged: str) -> list[str]:
    """All non-overlapping occurrences, left to right (so 'aaa' under
    merge (a,a) becomes ['aa','a']) — the convention both training and
    encoding share."""
    out: list[str] = []
    j = 0
    while j < len(seq):
        if j + 1 < len(seq) and seq[j] == pair[0] and seq[j + 1] == pair[1]:
            out.append(merged)
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return out


def _bpe_segment_word_dropout(
    word: str, ranks: dict[tuple[str, str], int], p: float, rng
) -> list[str]:
    """BPE-dropout segmentation of one word (Provilkov et al. 2020):
    at every step each mergeable adjacent-pair OCCURRENCE survives
    with probability 1−p; the lowest-rank (leftmost on rank ties)
    surviving occurrence merges; the walk stops when no occurrence
    survives a step. p=0 reproduces :func:`bpe_segment_word` exactly
    (single-occurrence leftmost application is order-equivalent to
    the all-occurrences sweep: a merge can only CREATE pairs of
    strictly higher rank, so the winning pair never changes
    mid-sweep); p→1 degenerates toward characters. One rng draw per
    candidate occurrence per step, so the result is a pure function
    of the rng stream."""
    seq = list(word)
    while len(seq) > 1:
        best = None
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is None or rng.random() < p:
                continue
            if best is None or r < best[0]:
                best = (r, i, pair)
        if best is None:
            break
        _, i, pair = best
        seq[i : i + 2] = [pair[0] + pair[1]]
    return seq


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word under a rank table: repeatedly merge the
    lowest-rank adjacent pair present (all occurrences, left to right)
    until no learnable pair remains — equivalent to replaying the
    merges in learned order, in O(pairs present) per step instead of
    O(total merges). Characters outside the training alphabet simply
    stay single-character symbols."""
    seq = list(word)
    while len(seq) > 1:
        best = None
        for p in zip(seq, seq[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        seq = _merge_word(seq, best[1], best[1][0] + best[1][1])
    return seq


def bpe_encode(
    df: DataFrame,
    model: dict,
    col: str = "text",
    out_col: str = "bpe_tokens",
    ids: bool = False,
    dropout: float | None = None,
    seed: int | None = None,
    doc_id_col: str | None = None,
) -> DataFrame:
    """Tokenize a corpus with a :func:`train_bpe` model: adds
    ``out_col`` as ``array<string>`` (symbols) or, with ``ids=True``,
    ``array<int>`` (indexes into ``model["symbols"]``; characters the
    training corpus never saw map to the reserved OOV id
    ``len(symbols)``). NULL text stays NULL; empty/whitespace text
    encodes to an empty array — the module's null-preservation
    contract. Feed the id arrays straight into ``chunking.chunk_pack``
    for sequence packing.

    Encoding is per-row pure — embarrassingly parallel, no shuffle —
    but iterative merging can't be expressed in codegen, so this is a
    deliberate Arrow-batched ``pandas_udf`` with a per-batch word
    memo: under a Zipfian corpus almost every word in a batch is a
    cache hit, so the amortized cost per row is a dict probe per
    word. (The alternative — distinct-word join — would need a
    positional explode plus an ordered collect_list shuffle to
    rebuild documents: strictly worse than shuffle-free encode.)

    ``dropout`` enables BPE-dropout (Provilkov et al. 2020) — the BPE
    twin of the unigram tier's ``sample_alpha``: each mergeable pair
    occurrence survives a step with probability 1−p, so repeated
    epochs see varied subword segmentations of the same corpus. Draws
    are a pure crc32 function of ``(seed, word, occurrence-within-doc,
    doc id)`` — layout-invariant, replay-safe; the seed is required
    and should vary per epoch, and ``doc_id_col`` SHOULD name a stable
    per-row key so occurrences resample independently across
    documents. ``dropout=0.0`` reproduces the deterministic
    segmentation exactly.
    """
    if dropout is not None and seed is None:
        # validate DRIVER-side: the factory's own check would only
        # fire inside the executor UDF, after a full job launch
        raise ValueError(
            "BPE-dropout needs an explicit seed (vary it per epoch): "
            "a shared default would reproduce the identical token "
            "stream every epoch, silently disabling the regularization"
        )
    ret = "array<int>" if ids else "array<string>"
    tables = _bpe_encoder_tables(model, ids)

    if dropout is not None and doc_id_col is not None:

        @F.pandas_udf(ret)
        def enc2(texts: pd.Series, keys: pd.Series) -> pd.Series:
            one_doc = _make_bpe_encoder(
                model, ids=ids, tables=tables, dropout=dropout, seed=seed,
            )
            return pd.Series(
                [one_doc(t, k) for t, k in zip(texts, keys)],
                index=texts.index, dtype=object,
            )

        return df.withColumn(out_col, enc2(F.col(col), F.col(doc_id_col)))

    @F.pandas_udf(ret)
    def enc(texts: pd.Series) -> pd.Series:
        # tables built once driver-side and shipped in the closure;
        # the encoder is re-made per Arrow BATCH only so the word
        # memo stays batch-bounded — a worker-lifetime memo would
        # grow with the corpus vocabulary
        one_doc = _make_bpe_encoder(
            model, ids=ids, tables=tables, dropout=dropout, seed=seed,
        )
        return texts.map(one_doc)

    return df.withColumn(out_col, enc(F.col(col)))


def _bpe_encoder_tables(model: dict, ids: bool = False) -> tuple:
    """The model's lookup tables, built ONCE (driver side, captured in
    the UDF closure) — rebuilding the ranks/symbol dicts per Arrow
    batch would pay tens of millions of dict inserts on a large-model
    encode; only the word memo is per-batch state."""
    ranks = {
        (left, right): r for r, (left, right) in enumerate(model["merges"])
    }
    lowercase = bool(model.get("lowercase", True))
    fallback = bool(model.get("byte_fallback", False))
    known = set(model["symbols"])
    sym_ids = (
        {s: i for i, s in enumerate(model["symbols"])} if ids else None
    )
    oov = len(model["symbols"])
    return ranks, lowercase, fallback, known, sym_ids, oov


def _make_bpe_encoder(
    model: dict, ids: bool = False, tables=None,
    dropout: float | None = None, seed: int | None = None,
):
    """The pure per-document encoder behind :func:`bpe_encode` —
    module-level so the round-trip property tests drive EXACTLY the
    code the Arrow UDF runs. Returns ``one_doc(text, doc_key=None) ->
    list``; each call starts a fresh word memo (per-batch cache
    bound), reusing prebuilt ``tables`` when given.

    ``dropout`` switches deterministic segmentation to BPE-dropout
    (Provilkov et al. 2020, :func:`_bpe_segment_word_dropout`) — the
    BPE twin of the unigram tier's subword-regularization sampling,
    and the same draw contract: a pure crc32 function of ``(seed,
    word, occurrence-within-doc, doc key)``, layout-invariant and
    replay-safe, with the seed REQUIRED explicit (vary it per epoch)
    and the doc key recommended so occurrences resample independently
    across documents.

    Whitespace: ``re.ASCII`` makes ``\\s`` the Java-regex class
    Spark's ``tokens()`` splits on ([ \\t\\n\\x0b\\f\\r]) — Python's
    default Unicode ``\\s`` (and ``str.split()``) would additionally
    split on NBSP/thin-space/U+2028, silently diverging from the
    training segmentation on web text.

    Byte-fallback models additionally (a) decompose any symbol outside
    the vocabulary — including lone surrogates (``surrogatepass``) —
    into its UTF-8 byte tokens, (b) encode the whitespace runs BETWEEN
    words as byte tokens, and (c) byte-expand a segmented symbol that
    COLLIDES with a reserved ``<0xNN>`` piece (a corpus that literally
    learned '<0x41>' would otherwise decode it as byte 0x41) — so
    every input is representable and ``decode_bpe_tokens`` round-trips
    the exact input string (modulo the model's lowercase
    normalization). Cost note for the ``chunk_pack`` path: each word
    boundary costs one ``<0x20>`` token, so fallback id sequences run
    ~one token per word longer than plain-model ones, and whitespace
    never participates in merges (unlike GPT-2's byte-level pretokens,
    which fold the leading space into word pieces).
    """
    import random
    import re
    import zlib

    if dropout is not None and seed is None:
        raise ValueError(
            "BPE-dropout needs an explicit seed (vary it per epoch): "
            "a shared default would reproduce the identical token "
            "stream every epoch, silently disabling the regularization"
        )
    ranks, lowercase, fallback, known, sym_ids, oov = (
        tables if tables is not None else _bpe_encoder_tables(model, ids)
    )
    ws = re.compile(r"\s+", re.ASCII)
    ws_capture = re.compile(r"(\s+)", re.ASCII)
    memo: dict = {}

    def byte_toks(s: str) -> list:
        toks = [
            _BYTE_TOKENS[b]
            for b in s.encode("utf-8", errors="surrogatepass")
        ]
        if sym_ids is not None:
            return [sym_ids[t] for t in toks]
        return toks

    def emit(segs: list[str]) -> list:
        if fallback:
            got: list = []
            for s in segs:
                # a learned symbol equal to a reserved byte piece
                # byte-expands like an unknown symbol: emitting it
                # literally would make decode read it as a byte
                if s in known and s not in _BYTE_SET:
                    got.append(sym_ids[s] if sym_ids is not None else s)
                else:
                    got.extend(byte_toks(s))
            return got
        if sym_ids is not None:
            return [sym_ids.get(s, oov) for s in segs]
        return segs

    def one_word(w: str) -> list:
        got = memo.get(w)
        if got is None:
            got = emit(
                bpe_segment_word(w.lower() if lowercase else w, ranks)
            )
            memo[w] = got
        return got

    def dropped_word(w: str, occ: int, dk: int) -> list:
        # memoize only keyless draws (dk=0): there (word, occ) repeats
        # ACROSS documents in a batch and hits; with a per-doc key
        # every (w, occ, dk) is computed exactly once, so caching
        # would be a write-only dict growing with the batch's tokens
        key = (w, occ)
        if dk == 0:
            got = memo.get(key)
            if got is not None:
                return got
        norm = w.lower() if lowercase else w
        rng = random.Random(
            (zlib.crc32(norm.encode("utf-8", "surrogatepass")) << 32)
            ^ (int(seed) * 1_000_003 + occ)
            ^ (dk * 2_654_435_761)
        )
        got = emit(
            _bpe_segment_word_dropout(norm, ranks, float(dropout), rng)
        )
        if dk == 0:
            memo[key] = got
        return got

    def one_doc(t, doc_key=None):
        if t is None:
            return None
        out: list = []
        if dropout is None:

            def word_toks(w, _occ):
                return one_word(w)
        else:
            dk = (
                0 if doc_key is None
                else zlib.crc32(
                    str(doc_key).encode("utf-8", "surrogatepass")
                )
            )
            occ_counts: dict[str, int] = {}

            def word_toks(w, _occ=None):
                k = occ_counts.get(w, 0)
                occ_counts[w] = k + 1
                return dropped_word(w, k, dk)

        if fallback:
            # capture-split: even indexes are words, odd are ASCII-ws
            # runs (byte-encoded, so decode restores them exactly)
            for i, part in enumerate(ws_capture.split(t)):
                if not part:
                    continue
                if i % 2 == 1:
                    out.extend(byte_toks(part))
                else:
                    out.extend(word_toks(part, None))
        else:
            for w in ws.split(t):
                if w:
                    out.extend(word_toks(w, None))
        return out

    return one_doc


def decode_bpe_tokens(tokens, model: dict, ids: bool = False) -> str | None:
    """Invert :func:`bpe_encode` for one token list. For
    ``byte_fallback`` models this is a TRUE inverse: unknown
    characters and inter-word whitespace were byte-encoded, so the
    exact input string comes back (modulo the model's recorded
    lowercase normalization). For plain models word boundaries were
    not encoded, so words come back concatenated (documented lossy
    path) and the reserved OOV id decodes to U+FFFD.

    Reserved byte pieces only ever arrive from the byte-fallback
    encoder (a LEARNED symbol colliding with ``<0xNN>`` is
    byte-expanded at encode time, never emitted literally), so
    treating them as bytes here is unambiguous. NULL elements inside
    a token array (ids or symbols) decode to U+FFFD instead of
    crashing the batch; byte runs decode with ``surrogatepass`` so
    lone-surrogate inputs round-trip too, falling back to
    replacement characters for byte sequences that are not UTF-8 at
    all (hand-corrupted ids)."""
    if tokens is None:
        return None
    syms = model["symbols"]
    fallback = bool(model.get("byte_fallback", False))

    def flush(buf: bytearray) -> str:
        try:
            return bytes(buf).decode("utf-8", errors="surrogatepass")
        except UnicodeDecodeError:
            return bytes(buf).decode("utf-8", errors="replace")

    out: list[str] = []
    buf = bytearray()
    for t in tokens:
        if t is None:
            t = "�"
        elif ids:
            t = syms[t] if 0 <= int(t) < len(syms) else "�"
        if fallback and t in _BYTE_SET:
            buf.append(int(t[3:5], 16))
            continue
        if buf:
            out.append(flush(buf))
            buf.clear()
        out.append(t)
    if buf:
        out.append(flush(buf))
    return "".join(out)


def bpe_decode(
    df: DataFrame,
    model: dict,
    col: str = "bpe_tokens",
    out_col: str = "text_decoded",
    ids: bool = False,
) -> DataFrame:
    """DataFrame twin of :func:`decode_bpe_tokens`: per-row pure,
    shuffle-free Arrow pass (same rationale as :func:`bpe_encode`)."""

    @F.pandas_udf("string")
    def dec(tok: pd.Series) -> pd.Series:
        return tok.map(
            lambda t: decode_bpe_tokens(
                None if t is None else list(t), model, ids=ids
            )
        )

    return df.withColumn(out_col, dec(F.col(col)))


# ------------------------------------------------- unigram LM tokenizer


def _piece_options(
    word: str, i: int, logp: dict, max_piece_len: int, unk: float
):
    """Candidate (start j, piece log-prob) pairs for a piece ENDING at
    position ``i`` — THE single enumeration both the Viterbi argmax
    and the sampling walk consume, including the unknown-character
    fallback (a char absent from the model scores ``unk``), so the
    two paths cannot drift."""
    for j in range(max(0, i - max_piece_len), i):
        lp = logp.get(word[j:i])
        if lp is None:
            if i - j != 1:
                continue
            lp = unk
        yield j, lp


def _viterbi_segment(
    word: str, logp: dict, max_piece_len: int, unk: float
) -> list[str]:
    """Best segmentation of one word under a unigram piece model:
    standard Viterbi DP over end positions, pieces bounded to
    ``max_piece_len``. A character absent from the model segments as
    itself under the ``unk`` penalty, so EVERY word is segmentable.
    Ties resolve to the first-found (smallest start) candidate —
    deterministic for a fixed model."""
    n = len(word)
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j, lp in _piece_options(word, i, logp, max_piece_len, unk):
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if n and best[n] == float("-inf"):
        # unreachable end = corrupted model (e.g. max_piece_len < 1):
        # backtracking would silently emit the whole word as one
        # out-of-model piece — fail loudly instead
        raise ValueError(
            f"no segmentation path for {word!r}; the model's "
            "max_piece_len/pieces are inconsistent"
        )
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def learn_unigram(
    words: list[tuple[str, int]],
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    prune_frac: float = 0.2,
    em_iters: int = 2,
    lowercase: bool = True,
    byte_fallback: bool = False,
) -> dict:
    """Driver-side unigram-LM trainer over an aggregated ``(word,
    count)`` table (Kudo 2018, "Subword Regularization" — the
    SentencePiece unigram algorithm; see :func:`train_unigram` for the
    distributed half). Viterbi-EM simplification: the E-step uses hard
    best-segmentation counts instead of full forward–backward
    expectations — the documented common approximation; prune order
    and the final model are deterministic.

    Seeding: every substring up to ``max_piece_len`` of the word
    table, frequency-weighted, capped at 4× the multi-char vocabulary
    target (``vocab_size`` minus the alphabet size — SentencePiece
    seeds from an ESA over sentences; the word-table variant is the
    same idea over the bounded vocab).
    Single characters are never pruned, so any training-alphabet word
    stays segmentable; retained-but-unused characters get an additive
    0.5-count floor instead of -inf.

    Model: ``pieces`` (deterministic order — index = token id for
    ``unigram_encode(ids=True)``, final id reserved for
    unknown-character fallback), ``logprobs_e6`` (fixed-point micro
    log-probs, JSON-stable), ``lowercase``, ``max_piece_len``,
    ``byte_fallback`` (when True, the 256 reserved ``<0xNN>`` pieces
    are appended — same recipe as :func:`learn_bpe` — and encode
    decomposes unknown characters AND inter-word whitespace into
    them, so no input is unrepresentable, the reserved unknown id is
    never emitted, and :func:`unigram_decode` round-trips the exact
    input modulo the lowercase normalization; closes the lossy
    OOV-collapse path the plain model has).
    """
    if lowercase:
        folded: dict[str, int] = {}
        for w, c in words:
            lw = w.lower()
            folded[lw] = folded.get(lw, 0) + int(c)
        words = list(folded.items())

    freq: dict[str, int] = {}
    chars: set[str] = set()
    for w, c in words:
        for i in range(len(w)):
            chars.add(w[i])
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                s = w[i : i + ln]
                freq[s] = freq.get(s, 0) + int(c)
    multi = sorted(
        (s for s in freq if len(s) > 1), key=lambda s: (-freq[s], s)
    )
    target_multi = max(0, int(vocab_size) - len(chars))
    pieces = sorted(chars) + multi[: target_multi * 4]
    total = sum(freq[p] for p in pieces) or 1
    logp = {p: math.log(freq[p] / total) for p in pieces}

    def em(cur: dict, iters: int) -> tuple[dict, dict]:
        counts: dict[str, float] = {}
        for _ in range(max(1, iters)):
            counts = {}
            unk = min(cur.values(), default=0.0) - 10.0
            for w, c in words:
                for s in _viterbi_segment(w, cur, max_piece_len, unk):
                    if s in cur:
                        counts[s] = counts.get(s, 0.0) + c
            # chars are never dropped; unused ones keep a 0.5 floor
            for ch in chars:
                counts[ch] = counts.get(ch, 0.0) or 0.5
            tot = sum(counts.values()) or 1.0
            cur = {
                p: math.log(counts[p] / tot)
                for p in cur
                if counts.get(p) or len(p) == 1
            }
        return cur, counts

    logp, counts = em(logp, em_iters)
    while True:
        n_multi = sum(1 for p in logp if len(p) > 1)
        if n_multi <= target_multi:
            break
        excess = n_multi - target_multi
        drop_n = min(excess, max(1, int(n_multi * prune_frac)))
        victims = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (counts.get(p, 0.0), p),
        )[:drop_n]
        for p in victims:
            del logp[p]
        logp, counts = em(logp, em_iters)
    order = sorted(logp, key=lambda p: (-counts.get(p, 0.0), p))
    lp_e6 = [int(math.floor(logp[p] * 1e6)) for p in order]
    if byte_fallback:
        # reserved byte pieces LAST (stable learned-piece ids), same
        # as learn_bpe; a learned piece that literally equals a
        # reserved '<0xNN>' keeps its first id but is byte-expanded at
        # encode time (it is excluded from the segmentation table in
        # _unigram_tables), so decode can treat every <0xNN> as a byte
        # unambiguously. Their recorded log-prob is the unk penalty
        # (min learned − 10): they are emit-time artifacts, never
        # Viterbi candidates, so the value only matters for
        # JSON-shape consistency of the parallel arrays.
        floor_e6 = (min(lp_e6) if lp_e6 else 0) - 10_000_000
        seen = set(order)
        extra = [t for t in _BYTE_TOKENS if t not in seen]
        order = order + extra
        lp_e6 = lp_e6 + [floor_e6] * len(extra)
    return {
        "format": "spark-graft-unigram/v1",
        "pieces": order,
        "logprobs_e6": lp_e6,
        "lowercase": bool(lowercase),
        "max_piece_len": int(max_piece_len),
        "byte_fallback": bool(byte_fallback),
    }


def train_unigram(
    df: DataFrame,
    col: str = "text",
    vocab_size: int = 1000,
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int = 1_000_000,
    max_piece_len: int = 8,
    prune_frac: float = 0.2,
    em_iters: int = 2,
    byte_fallback: bool = False,
) -> dict:
    """Unigram-LM tokenizer over a corpus — the same published
    two-phase split as :func:`train_bpe`: Spark does the ONE
    corpus-sized pass (:func:`vocab_counts`' combiner shuffle down to
    a bounded ``(word, count)`` table), and the seed/EM/prune loop
    (:func:`learn_unigram`) iterates driver-side over that table,
    never touching the corpus again. The BPE/unigram pair covers both
    halves of standard tokenizer practice (SentencePiece ships
    exactly these two trainers)."""
    vocab = vocab_counts(
        df, col=col, lowercase=lowercase, min_count=min_count,
        top_k=int(max_words),
    )
    words = [(r["token"], int(r["count"])) for r in vocab.collect()]
    return learn_unigram(
        words, vocab_size=vocab_size, max_piece_len=max_piece_len,
        prune_frac=prune_frac, em_iters=em_iters, lowercase=lowercase,
        byte_fallback=byte_fallback,
    )


def _unigram_tables(model: dict) -> tuple:
    max_len = int(model.get("max_piece_len", 8))
    if max_len < 1:
        raise ValueError(
            f"corrupt unigram model: max_piece_len={max_len} (must be >= 1)"
        )
    fallback = bool(model.get("byte_fallback", False))
    # under byte_fallback the reserved <0xNN> pieces are EXCLUDED from
    # the segmentation table: Viterbi/sampling must never produce one
    # (decode reads every <0xNN> as a byte, so a literal '<0x41>' in
    # the text has to segment through its characters instead), and the
    # unk penalty stays min(LEARNED)−10 rather than dropping another
    # 10 below the byte pieces' recorded floor
    logp = {
        p: lp / 1e6
        for p, lp in zip(model["pieces"], model["logprobs_e6"])
        if not (fallback and p in _BYTE_SET)
    }
    unk = min(logp.values(), default=0.0) - 10.0
    sym_ids = {p: i for i, p in enumerate(model["pieces"])}
    return (
        logp, unk, sym_ids, len(model["pieces"]),
        bool(model.get("lowercase", True)),
        max_len,
        fallback,
    )


def _sample_segment(
    word: str, logp: dict, max_piece_len: int, unk: float,
    alpha: float, rng,
) -> list[str]:
    """Sample one segmentation ∝ P(seg)^alpha — subword regularization
    (Kudo 2018 §3): forward log-masses over end positions, then a
    backward categorical walk. ``alpha`` interpolates uniform-over-
    segmentations (→0) to Viterbi-argmax (→∞). Same unknown-character
    fallback as :func:`_viterbi_segment`."""
    n = len(word)
    if n == 0:
        return []
    fwd = [0.0] + [float("-inf")] * n

    def opts_at(i: int) -> list[tuple[int, float]]:
        return [
            (j, fwd[j] + alpha * lp)
            for j, lp in _piece_options(word, i, logp, max_piece_len, unk)
            if fwd[j] != float("-inf")
        ]

    for i in range(1, n + 1):
        opts = opts_at(i)
        if opts:
            m = max(w for _, w in opts)
            fwd[i] = m + math.log(sum(math.exp(w - m) for _, w in opts))
    if fwd[n] == float("-inf"):
        raise ValueError(
            f"no segmentation path for {word!r}; the model's "
            "max_piece_len/pieces are inconsistent"
        )
    # backward walk RECOMPUTES each visited position's options instead
    # of retaining O(n·max_piece_len) candidate tuples: a megabyte
    # no-whitespace blob (base64/DNA) must not hold ~8M boxed tuples
    # in the Arrow worker when only the sampled path's positions —
    # O(path·max_piece_len) work — are ever visited
    out: list[str] = []
    i = n
    while i > 0:
        opts = opts_at(i)
        m = max(w for _, w in opts)
        weights = [math.exp(w - m) for _, w in opts]
        tot = sum(weights)
        r = rng.random() * tot
        j = opts[-1][0]
        for (jj, _), wt in zip(opts, weights):
            r -= wt
            if r <= 0:
                j = jj
                break
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _make_unigram_segmenter(
    model: dict,
    ids: bool = False,
    tables=None,
    sample_alpha: float | None = None,
    seed: int | None = None,
):
    """The pure per-document segmenter behind :func:`unigram_encode`
    and :func:`unigram_logprob` — module-level so tests drive EXACTLY
    the code the Arrow passes run (the ``_make_bpe_encoder``
    convention). Returns ``one_doc(text) -> list``; each call starts a
    fresh word memo (per-batch cache bound), reusing prebuilt
    ``tables`` when given. Same ASCII whitespace contract and NULL
    preservation as BPE; unknown characters map to the reserved id
    ``len(pieces)`` under ``ids=True``.

    ``sample_alpha`` switches Viterbi argmax to subword-regularization
    SAMPLING (Kudo 2018): segmentations drawn ∝ P(seg)^alpha via
    forward-filter/backward-sample. Draws are a pure function of
    ``(seed, word, occurrence-within-document, doc key)`` —
    crc32-seeded, process-independent (Python's ``hash`` is salted per
    process and would break layout-invariance) — so reruns and retries
    reproduce the same corpus while REPEATED occurrences of a word
    draw independent segmentations. The doc key (``one_doc``'s second
    argument — data, e.g. the doc id, never layout) decorrelates draws
    ACROSS documents: without it the k-th occurrence of a word would
    receive the identical segmentation in every document corpus-wide,
    one draw per (word, occurrence-rank) — Kudo resamples per
    sentence. ``seed`` must be EXPLICIT in sampling mode and should
    vary per epoch — a silently-shared default would make every
    epoch's "augmented" stream byte-identical, the exact
    regularization failure the mode exists to prevent.

    Byte-fallback models mirror :func:`_make_bpe_encoder` exactly:
    inter-word whitespace runs and any segment outside the learned
    pieces (unknown characters; a learned piece colliding with a
    reserved ``<0xNN>``) are emitted as UTF-8 byte tokens
    (``surrogatepass``), so every input is representable, the
    reserved unknown id is never emitted, and
    :func:`decode_unigram_tokens` is a true inverse (modulo the
    model's recorded lowercase normalization)."""
    import random
    import re
    import zlib

    if sample_alpha is not None and seed is None:
        raise ValueError(
            "sampling mode needs an explicit seed (vary it per "
            "epoch): a shared default would reproduce the identical "
            "token stream every epoch, silently disabling the "
            "regularization"
        )
    logp, unk, sym_ids, oov, lowercase, max_len, fallback = (
        tables if tables is not None else _unigram_tables(model)
    )
    ws = re.compile(r"\s+", re.ASCII)
    ws_capture = re.compile(r"(\s+)", re.ASCII)
    memo: dict = {}

    def byte_toks(s: str) -> list:
        toks = [
            _BYTE_TOKENS[b]
            for b in s.encode("utf-8", errors="surrogatepass")
        ]
        if ids:
            return [sym_ids[t] for t in toks]
        return toks

    def emit(segs: list[str]) -> list:
        if fallback:
            got: list = []
            for s in segs:
                # segmentation excludes <0xNN> pieces (see
                # _unigram_tables), so a known piece here is always a
                # learned one; anything else is an unknown character
                if s in sym_ids and s not in _BYTE_SET:
                    got.append(sym_ids[s] if ids else s)
                else:
                    got.extend(byte_toks(s))
            return got
        if ids:
            return [sym_ids.get(s, oov) for s in segs]
        return segs

    def viterbi_word(w: str) -> list:
        got = memo.get(w)
        if got is None:
            got = emit(_viterbi_segment(
                w.lower() if lowercase else w, logp, max_len, unk
            ))
            memo[w] = got
        return got

    def sampled_word(w: str, occ: int, dk: int) -> list:
        # memoize only keyless draws (dk=0): there (word, occ) repeats
        # ACROSS documents in a batch and hits; with a per-doc key
        # every (w, occ, dk) is computed exactly once, so caching
        # would be a write-only dict growing with the batch's tokens
        key = (w, occ)
        if dk == 0:
            got = memo.get(key)
            if got is not None:
                return got
        norm = w.lower() if lowercase else w
        rng = random.Random(
            (zlib.crc32(norm.encode("utf-8", "surrogatepass")) << 32)
            ^ (int(seed) * 1_000_003 + occ)
            ^ (dk * 2_654_435_761)
        )
        got = emit(_sample_segment(
            norm, logp, max_len, unk, float(sample_alpha), rng
        ))
        if dk == 0:
            memo[key] = got
        return got

    def one_doc(t, doc_key=None):
        if t is None:
            return None
        out: list = []
        if sample_alpha is None:
            if fallback:
                # capture-split: even indexes are words, odd are
                # ASCII-ws runs (byte-encoded, so decode restores them)
                for i, part in enumerate(ws_capture.split(t)):
                    if not part:
                        continue
                    if i % 2 == 1:
                        out.extend(byte_toks(part))
                    else:
                        out.extend(viterbi_word(part))
            else:
                for w in ws.split(t):
                    if w:
                        out.extend(viterbi_word(w))
            return out
        # sampling: the doc key is data (str round-trip, crc32) — a
        # missing key degrades to the per-(word, occ) draw, documented
        dk = (
            0 if doc_key is None
            else zlib.crc32(str(doc_key).encode("utf-8", "surrogatepass"))
        )
        occ: dict[str, int] = {}
        if fallback:
            for i, part in enumerate(ws_capture.split(t)):
                if not part:
                    continue
                if i % 2 == 1:
                    out.extend(byte_toks(part))
                else:
                    k = occ.get(part, 0)
                    occ[part] = k + 1
                    out.extend(sampled_word(part, k, dk))
        else:
            for w in ws.split(t):
                if w:
                    k = occ.get(w, 0)
                    occ[w] = k + 1
                    out.extend(sampled_word(w, k, dk))
        return out

    return one_doc


def unigram_encode(
    df: DataFrame,
    model: dict,
    col: str = "text",
    out_col: str = "unigram_tokens",
    ids: bool = False,
    sample_alpha: float | None = None,
    seed: int | None = None,
    doc_id_col: str | None = None,
) -> DataFrame:
    """Tokenize a corpus with a :func:`train_unigram` model: Viterbi
    best segmentation per word (:func:`_make_unigram_segmenter`),
    shuffle-free Arrow pass with a per-batch word memo — the exact
    execution shape of :func:`bpe_encode`. ``sample_alpha`` enables
    subword-regularization sampling — deterministic per ``(seed,
    word, occurrence-within-doc, doc id)``, so the pass stays
    layout-invariant and replay-safe; the seed is required and should
    vary per epoch, and ``doc_id_col`` SHOULD name a stable per-row
    key in sampling mode — without it the k-th occurrence of a word
    draws the same segmentation in every document corpus-wide,
    collapsing the within-epoch diversity the mode exists for (Kudo
    2018 resamples per sentence)."""
    if sample_alpha is not None and seed is None:
        # validate DRIVER-side (the _make_bpe_encoder convention): the
        # factory's own check would only fire inside the executor UDF
        raise ValueError(
            "sampling mode needs an explicit seed (vary it per "
            "epoch): a shared default would reproduce the identical "
            "token stream every epoch, silently disabling the "
            "regularization"
        )
    tables = _unigram_tables(model)
    ret = "array<int>" if ids else "array<string>"

    if sample_alpha is not None and doc_id_col is not None:

        @F.pandas_udf(ret)
        def enc2(texts: pd.Series, keys: pd.Series) -> pd.Series:
            one_doc = _make_unigram_segmenter(
                model, ids=ids, tables=tables,
                sample_alpha=sample_alpha, seed=seed,
            )
            return pd.Series(
                [one_doc(t, k) for t, k in zip(texts, keys)],
                index=texts.index, dtype=object,
            )

        return df.withColumn(out_col, enc2(F.col(col), F.col(doc_id_col)))

    @F.pandas_udf(ret)
    def enc(texts: pd.Series) -> pd.Series:
        # tables shipped once in the closure; the segmenter is re-made
        # per Arrow BATCH only so the word memo stays batch-bounded
        one_doc = _make_unigram_segmenter(
            model, ids=ids, tables=tables,
            sample_alpha=sample_alpha, seed=seed,
        )
        return texts.map(one_doc)

    return df.withColumn(out_col, enc(F.col(col)))


def decode_unigram_tokens(tokens, model: dict, ids: bool = False) -> str | None:
    """Invert :func:`unigram_encode` for one token list — the unigram
    twin of :func:`decode_bpe_tokens`, and literally the same
    machinery: the model's ``pieces`` play the symbol table, and under
    ``byte_fallback`` every reserved ``<0xNN>`` piece decodes as a
    byte (the encoder never emits one for any other reason). Plain
    models are the documented lossy path: word boundaries were not
    encoded (words concatenate) and the reserved unknown id decodes
    to U+FFFD."""
    return decode_bpe_tokens(
        tokens,
        {
            "symbols": model["pieces"],
            "byte_fallback": bool(model.get("byte_fallback", False)),
        },
        ids=ids,
    )


def unigram_decode(
    df: DataFrame,
    model: dict,
    col: str = "unigram_tokens",
    out_col: str = "text_decoded",
    ids: bool = False,
) -> DataFrame:
    """DataFrame twin of :func:`decode_unigram_tokens`: per-row pure,
    shuffle-free Arrow pass (the :func:`bpe_decode` shape)."""

    @F.pandas_udf("string")
    def dec(tok: pd.Series) -> pd.Series:
        return tok.map(
            lambda t: decode_unigram_tokens(
                None if t is None else list(t), model, ids=ids
            )
        )

    return df.withColumn(out_col, dec(F.col(col)))


def unigram_logprob(
    df: DataFrame,
    model: dict,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean piece log-probability under the trained
    unigram LM — the tokenizer-native cousin of the CCNet
    perplexity filter (:func:`ngram_lm_score` is the reference-corpus
    n-gram variant): fluent in-domain text segments into frequent
    pieces (high mean log-prob); gibberish decomposes into rare
    pieces and unknown-character fallbacks. Returns ``(id_col,
    n_pieces, avg_logprob_e6)`` — NULL text scores NULL, empty text
    scores (0, NULL). One narrow mapInPandas pass, no shuffle, no
    per-field struct re-evaluation.

    ``byte_fallback`` models score through a PLAIN view (reserved
    ``<0xNN>`` pieces stripped, fallback off): the fallback encoder
    emits a byte token per whitespace run and per unknown-char byte,
    each of which would otherwise score the unk floor — a fluent
    100-word document would drown in ~99 floor-scored whitespace
    tokens and the fluency signal this function exists for would
    collapse. The scored segmentation is therefore identical whether
    the model was trained with fallback or not."""
    from pyspark.sql.types import LongType, StructField, StructType

    if model.get("byte_fallback"):
        kept = [
            (p, lp)
            for p, lp in zip(model["pieces"], model["logprobs_e6"])
            if p not in _BYTE_SET
        ]
        model = {
            **model,
            "pieces": [p for p, _ in kept],
            "logprobs_e6": [lp for _, lp in kept],
            "byte_fallback": False,
        }
    tables = _unigram_tables(model)
    in_schema = df.select(id_col, col).schema
    out_schema = StructType([
        in_schema[0],
        StructField("n_pieces", LongType()),
        StructField("avg_logprob_e6", LongType()),
    ])

    def score(batches):
        logp, unk = tables[0], tables[1]
        for pdf in batches:
            # segmenter re-made per batch: the word memo must stay
            # batch-bounded (the _make_bpe_encoder convention — a
            # partition-lifetime memo grows with the vocabulary)
            one_doc = _make_unigram_segmenter(model, tables=tables)
            ids_out, n_out, avg_out = [], [], []
            for rid, t in zip(pdf[id_col], pdf[col]):
                ids_out.append(rid)
                toks = one_doc(t)
                if toks is None:
                    n_out.append(None)
                    avg_out.append(None)
                    continue
                n = len(toks)
                n_out.append(n)
                avg_out.append(
                    int(math.floor(
                        sum(logp.get(s, unk) for s in toks) / n * 1e6
                    )) if n else None
                )
            yield pd.DataFrame({
                id_col: ids_out,
                "n_pieces": pd.array(n_out, dtype="Int64"),
                "avg_logprob_e6": pd.array(avg_out, dtype="Int64"),
            })

    return df.select(id_col, col).mapInPandas(score, out_schema)


# -------------------------------------------- DSIR importance resampling


# compiled once: _dsir_doc_counts runs per DOCUMENT on the corpus-wide
# hot path of both the fit and the scoring pass
_DSIR_WS = _re_mod.compile(r"\s+", _re_mod.ASCII)
_DSIR_CRC = _zlib_mod.crc32


def _dsir_doc_buckets(text: str, n: int, buckets: int) -> list[int]:
    """Hashed n-gram feature bucket SEQUENCE for one document — THE
    single featurizer body behind both the fit pass and the scoring
    pass, so the two cannot drift: lowercase, ASCII-whitespace word
    split (the module convention), word 1..n-grams, crc32 mod
    ``buckets``. One bucket per gram occurrence, multiplicity
    preserved.

    The r14 form re-joined and re-encoded the gram string per (i, g)
    — O(gram bytes) string work per gram. CRC32 is streamable
    (``crc32(a + b) == crc32(b, crc32(a))``), so each order-g running
    crc extends the order-(g-1) crc at the same start by one
    pre-encoded ``b" " + word`` chunk: identical bucket values (exact
    CRC identity, not an approximation), ~2x less per-gram Python
    work (r15, guide §4.2)."""
    words = [w for w in _DSIR_WS.split(text.lower()) if w]
    wb = [w.encode("utf-8", "surrogatepass") for w in words]
    crc = _DSIR_CRC
    run = [crc(w) for w in wb]
    out = [c % buckets for c in run]
    if n > 1 and len(wb) > 1:
        spwb = [b" " + w for w in wb]
        for g in range(2, n + 1):
            if len(wb) < g:
                break
            run = [
                crc(spwb[i + g - 1], run[i])
                for i in range(len(wb) - g + 1)
            ]
            out.extend(c % buckets for c in run)
    return out


def _dsir_doc_counts(text: str, n: int, buckets: int):
    """{bucket: count} view of :func:`_dsir_doc_buckets` — the sparse
    per-document feature counts the classifier paths consume."""
    from collections import Counter

    return dict(Counter(_dsir_doc_buckets(text, n, buckets)))


def _dsir_partials(
    df: DataFrame, col: str, n: int, buckets: int
) -> DataFrame:
    """Per-partition hashed-n-gram bucket-count partials, SPARSE: one
    ``(b, k)`` row per NONZERO bucket per partition — the
    :func:`~.similarity.gram_partials` mergeable-sketch shape, but
    emitted as rows so the merge can stay in Spark (a groupBy-sum in
    :func:`dsir_fit`) instead of collecting partitions × ``buckets``
    dense vectors to the driver (the r10 scale nit: at ~800k
    partitions × 10k buckets that collect was ~64 GB of driver
    traffic). One corpus pass, no shuffle here; the dense per-
    partition accumulator keeps the per-gram hot path an int add."""
    import numpy as np

    src = df.select(F.col(col).alias("t")).where(F.col(col).isNotNull())

    def acc(batches):
        c = np.zeros(buckets, dtype=np.int64)
        for pdf in batches:
            for t in pdf["t"]:
                bl = _dsir_doc_buckets(t, n, buckets)
                if bl:
                    # exact integer histogram of the bucket sequence —
                    # identical counts to the r14 per-gram dict adds,
                    # one C-speed bincount per document (guide §4.2)
                    c += np.bincount(bl, minlength=buckets)
        nz = np.flatnonzero(c)
        if nz.size:
            yield pd.DataFrame({"b": nz.astype(np.int64), "k": c[nz]})

    return src.mapInPandas(acc, "b long, k long")


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    col: str = "text",
    n: int = 2,
    buckets: int = 10_000,
    smoothing: float = 1.0,
) -> dict:
    """Fit a DSIR importance model (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed word
    1..n-gram bucket distributions are estimated for the TARGET
    domain sample and for the RAW corpus (additively smoothed), and
    the per-bucket log-ratio ``log p_target − log q_raw`` is the
    model — a document's importance log-weight is then its feature
    counts dotted with this vector. Exactly one pass over each input:
    per-partition sparse partials merge by a Spark-side groupBy-sum
    (shuffle rows ≤ partitions × nonzero buckets, already partition-
    combined), so driver traffic is ≤ ``buckets`` (bucket, count)
    pairs per input REGARDLESS of partition count — full-corpus fits
    are safe, though a sample still estimates the raw distribution
    just as well and faster. The model is a JSON-safe dict with
    fixed-point micro log-ratios.

    ``raw`` may be a sample of the corpus (the distribution estimate
    is what matters, not coverage); ``target`` is the domain to
    select FOR (e.g. curated reference text). Capability analog in
    the reference: none — extension-tier training-data selection."""
    import numpy as np

    def _counts(df: DataFrame, what: str) -> "np.ndarray":
        rows = (
            _dsir_partials(df, col, int(n), int(buckets))
            .groupBy("b")
            .agg(F.sum("k").alias("k"))
            .collect()
        )
        if not rows:
            # covers both no non-null rows AND rows yielding zero
            # grams (all-whitespace text) — a distribution estimated
            # from nothing would silently be the uniform smoother
            raise ValueError(
                f"dsir_fit needs non-empty {what} text (got no "
                "featurizable rows)"
            )
        c = np.zeros(int(buckets), dtype=np.int64)
        for r in rows:
            c[r["b"]] = r["k"]
        return c

    return _dsir_model_from_counts(
        _counts(target, "target"), _counts(raw, "raw"),
        n, buckets, smoothing,
    )


def _dsir_model_from_counts(
    p, q, n: int, buckets: int, smoothing: float
) -> dict:
    """Assemble a DSIR model from dense TARGET/RAW bucket-count
    vectors (numpy int64, length ``buckets``) — THE single
    model-construction arithmetic: :func:`dsir_fit` (one-shot fits)
    and the count store's refit path
    (:func:`~etl_workflow_spark.streaming.incremental.dsir_fit_from_stores`,
    which reads persisted per-batch partials instead of re-scanning
    the corpus) both call this, so identical counts produce
    bit-identical models on either path."""
    import numpy as np

    p = p + float(smoothing)
    q = q + float(smoothing)
    ratio = np.log(p / p.sum()) - np.log(q / q.sum())
    return {
        "format": "spark-graft-dsir/v1",
        "n": int(n),
        "buckets": int(buckets),
        "smoothing": float(smoothing),
        "log_ratio_e6": [int(math.floor(x * 1e6)) for x in ratio],
    }


def _dsir_logw_udf(model: dict):
    """Validate a :func:`dsir_fit` model and return the scalar Arrow
    UDF computing a text's importance log-weight under it (feature
    counts × the bucket log-ratio vector; NULL text → NULL) — THE one
    scoring body: :func:`dsir_score`, the training-set recipe's
    selection stage (``corpus.materialize_training_set(dsir=...)``),
    and its extension path all call this, so an engine-side scoring
    drift between them is structurally impossible. A scalar UDF
    rather than ``mapInPandas`` so callers can ATTACH the weight as a
    column without a join and only the text column crosses the Arrow
    boundary."""
    if model.get("format") != "spark-graft-dsir/v1":
        raise ValueError(
            f"not a dsir_fit model (format={model.get('format')!r})"
        )
    n = int(model["n"])
    buckets = int(model["buckets"])
    ratio_b = model["log_ratio_e6"]
    if len(ratio_b) != buckets:
        # a truncated/corrupted model would otherwise die executor-side
        # as an opaque IndexError after real work is spent
        raise ValueError(
            f"corrupt dsir model: {len(ratio_b)} log-ratios for "
            f"{buckets} buckets"
        )

    @F.pandas_udf("long")
    def logw(ts: pd.Series) -> pd.Series:
        import numpy as np

        # int64 gather+sum over the bucket sequence: sums R[b] exactly
        # once per gram occurrence == the r14 per-bucket k * R[b] dict
        # walk (exact int64 arithmetic, |w| bounded by grams x |R|max
        # ~ 1e11, far inside int64)
        R = np.asarray(ratio_b, dtype=np.int64)
        ws = []
        for t in ts:
            if t is None:
                ws.append(None)
                continue
            bl = _dsir_doc_buckets(t, n, buckets)
            ws.append(int(R[bl].sum()) if bl else 0)
        return pd.Series(pd.array(ws, dtype="Int64"))

    return logw


def dsir_score(
    df: DataFrame,
    model: dict,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weight under a
    :func:`dsir_fit` model: feature counts × the bucket log-ratio
    vector, one shuffle-free Arrow pass with the (buckets-sized)
    vector shipped in the closure. Returns ``(id_col, logw_e6
    bigint)`` — fixed-point so downstream comparisons are exact and
    layout-invariant; NULL text scores NULL."""
    return df.select(
        id_col, _dsir_logw_udf(model)(F.col(col)).alias("logw_e6")
    )


def dsir_select(
    df: DataFrame,
    model: dict,
    n_select: int,
    salt: str = "dsir-v1",
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance-RESAMPLE ``n_select`` documents toward the model's
    target domain: weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick — key = logw + Gumbel(0,1), take the top
    ``n_select`` — with the Gumbel noise a pure hash function of
    ``(salt, id)``, so the selection is deterministic, replayable,
    and independent of partitioning/layout (the
    ``operators/sampling.py`` contract; the paper samples with
    fresh randomness — a salt change is this formulation's re-roll).
    The mechanism is :func:`~.sampling.weighted_sample_k` (one
    distributed TakeOrdered; no global sort materializes). NULL-text
    rows are never selected. Returns the selected rows of ``df``
    unchanged."""
    from .sampling import weighted_sample_k

    scored = dsir_score(df, model, col=col, id_col=id_col).withColumn(
        "__logw", F.col("logw_e6").cast("double") / F.lit(1e6)
    )
    chosen = weighted_sample_k(
        scored, "__logw", int(n_select), key=id_col, salt=salt
    ).select(id_col)
    return df.join(chosen, id_col, "left_semi")


# ------------------------------------- linear quality classifier (qcls)


def quality_classifier_fit(
    pos: DataFrame,
    neg: DataFrame,
    col: str = "text",
    n: int = 2,
    buckets: int = 4096,
    sample_size: int = 2048,
    epochs: int = 150,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> dict:
    """Train a fastText-style linear quality classifier (Joulin et
    al. 2016, "Bag of Tricks for Efficient Text Classification"):
    length-normalized hashed word 1..n-gram counts through logistic
    regression — the LEARNED quality gate of the GPT-3/PaLM-era
    pipelines (positives = curated reference text, negatives = raw
    crawl), complementing the heuristic gate (:func:`text_quality`)
    and DSIR (:func:`dsir_fit` matches a target DISTRIBUTION; this
    learns a supervised decision boundary). Features come from THE
    shared featurizer (:func:`_dsir_doc_counts`), so classifier
    scores and importance weights live in the same hashed space.

    Training is driver-side full-batch gradient descent on a bounded
    deterministic per-class sample (the :func:`~.similarity.pq_fit`
    convention — the smallest-content-hash ``sample_size`` rows per
    side, zero init, fixed ``epochs``, no RNG anywhere, so the model
    is a pure function of the inputs); scoring is the distributed
    one-pass op (:func:`quality_classifier_score`). The model is a
    JSON-safe dict with FIXED-POINT weights: the score's integer
    part is exact, layout-invariant, and SQL-replayable (it rides
    the `sampling_splits` cross-engine gate)."""
    import numpy as np

    def _sample_texts(df: DataFrame, what: str) -> list[str]:
        src = df.select(F.col(col).alias("t")).where(F.col(col).isNotNull())
        rows = (
            src.orderBy(F.xxhash64(F.lit("qcls-sample"), F.col("t")), "t")
            .limit(int(sample_size))
            .collect()
        )
        texts = [r["t"] for r in rows]
        if not texts:
            raise ValueError(
                f"quality_classifier_fit needs non-empty {what} text"
            )
        return texts

    pos_t = _sample_texts(pos, "positive")
    neg_t = _sample_texts(neg, "negative")
    b_ = int(buckets)
    X = np.zeros((len(pos_t) + len(neg_t), b_), dtype=np.float64)
    kept = []
    for i, t in enumerate(pos_t + neg_t):
        cnt = _dsir_doc_counts(t, int(n), b_)
        tot = sum(cnt.values())
        if not tot:
            continue  # gram-less rows carry no signal either way
        for bk, k in cnt.items():
            X[i, bk] = k / tot
        kept.append(i)
    y = np.array(
        [1.0 if i < len(pos_t) else 0.0 for i in kept], dtype=np.float64
    )
    if not len(kept) or y.min() == y.max():
        raise ValueError(
            "quality_classifier_fit needs featurizable rows on BOTH "
            "sides (a one-class fit has no boundary to learn)"
        )
    X = X[kept]
    w = np.zeros(b_, dtype=np.float64)
    bias = 0.0
    m = float(len(y))
    for _ in range(int(epochs)):
        z = X @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / m + l2 * w)
        bias -= lr * float(g.mean())
    return {
        "format": "spark-graft-qcls/v1",
        "n": int(n),
        "buckets": b_,
        "bias_e6": int(math.floor(bias * 1e6)),
        "weights_e6": [int(math.floor(x * 1e6)) for x in w],
    }


def _qcls_model_params(model: dict) -> tuple[int, int, list, float]:
    """Validate a :func:`quality_classifier_fit` model and unpack
    ``(n, buckets, weights_e6, bias)`` — THE one validation body, so
    the standalone scorer, the recipe's learned quality gate
    (:func:`_qcls_prob_udf`), and any future consumer refuse corrupt
    models identically (and driver-side, not as an opaque executor
    IndexError after real work is spent)."""
    if model.get("format") != "spark-graft-qcls/v1":
        raise ValueError(
            "not a quality_classifier_fit model (format="
            f"{model.get('format')!r})"
        )
    n = int(model["n"])
    buckets = int(model["buckets"])
    weights = model["weights_e6"]
    if len(weights) != buckets:
        raise ValueError(
            f"corrupt qcls model: {len(weights)} weights for "
            f"{buckets} buckets"
        )
    return n, buckets, weights, float(model["bias_e6"]) / 1e6


def _qcls_doc_eval(
    t: str, n: int, buckets: int, W: list, bias: float
) -> tuple[int, int, float]:
    """One document under a qcls model: ``(qdot_e6, n_grams, prob)``
    — THE single scoring arithmetic (shared featurizer
    :func:`_dsir_doc_counts`, integer dot against the fixed-point
    weights, calibrated sigmoid of the length-normalized logit).
    Both :func:`quality_classifier_score` and the recipe gate's
    :func:`_qcls_prob_udf` call this, so the two cannot drift."""
    cnt = _dsir_doc_counts(t, n, buckets)
    tot = sum(cnt.values())
    dot = 0
    for bk, k in cnt.items():
        dot += k * W[bk]
    logit = (dot / 1e6 / tot if tot else 0.0) + bias
    return dot, tot, 1.0 / (1.0 + math.exp(-logit))


def _qcls_prob_udf(model: dict):
    """Validate a qcls model and return the scalar Arrow UDF computing
    a text's calibrated quality probability under it (NULL text →
    NULL) — the thresholdable form the training-set recipe's learned
    quality gate consumes (``corpus.materialize_training_set(
    qcls=...)`` and its extension path both call this, so a scoring
    drift between build and extension is structurally impossible). A
    scalar UDF rather than ``mapInPandas`` so the recipe can filter
    in place without a join; only the text column crosses the Arrow
    boundary. Same arithmetic as :func:`quality_classifier_score`'s
    ``prob`` column (:func:`_qcls_doc_eval`)."""
    n, buckets, weights, bias = _qcls_model_params(model)

    @F.pandas_udf("double")
    def prob(ts: pd.Series) -> pd.Series:
        W = weights  # plain ints: exact, no numpy boxing per gram
        out = []
        for t in ts:
            out.append(
                None if t is None
                else _qcls_doc_eval(t, n, buckets, W, bias)[2]
            )
        return pd.Series(pd.array(out, dtype="Float64"))

    return prob


def quality_classifier_score(
    df: DataFrame,
    model: dict,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document classifier score under a
    :func:`quality_classifier_fit` model, one shuffle-free Arrow
    pass: ``(id_col, qdot_e6 bigint, n_grams bigint, prob double)``
    where ``qdot_e6 = Σ count_b · w_e6[b]`` (exact integers — the
    cross-engine-checkable part) and ``prob`` is the calibrated
    sigmoid of the length-normalized logit
    ``qdot_e6/1e6/n_grams + bias``. Filter with
    ``.where("prob >= 0.5")`` (or any threshold tuned on held-out
    labels). NULL text scores NULL; gram-less text scores
    ``(0, 0, sigmoid(bias))``."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    n, buckets, weights, bias = _qcls_model_params(model)
    in_schema = df.select(id_col, col).schema
    out_schema = StructType([
        in_schema[0],
        StructField("qdot_e6", LongType()),
        StructField("n_grams", LongType()),
        StructField("prob", DoubleType()),
    ])

    def score(batches):
        W = weights  # plain ints: exact, no numpy boxing per gram
        for pdf in batches:
            ids, dots, tots, probs = [], [], [], []
            for rid, t in zip(pdf[id_col], pdf[col]):
                ids.append(rid)
                if t is None:
                    dots.append(None)
                    tots.append(None)
                    probs.append(None)
                    continue
                dot, tot, p = _qcls_doc_eval(t, n, buckets, W, bias)
                dots.append(dot)
                tots.append(tot)
                probs.append(p)
            yield pd.DataFrame({
                id_col: ids,
                "qdot_e6": pd.array(dots, dtype="Int64"),
                "n_grams": pd.array(tots, dtype="Int64"),
                "prob": pd.array(probs, dtype="Float64"),
            })

    return df.select(id_col, col).mapInPandas(score, out_schema)


# --------------------------------------------------- BM25 full-text search


def build_text_index(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted postings table for BM25 full-text search (Robertson &
    Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
    Beyond"): one row per distinct ``(term, doc)`` with the in-doc
    term frequency and the doc's token length denormalized onto the
    row — ``(term string, id, tf int, dl int)``. Terms are the
    module's whitespace tokens, lowercased (search is case-folding;
    per-doc keyword profiles — :func:`tfidf_top_terms` — are not).
    NULL/whitespace-only docs contribute no postings. This is the
    Lucene shape re-expressed relationally: the postings table is the
    index — write it partitioned (or bucketed) by ``term`` and a
    query's broadcast-join probe prunes to exactly the query terms'
    rows. Corpus stats (N, total tokens) are derivable from the table
    itself (``COUNT(DISTINCT id)`` / ``SUM(tf)``), so a prebuilt index
    answers queries without touching the raw corpus.

    Capability analog in the reference: none — extension-tier corpus
    search (slicing/exploration over the `documents` table)."""
    from .partitioning import scale_partitions

    toks = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    # dl counts NON-EMPTY tokens: trim strips only spaces, so a
    # tab/newline-padded doc's split carries phantom '' tokens that
    # would silently inflate its BM25 length normalization
    return (
        scale_partitions(df.where(F.col(col).isNotNull()))
        .select(
            F.col(id_col),
            F.explode(toks).alias("term"),
            F.size(F.filter(toks, lambda t: t != "")).alias("dl"),
        )
        .where(F.col("term") != "")
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            "term",
            id_col,
            F.col("tf").cast("int").alias("tf"),
            F.col("dl").cast("int").alias("dl"),
        )
    )


def _bm25_index_stats(postings: DataFrame, id_col: str) -> tuple[int, int]:
    """The index's (n_docs, total_tokens) pair — ONE bounded agg,
    shared by :func:`bm25_topk` and :func:`expand_queries` so the
    expansion path never re-scans the index for numbers the ranking
    pass already derived."""
    row = postings.agg(
        F.countDistinct(F.col(id_col)).alias("n"),
        F.sum("tf").alias("total"),
    ).collect()[0]
    return int(row["n"] or 0), int(row["total"] or 0)


def bm25_topk(
    df: DataFrame | None,
    queries,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    max_df_ratio: float | None = None,
    stats: tuple[int, int] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Top-k documents per query under BM25, exactly and
    deterministically: per query term,

    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` (the Lucene form —
    always positive) and
    ``contrib = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``,
    each term's contribution FIXED-POINTED (floor at e6) BEFORE the
    per-(query, doc) sum, so the score is an integer sum — associative,
    layout-invariant, and bit-replayable by a SQL oracle regardless of
    either engine's summation order (the module's cross-engine
    convention; both engines floor the identical IEEE double, built by
    the identically-parenthesized expression). Repeated query terms
    weight by their multiplicity (bag semantics). Ties rank by
    ``id`` ascending.

    ``queries`` is a list of strings or a DataFrame with a ``query``
    column; ``postings`` short-circuits the index build with a
    prebuilt :func:`build_text_index` table (the 100 TB path: the
    postings live as a term-partitioned table and the corpus is never
    re-tokenized per query). Plan shape: the tiny query-term frame
    broadcasts into the postings scan (candidates = postings rows for
    query terms only, the Lucene probe), per-term doc frequencies
    aggregate from those candidates and broadcast back, the integer
    sum shuffles only candidate rows, and the rank cut is a windowed
    top-k (WindowGroupLimit pushes k into the shuffle). The postings
    table evaluates three times per call (corpus stats, per-term df,
    scoring); with a PREBUILT index that is three scans of a stored
    table — two of them broadcast-pruned to the query terms — while
    the inline path re-tokenizes, so batch queries and pass
    ``postings=`` in production. ``max_df_ratio`` drops query terms
    whose document frequency exceeds that fraction of the corpus
    (query-time stopword elimination): a corpus-frequent term owns a
    ~corpus-sized posting list — THE skew that dominates hybrid query
    cost at scale — while contributing near-zero idf, so pruning it
    bounds the candidate scan at almost no ranking cost; documents
    matching ONLY pruned terms leave the result. ``stats`` injects a
    prebuilt ``(n_docs, total_tokens)`` pair
    (:func:`_bm25_index_stats`) so a caller ranking repeatedly over
    one index skips the stats agg. Returns
    ``(query, id, n_terms int, score_e4 bigint, rank int)``."""
    if postings is None:
        if df is None:
            raise ValueError("bm25_topk needs df or postings")
        # One call evaluates the postings lineage three times (corpus
        # stats, per-term df, scoring) — with an INLINE build each
        # evaluation would re-tokenize the corpus. Materialize the
        # built index once: localCheckpoint stores the blocks
        # executor-side (memory-and-disk) and truncates the lineage,
        # and the blocks are context-cleaned when the result is
        # dropped — unlike persist(), nothing leaks in the cache
        # manager. The production path (postings=, the stored
        # term-clustered table) is untouched: a stored table re-scan
        # is already broadcast-pruned to the query terms.
        # (``materialize=False`` = plan-inspection escape hatch.)
        postings = build_text_index(df, col=col, id_col=id_col)
        if materialize:
            postings = postings.localCheckpoint(eager=True)
    spark = postings.sparkSession
    if not isinstance(queries, DataFrame):
        # dedupe: the query string IS the result key, and a duplicate
        # would silently FOLD into one group with doubled qtf (wrong
        # scores) instead of returning twice
        qlist = list(dict.fromkeys(queries))
        if not qlist:
            raise ValueError("bm25_topk needs at least one query")
        queries = spark.createDataFrame(
            [(q,) for q in qlist], "query string"
        )
    else:
        queries = queries.dropDuplicates(["query"])
    qtoks = F.split(F.trim(F.lower(F.col("query"))), r"\s+")
    qterms = (
        queries.select("query", F.explode(qtoks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("query", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    # one scalar action for corpus stats (bounded driver state, the
    # tfidf_top_terms contract): N docs + total tokens from the index
    # — or reuse a caller-provided pair (expand_queries ranks and
    # expands over the same index; re-aggregating would re-scan it)
    if stats is None:
        stats = _bm25_index_stats(postings, id_col)
    n_docs, total = stats
    if n_docs == 0:
        raise ValueError("bm25_topk: the postings index is empty")
    avgdl = total / n_docs
    hits = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    if max_df_ratio is not None:
        # stopword elimination at query time — the classic hot-term
        # control: a term in more than max_df_ratio of the corpus has
        # a posting list ~corpus-sized (the skew that dominates query
        # cost at 100 TB) and near-zero idf (near-zero score signal),
        # so dropping it from the probe prunes the candidate scan by
        # orders of magnitude while barely moving the ranking. The cut
        # is exact integer math (df * 1 > N * ratio avoided: compare
        # df <= N * ratio as double — both engines would mirror it,
        # but the pruned tier is pytest-gated, not oracle-gated).
        dfreq = dfreq.where(
            F.col("df") <= F.lit(float(max_df_ratio)) * F.lit(n_docs)
        )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        idf
        * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * (F.col("dl") / F.lit(avgdl))
                )
            )
        )
        * F.col("qtf")
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .withColumn("c_e6", F.floor(contrib * F.lit(1e6)))
        .groupBy("query", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c_e6").alias("s_e6"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(
        F.col("s_e6").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select(
            "query",
            id_col,
            F.col("n_terms").cast("int").alias("n_terms"),
            F.expr("s_e6 div 100").alias("score_e4"),
            "rank",
        )
    )


def bm25_topk_pruned(
    df: DataFrame | None,
    queries,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    max_df_ratio: float | None = None,
    stats: tuple[int, int] | None = None,
) -> DataFrame:
    """:func:`bm25_topk` with MaxScore-style candidate pruning (Turtle
    & Flood 1995; the block-max/WAND family's Spark-shaped member) —
    RESULT-IDENTICAL to the exhaustive ranker (pytest-enforced row
    equality), but documents that provably cannot enter the top-k are
    dropped BEFORE the scoring aggregation, so the per-(query, doc)
    shuffle carries the candidates a hot term would otherwise flood:

    1. **Per-term upper bound**: ``ub_t = idf_t · max_doc(tf_part) ·
       qtf`` — the max over the term's postings of the SAME double
       expression the exact scorer uses (double multiplication is
       monotone, so every posting's contribution ≤ its term's bound),
       e6-floored into the exact scorer's own fixed point. Computed in
       the one aggregation pass that already derives per-term document
       frequencies.
    2. **Threshold seed**: each query's highest-bound term (typically
       its rarest) has its postings scored EXACTLY; the k-th best
       partial score is a LOWER bound θ on the final k-th best full
       score (partial ≤ full, contributions are nonnegative). Fewer
       than k postings → no θ → no pruning (still exact).
    3. **Essential terms (MaxScore)**: terms sorted by bound
       ascending; the maximal prefix whose cumulative bound sum stays
       < θ is "non-essential" — a document containing ONLY those
       terms scores < θ and cannot rank. Candidate rows prune to
       documents touching ≥ 1 essential term, then score through the
       IDENTICAL fixed-point pipeline.

    On a hot-term query (one corpus-frequent + one rare term) the hot
    term's bound falls below θ, its ~corpus-sized posting list becomes
    non-essential, and the scored candidates collapse to ~the rare
    term's document frequency (tools/scalecheck.py ``--bm25-pruning``
    measures the reduction). Single-hot-term queries gain nothing
    (their one term is always essential) and pay one extra pruned
    scan — the same trade the published algorithms make. Composes
    with ``max_df_ratio`` (applied first, exactly as the exhaustive
    path). At 100 TB pair with a term-partitioned prebuilt
    ``postings`` table: every pass here is broadcast-pruned to query
    terms, and the pruning bounds the one remaining corpus-shaped
    cost — the candidate shuffle.

    Capability analog in the reference: none — extension tier
    (SCALE.md §17's named residual, closed)."""
    return _bm25_pruned_parts(
        df, queries, k=k, k1=k1, b=b, col=col, id_col=id_col,
        postings=postings, max_df_ratio=max_df_ratio, stats=stats,
    )[0]


def _bm25_pruned_parts(
    df: DataFrame | None,
    queries,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
    max_df_ratio: float | None = None,
    stats: tuple[int, int] | None = None,
):
    """:func:`bm25_topk_pruned` decomposed: returns ``(result,
    candidate_docs, kept_docs)`` so tools/scalecheck.py can measure
    the scored-candidate reduction with the OPERATOR'S OWN pruning
    decisions rather than a re-implementation that could drift."""
    if postings is None:
        if df is None:
            raise ValueError("bm25_topk_pruned needs df or postings")
        postings = build_text_index(
            df, col=col, id_col=id_col
        ).localCheckpoint(eager=True)
    spark = postings.sparkSession
    if not isinstance(queries, DataFrame):
        qlist = list(dict.fromkeys(queries))
        if not qlist:
            raise ValueError("bm25_topk_pruned needs at least one query")
        queries = spark.createDataFrame(
            [(q,) for q in qlist], "query string"
        )
    else:
        queries = queries.dropDuplicates(["query"])
    qtoks = F.split(F.trim(F.lower(F.col("query"))), r"\s+")
    qterms = (
        queries.select("query", F.explode(qtoks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("query", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    if stats is None:
        stats = _bm25_index_stats(postings, id_col)
    n_docs, total = stats
    if n_docs == 0:
        raise ValueError("bm25_topk_pruned: the postings index is empty")
    avgdl = total / n_docs
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
    )
    hits = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    # ONE pass over the query terms' postings: document frequency AND
    # the per-term max of the exact scorer's tf expression
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.max(tf_part).alias("__mx"),
    )
    if max_df_ratio is not None:
        dfreq = dfreq.where(
            F.col("df") <= F.lit(float(max_df_ratio)) * F.lit(n_docs)
        )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    # per-(query, term) upper bound in the scorer's own fixed point:
    # floor is safe because every posting's floored contribution is
    # <= the unfloored bound, and integer sums compare exactly
    qub = (
        qterms.join(dfreq, "term")
        .withColumn(
            "__ub_e6",
            F.floor(idf * F.col("__mx") * F.col("qtf") * F.lit(1e6)),
        )
    )
    from pyspark.sql.window import Window

    wq = Window.partitionBy("query")
    best = (
        qub.withColumn(
            "__r",
            F.row_number().over(
                wq.orderBy(F.col("__ub_e6").desc(), F.col("term").asc())
            ),
        )
        .where(F.col("__r") == 1)
        .select("query", "term", "qtf")
    )
    contrib = idf * tf_part * F.col("qtf")
    # θ: the k-th best EXACT partial score on the best term's postings
    theta = (
        postings.join(F.broadcast(best), "term")
        .join(F.broadcast(dfreq.select("term", "df")), "term")
        .withColumn("__p_e6", F.floor(contrib * F.lit(1e6)))
        .withColumn(
            "__r",
            F.row_number().over(
                wq.orderBy(F.col("__p_e6").desc(), F.col(id_col).asc())
            ),
        )
        .where(F.col("__r") == F.lit(int(k)))
        .select("query", F.col("__p_e6").alias("__theta_e6"))
    )
    # MaxScore split: ascending cumulative bound sum; a term whose
    # inclusive prefix sum stays under θ is non-essential
    cum = F.sum("__ub_e6").over(
        wq.orderBy(F.col("__ub_e6").asc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    essential = (
        qub.join(theta, "query", "left")
        .withColumn("__cum", cum)
        .where(
            F.col("__theta_e6").isNull()
            | (F.col("__cum") >= F.col("__theta_e6"))
        )
        .select("query", "term")
    )
    cand = postings.join(F.broadcast(qterms), "term")
    keep_docs = (
        cand.join(F.broadcast(essential), ["query", "term"], "left_semi")
        .select("query", id_col)
        .distinct()
    )
    scored = (
        cand.join(keep_docs, ["query", id_col], "left_semi")
        .join(F.broadcast(dfreq.select("term", "df")), "term")
        .withColumn("c_e6", F.floor(contrib * F.lit(1e6)))
        .groupBy("query", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c_e6").alias("s_e6"),
        )
    )
    w = wq.orderBy(F.col("s_e6").desc(), F.col(id_col).asc())
    result = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select(
            "query",
            id_col,
            F.col("n_terms").cast("int").alias("n_terms"),
            F.expr("s_e6 div 100").alias("score_e4"),
            "rank",
        )
    )
    cand_docs = cand.join(
        F.broadcast(dfreq.select("term")), "term"
    ).select("query", id_col).distinct()
    return result, cand_docs, keep_docs


def bm25_topk_oracle(
    queries: list[str] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    queries_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (inline index build): the
    identically-parenthesized per-term double, floored at e6, integer-
    summed — so hashes match bit-for-bit. Queries come either as
    literal strings (``queries``) or as a SQL subquery yielding a
    ``query`` column (``queries_sql`` — for gate entries whose query
    text is DERIVED from the data on both engines)."""
    if queries_sql is not None:
        # DISTINCT mirrors the engine-side dedup — a duplicate query
        # string would fold qtf on one side only
        qcte = f"q AS (SELECT DISTINCT query FROM ({queries_sql}))"
    else:
        vals = ", ".join(
            "('" + q.replace("'", "''") + "')"
            for q in dict.fromkeys(queries)
        )
        qcte = f"q(query) AS (VALUES {vals})"
    t = "string_split_regex(trim(lower(text)), '\\s+')"
    qt = "string_split_regex(trim(lower(query)), '\\s+')"
    return f"""
        WITH {qcte},
        qterms AS (
            SELECT query, term, COUNT(*) AS qtf FROM (
                SELECT query, unnest({qt}) AS term FROM q
            ) WHERE term <> '' GROUP BY 1, 2
        ),
        post AS (
            SELECT term, doc_id, COUNT(*) AS tf, dl FROM (
                SELECT doc_id, unnest({t}) AS term,
                       len(list_filter({t}, x -> x <> '')) AS dl
                FROM {table} WHERE text IS NOT NULL
            ) WHERE term <> '' GROUP BY term, doc_id, dl
        ),
        stats AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs,
                   CAST(SUM(tf) AS DOUBLE) / COUNT(DISTINCT doc_id)
                       AS avgdl
            FROM post
        ),
        dfreq AS (
            SELECT term, COUNT(*) AS df FROM post
            WHERE term IN (SELECT DISTINCT term FROM qterms)
            GROUP BY 1
        ),
        contrib AS (
            SELECT qterms.query, post.doc_id,
                   CAST(floor((ln(1.0 + (stats.n_docs - dfreq.df + 0.5)
                                         / (dfreq.df + 0.5))
                       * ((post.tf * ({k1!r} + 1.0))
                          / (post.tf + {k1!r}
                             * ((1.0 - {b!r})
                                + {b!r} * (post.dl / stats.avgdl))))
                       * qterms.qtf) * 1000000.0) AS BIGINT) AS c_e6
            FROM post
            JOIN qterms USING (term)
            JOIN dfreq USING (term)
            CROSS JOIN stats
        ),
        scored AS (
            SELECT query, doc_id, COUNT(*) AS n_terms,
                   SUM(c_e6) AS s_e6
            FROM contrib GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query, doc_id, n_terms, s_e6,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query
                                           ORDER BY s_e6 DESC, doc_id)
                        AS INT) AS rank
            FROM scored
        )
        SELECT query, doc_id, CAST(n_terms AS INT) AS n_terms,
               s_e6 // 100 AS score_e4, rank
        FROM ranked WHERE rank <= {int(k)}
    """


# ------------------------------------------------------ WordPiece tokenizer


#: The WordPiece unknown token (BERT convention). Always id 0 in a
#: learned model's vocab, so [UNK] rates are cheap to audit.
_WP_UNK = "[UNK]"


def learn_wordpiece(
    words: list[tuple[str, int]],
    vocab_size: int = 1000,
    lowercase: bool = True,
    min_pair_count: int = 2,
) -> dict:
    """Driver-side WordPiece vocabulary learning over an aggregated
    ``(word, count)`` table (Schuster & Nakajima 2012; the BERT
    tokenizer, Devlin et al. 2019) — the third tokenizer family next
    to BPE (:func:`learn_bpe`) and unigram (:func:`train_unigram`).
    Same two-phase shape as both: Spark's ONE corpus pass aggregates
    the word table, this loop never touches the corpus.

    WordPiece differs from BPE only in SELECTION: instead of the most
    frequent pair, it merges the pair maximizing the likelihood gain
    ``count(ab) / (count(a) * count(b))`` under the current
    segmentation (the published trainer score, as in HF tokenizers).
    The comparison is done in EXACT integer arithmetic by cross-
    multiplication — ``c1*l2*r2 vs c2*l1*r1`` — so ties are real ties
    (broken by (left, right) ascending) and the learned vocab can
    never depend on float rounding. Word-internal continuation pieces
    carry the ``##`` prefix; a merge of ``(a, ##b)`` yields ``ab``
    and of ``(##b, ##c)`` yields ``##bc`` (the merged token keeps the
    left side's position class). Learning stops at ``vocab_size``
    total entries, when no pair reaches ``min_pair_count``, or when
    no pairs remain.

    Model fields: ``vocab`` (ordered — ``[UNK]`` first, then base
    pieces sorted, then merges in learned order; index = token id),
    ``lowercase``, ``unk``, ``max_input_chars_per_word`` (BERT's 100:
    longer words map to [UNK] wholesale, bounding the encoder's
    quadratic worst case). WordPiece is the LOSSY-by-design family
    member: out-of-vocabulary words become [UNK] (the byte-exact
    members are the byte-fallback BPE/unigram tiers).

    Capability analog in the reference: none — extension tier."""
    if lowercase:
        folded: dict[str, int] = {}
        for w, c in words:
            lw = w.lower()
            folded[lw] = folded.get(lw, 0) + int(c)
        words = list(folded.items())
    seqs: list[list[str]] = [
        [w[0], *("##" + ch for ch in w[1:])] for w, _ in words
    ]
    wc: list[int] = [int(c) for _, c in words]
    stats: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], dict[int, int]] = {}
    tok_count: dict[str, int] = {}
    for i, seq in enumerate(seqs):
        _index_word(stats, where, i, seq, wc[i], +1)
        for t in seq:
            tok_count[t] = tok_count.get(t, 0) + wc[i]

    base = sorted({t for seq in seqs for t in seq})
    vocab: list[str] = [_WP_UNK, *base]
    seen = set(vocab)
    while len(vocab) < int(vocab_size) and stats:
        best: tuple[str, str] | None = None
        bc = bl = br = 0  # best pair's (count, left-count, right-count)
        for p, c in stats.items():
            # Eligibility is a FILTER, not a stop condition: the
            # WordPiece score c/(l·r) <= 1/c is MAXIMIZED by rare
            # pairs, so breaking when the single best-scoring pair is
            # below min_pair_count would halt training on the first
            # hapax pair (r11 bug: realistic corpora degenerated to a
            # char-level vocab). Skip ineligible pairs and keep
            # selecting among the rest — HF's trainer semantics.
            if c < int(min_pair_count):
                continue
            l_, r_ = tok_count[p[0]], tok_count[p[1]]
            if best is None:
                better = True
            else:
                # exact: c/(l*r) vs bc/(bl*br), cross-multiplied
                lhs, rhs = c * bl * br, bc * l_ * r_
                better = lhs > rhs or (lhs == rhs and p < best)
            if better:
                best, bc, bl, br = p, c, l_, r_
        if best is None:
            break
        merged = best[0] + best[1][2:]
        if merged not in seen:
            vocab.append(merged)
            seen.add(merged)
        for i in sorted(where.get(best, {})):
            old = seqs[i]
            new = _merge_word(old, best, merged)
            _index_word(stats, where, i, old, wc[i], -1)
            _index_word(stats, where, i, new, wc[i], +1)
            for t in old:
                tok_count[t] -= wc[i]
            for t in new:
                tok_count[t] = tok_count.get(t, 0) + wc[i]
            seqs[i] = new
    return {
        "format": "spark-graft-wordpiece/v1",
        "vocab": vocab,
        "lowercase": bool(lowercase),
        "unk": _WP_UNK,
        "max_input_chars_per_word": 100,
    }


def train_wordpiece(
    df: DataFrame,
    col: str = "text",
    vocab_size: int = 1000,
    lowercase: bool = True,
    min_count: int = 1,
    max_words: int = 1_000_000,
    min_pair_count: int = 2,
) -> dict:
    """Learn a WordPiece vocabulary from a corpus: the
    :func:`train_bpe` split — :func:`vocab_counts`' one combiner-
    friendly corpus pass down to ``(word, count)``, then the
    :func:`learn_wordpiece` driver loop over the bounded table."""
    vocab = vocab_counts(
        df, col=col, lowercase=lowercase, min_count=min_count,
        top_k=int(max_words),
    )
    words = [(r["token"], int(r["count"])) for r in vocab.collect()]
    return learn_wordpiece(
        words, vocab_size=vocab_size, lowercase=lowercase,
        min_pair_count=min_pair_count,
    )


def _make_wordpiece_encoder(model: dict, ids: bool = False):
    """The pure per-document greedy longest-match-first (MaxMatch)
    encoder behind :func:`wordpiece_encode` — module-level so property
    tests drive EXACTLY the code the Arrow UDF runs. BERT semantics:
    per word, repeatedly take the LONGEST prefix present in the vocab
    (continuation prefixes carry ``##``); if at any position no piece
    matches — or the word exceeds ``max_input_chars_per_word`` — the
    WHOLE word becomes ``[UNK]``. Returns ``one_doc(text) -> list``
    with a fresh per-call word memo (per-batch cache bound, the
    :func:`_make_bpe_encoder` convention)."""
    if model.get("format") != "spark-graft-wordpiece/v1":
        raise ValueError(
            f"not a train_wordpiece model (format={model.get('format')!r})"
        )
    vocab = set(model["vocab"])
    unk = model["unk"]
    maxlen = int(model["max_input_chars_per_word"])
    lowercase = bool(model.get("lowercase", True))
    sym_ids = {s: i for i, s in enumerate(model["vocab"])} if ids else None
    ws = _re_mod.compile(r"\s+", _re_mod.ASCII)

    def enc_word(w: str) -> list:
        if len(w) > maxlen:
            return [sym_ids[unk]] if ids else [unk]
        out = []
        pos = 0
        while pos < len(w):
            end = len(w)
            piece = None
            while end > pos:
                cand = ("##" if pos else "") + w[pos:end]
                if cand in vocab:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return [sym_ids[unk]] if ids else [unk]
            out.append(sym_ids[piece] if ids else piece)
            pos = end
        return out

    # memo at ENCODER scope (the _make_bpe_encoder convention): the
    # encoder is re-made per Arrow batch, so the cache is batch-bounded
    # while every occurrence of a Zipf-frequent word across the batch's
    # documents resolves to one MaxMatch
    memo: dict[str, list] = {}

    def one_doc(text):
        if text is None:
            return None
        if lowercase:
            text = text.lower()
        toks: list = []
        for w in ws.split(text):
            if not w:
                continue
            enc = memo.get(w)
            if enc is None:
                enc = enc_word(w)
                memo[w] = enc
            toks.extend(enc)
        return toks

    return one_doc


def wordpiece_encode(
    df: DataFrame,
    model: dict,
    col: str = "text",
    out_col: str = "wp_tokens",
    ids: bool = False,
) -> DataFrame:
    """Tokenize a corpus with a :func:`train_wordpiece` model: adds
    ``out_col`` as ``array<string>`` (pieces) or ``array<int>``
    (indexes into ``model["vocab"]``; [UNK] is id 0). NULL text stays
    NULL; empty/whitespace text encodes to an empty array (the module
    contract). Shuffle-free Arrow-batched encode with a per-batch
    word memo — the :func:`bpe_encode` execution shape; id arrays
    feed ``chunking.chunk_token_ids`` directly."""
    ret = "array<int>" if ids else "array<string>"

    @F.pandas_udf(ret)
    def enc(texts: pd.Series) -> pd.Series:
        one_doc = _make_wordpiece_encoder(model, ids=ids)
        return texts.map(one_doc)

    return df.withColumn(out_col, enc(F.col(col)))


def wordpiece_decode(
    df: DataFrame,
    col: str = "wp_tokens",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Reassemble WordPiece PIECE arrays (strings, not ids) into text:
    ``##`` continuations concatenate, word-initial pieces join with a
    single space. LOSSY by design — [UNK] words stay ``[UNK]`` and
    inter-word whitespace normalizes to one space (WordPiece has no
    byte fallback; exact round-trips live in the BPE/unigram tiers).
    Pure codegen (no UDF): one ``aggregate`` over the array."""
    joined = F.aggregate(
        F.col(col),
        F.lit(""),
        lambda acc, x: F.concat(
            acc,
            F.when(
                x.startswith("##"), x.substr(F.lit(3), F.length(x))
            ).otherwise(
                F.concat(
                    F.when(acc == "", F.lit("")).otherwise(F.lit(" ")), x
                )
            ),
        ),
    )
    return df.withColumn(out_col, joined)


def hashed_tfidf_vectors(
    df: DataFrame,
    dim: int = 256,
    col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Signed feature-hashed TF-IDF document vectors (Weinberger et
    al. 2009, "Feature Hashing for Large Scale Multitask Learning"):
    each lowercased whitespace term hashes to a bucket
    ``crc32(term) mod dim`` with a second-hash sign in {-1, +1} (the
    signed trick that makes collisions cancel in expectation), weighted
    ``tf · idf`` with the module's smoothed idf
    (``ln((N+1)/(df+1)) + 1``, exactly :func:`tfidf_top_terms`'s form;
    each term's weight floored at e9 BEFORE the bucket sum, so bucket
    values are integer sums — deterministic under any shuffle order,
    the module's fixed-point convention), then L2-normalized — so the output ``embedding array<double>``
    drops straight into the similarity tier (``brute_force_topk``,
    ``semdedup``, ``kmeans``, IVF/PQ/IMI) WITHOUT an external
    embedding model: lexical ANN, clustering, and embedding-style
    near-dup over a text-only corpus.

    Everything is JVM-side codegen (explode → two hash-partitioned
    aggs + one term-keyed join carrying only (term, df) — the
    :func:`tfidf_top_terms` shape — then a map lookup per coordinate;
    no UDF). The corpus-size scalar is ONE count action (bounded
    driver state, the module contract). NULL/whitespace-only docs
    yield no row (they have no lexical content to embed); join back
    to the corpus if presence is required. Deterministic and
    layout-invariant: hashes are pure functions of the term.

    Capability analog in the reference: none — extension tier."""
    from .partitioning import scale_partitions

    if dim <= 0:
        raise ValueError(f"dim must be positive (got {dim})")
    tf = (
        scale_partitions(df.where(F.col(col).isNotNull()))
        .select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(col))), r"\s+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.where(F.col(col).isNotNull()).select(id_col).distinct().count()
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_bin = F.encode(F.col("term"), "UTF-8")
    sign_bin = F.encode(F.concat(F.col("term"), F.lit("#sign")), "UTF-8")
    # per-TERM weights fixed-pointed (floor at e9) BEFORE the bucket
    # sum, the module's floor-before-sum convention: opposite-sign
    # collisions in one bucket would otherwise sum doubles in
    # shuffle-fetch order, making the embedding vary in its last ulps
    # across runs — integer sums are associative, so the vector is a
    # pure function of the corpus
    weighted = (
        tf.join(docfreq, "term")
        .select(
            F.col(id_col),
            F.pmod(F.crc32(term_bin), F.lit(int(dim))).cast("int")
            .alias("bucket"),
            F.floor(
                (
                    F.when(
                        F.crc32(sign_bin) % 2 == 0, F.lit(1.0)
                    ).otherwise(F.lit(-1.0))
                    * F.col("tf")
                    * (
                        F.log(
                            F.lit(float(n_docs + 1)) / (F.col("df") + 1)
                        )
                        + F.lit(1.0)
                    )
                )
                * F.lit(1e9)
            ).alias("w_e9"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("w_e9").alias("w_e9"))
    )
    dense = weighted.groupBy(id_col).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("bucket", "w_e9")))
        ).alias("__m")
    ).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(int(dim) - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0)
            ).cast("double")
            / F.lit(1e9),
        ).alias("embedding"),
    )
    if not normalize:
        return dense
    # norm projected as a COLUMN first: an aggregate embedded in the
    # transform lambda would re-evaluate per element — O(dim^2) adds
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x
        )
    )
    return (
        dense.withColumn("__n", norm)
        .select(
            F.col(id_col),
            F.transform(
                F.col("embedding"),
                lambda x: F.when(
                    F.col("__n") > 0, x / F.col("__n")
                ).otherwise(F.lit(0.0)),
            ).alias("embedding"),
        )
    )


# ------------------------------------------------------ phrase search


def build_positional_index(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted index: one row per term OCCURRENCE —
    ``(term string, id, pos int)`` with ``pos`` the 0-based token
    position inside the doc (the module's lowercased whitespace
    tokens). The positional sibling of :func:`build_text_index`:
    postings answer "which docs", positions answer "where", and exact
    PHRASE queries become adjacency joins (:func:`phrase_topk`).
    ~dl rows per doc instead of ~distinct-terms — write it
    term-partitioned like the frequency index and a phrase's probe
    broadcast-prunes to its terms' rows. Positions index the
    NON-EMPTY token sequence (trim strips only spaces, so a
    tab/newline-padded doc's raw split carries a phantom leading ''
    token — positions over the raw split would misalign every
    consumer that slices the filtered token array, e.g.
    :func:`keyword_snippets`)."""
    from .partitioning import scale_partitions

    toks = F.filter(
        F.split(F.trim(F.lower(F.col(col))), r"\s+"),
        lambda t: t != "",
    )
    return (
        scale_partitions(df.where(F.col(col).isNotNull()))
        .select(
            F.col(id_col),
            F.posexplode(toks).alias("pos", "term"),
        )
        .select("term", id_col, F.col("pos").cast("int").alias("pos"))
    )


def phrase_topk(
    df: DataFrame | None,
    phrases,
    k: int = 10,
    col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase search over a positional index: a phrase of m
    terms matches at start position s iff term j sits at ``s + j``
    for every offset j — the classic adjacency join: each phrase
    offset's term probes the positional postings (broadcast — the
    phrase table is tiny), every occurrence row projects its implied
    start ``pos - j``, and a (phrase, doc, start) group with m
    DISTINCT offsets is one hit. Repeated terms in the phrase are
    handled exactly (each offset must be witnessed independently).
    Docs rank by hit count (ties by id ascending), cut top-k per
    phrase. Pure integer arithmetic end-to-end — the cross-engine
    oracle (:func:`phrase_topk_oracle`) agrees structurally. Phrases
    that occur nowhere return no rows. ``postings`` short-circuits
    with a prebuilt :func:`build_positional_index` table (the
    production path — the corpus is never re-tokenized per query).
    Returns ``(phrase, id, n_hits int, rank int)``."""
    if postings is None:
        if df is None:
            raise ValueError("phrase_topk needs df or postings")
        postings = build_positional_index(df, col=col, id_col=id_col)
    spark = postings.sparkSession
    plist = list(dict.fromkeys(phrases))
    if not plist:
        raise ValueError("phrase_topk needs at least one phrase")
    pq = spark.createDataFrame([(p,) for p in plist], "phrase string")
    ptoks = F.split(F.trim(F.lower(F.col("phrase"))), r"\s+")
    pterms = (
        pq.select(
            "phrase",
            F.posexplode(F.filter(ptoks, lambda t: t != "")).alias(
                "j", "term"
            ),
            F.size(F.filter(ptoks, lambda t: t != "")).alias("m"),
        )
    )
    from pyspark.sql.window import Window

    hits = (
        postings.join(F.broadcast(pterms), "term")
        .select(
            "phrase",
            id_col,
            (F.col("pos") - F.col("j")).alias("start"),
            "j",
            "m",
        )
        .groupBy("phrase", id_col, "start", "m")
        .agg(F.count_distinct(F.col("j")).alias("witnessed"))
        .where(F.col("witnessed") == F.col("m"))
        .groupBy("phrase", id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
    )
    w = Window.partitionBy("phrase").orderBy(
        F.col("n_hits").desc(), F.col(id_col).asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
        .select("phrase", id_col, "n_hits", "rank")
    )


def phrase_topk_oracle(
    phrases: list[str], k: int = 10, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`phrase_topk` (inline index build) —
    integer-only, so agreement is structural."""
    vals = ", ".join(
        "('" + p.replace("'", "''") + "')" for p in dict.fromkeys(phrases)
    )
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    pt = "list_filter(string_split_regex(trim(lower(phrase)), '\\s+'), x -> x <> '')"
    return f"""
        WITH p(phrase) AS (VALUES {vals}),
        pterms AS (
            SELECT phrase,
                   CAST(generate_subscripts({pt}, 1) - 1 AS INT) AS j,
                   unnest({pt}) AS term,
                   CAST(len({pt}) AS INT) AS m
            FROM p
        ),
        post AS (
            SELECT doc_id,
                   CAST(generate_subscripts({t}, 1) - 1 AS INT) AS pos,
                   unnest({t}) AS term
            FROM {table} WHERE text IS NOT NULL
        ),
        starts AS (
            SELECT pterms.phrase, post.doc_id,
                   post.pos - pterms.j AS start, pterms.m,
                   COUNT(DISTINCT pterms.j) AS witnessed
            FROM post JOIN pterms USING (term)
            GROUP BY 1, 2, 3, 4
        ),
        hits AS (
            SELECT phrase, doc_id, CAST(COUNT(*) AS INT) AS n_hits
            FROM starts WHERE witnessed = m GROUP BY 1, 2
        ),
        ranked AS (
            SELECT phrase, doc_id, n_hits,
                   CAST(ROW_NUMBER() OVER (PARTITION BY phrase
                                           ORDER BY n_hits DESC, doc_id)
                        AS INT) AS rank
            FROM hits
        )
        SELECT phrase, doc_id, n_hits, rank
        FROM ranked WHERE rank <= {int(k)}
    """


# ------------------------------------------------------- collocations


def collocations(
    df: DataFrame,
    k: int = 50,
    min_count: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual
    information (Church & Hanks 1990, "Word Association Norms, Mutual
    Information, and Lexicography"): the corpus-analysis op behind
    multi-word-expression vocabularies and tokenizer seed phrases.
    ``PMI = ln(P(ab) / (P(a)·P(b)))`` computed as the EXACT-int log
    sum ``ln(c_ab) + ln(U) + ln(U) − ln(B) − ln(c_a) − ln(c_b)``
    (U = corpus unigram total, B = bigram total; every operand is an
    exact integer-valued double and the expression is parenthesized
    identically in the SQL twin, so the e6-floored fixed point
    hash-matches). ``min_count`` drops rare bigrams (PMI is noise at
    low counts — the published guidance). Ranking: PMI desc, then
    (w1, w2) asc; global top-k compiles to a distributed
    TakeOrdered, no full sort.

    Shape: TWO tokenize+agg evaluations (bigrams via
    :func:`adjacent_bigram_counts`, unigrams via a second explode —
    Spark evaluates each aggregation's lineage independently). The
    only driver scalars are U and B. At scale don't pay the rescans
    per refresh: ingest through the bigram + vocabulary stores and
    call ``collocations_from_stores`` (identical scoring tail, zero
    corpus scans). Capability analog in the reference: none."""
    # Materialize both count tables (r14, guide §5): the scoring tail
    # consumes ``uni`` three times (U total + two joins) and ``pairs``
    # twice (B total + scoring) — each evaluation of the lazy frames
    # re-ran the corpus tokenize+agg, five tokenize passes for what
    # needs two. The vocabulary-bounded results are far smaller than
    # the passes that build them; the store path
    # (``collocations_from_stores``) reads persisted counts and is
    # untouched.
    pairs = adjacent_bigram_counts(df, col=col)
    uni = (
        df.where(F.col(col).isNotNull())
        .select(
            F.explode(
                F.filter(
                    F.split(F.trim(F.lower(F.col(col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    if materialize:
        # (``materialize=False`` = the plan-inspection escape hatch)
        pairs = pairs.localCheckpoint(eager=True)
        uni = uni.localCheckpoint(eager=True)
    return _collocations_score(pairs, uni, k=k, min_count=min_count)


def adjacent_bigram_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Corpus adjacent-bigram counts ``(w1, w2, n_pair)`` — THE single
    extraction :func:`collocations` and the streaming bigram store
    (:func:`~etl_workflow_spark.streaming.incremental.bigram_rollup_batch`)
    share, so batch and store-fed PMI cannot drift. One tokenize pass,
    codegen arrays_zip of the shifted slices, one combiner-friendly
    agg."""
    from .partitioning import scale_partitions

    toks = F.filter(
        F.split(F.trim(F.lower(F.col(col))), r"\s+"),
        lambda t: t != "",
    )
    base = scale_partitions(df.where(F.col(col).isNotNull())).select(
        toks.alias("__t")
    )
    return (
        base.where(F.size("__t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("w1"),
                    F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )


def adjacent_trigram_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Corpus adjacent-trigram counts ``(w1, w2, w3, n_tri)`` — the
    same extraction :func:`lm_score_backoff`'s self-fit runs and the
    streaming trigram store (:func:`~etl_workflow_spark.streaming
    .incremental.trigram_rollup_batch`) persists, so store-fed and
    inline backoff scoring cannot drift. One tokenize pass, codegen
    arrays_zip of the three shifted slices, one combiner-friendly
    agg."""
    tok_src = _lm_token_frame(df, col, None, checkpoint=False)
    return (
        _lm_ngram_explode(tok_src, 3)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )


def _collocations_score(
    pairs: DataFrame, uni: DataFrame, k: int, min_count: int
) -> DataFrame:
    """The PMI scoring tail shared by :func:`collocations` (inline
    counts) and ``collocations_from_stores`` (persisted counts):
    identical arithmetic on ``pairs (w1, w2, n_pair)`` ×
    ``uni (w, n_w)``, so the two entry points cannot drift."""
    totals = uni.agg(
        F.sum("n_w").alias("u"),
    ).collect()[0]
    u_total = int(totals["u"] or 0)
    if u_total == 0:
        raise ValueError("collocations needs non-empty text")
    b_total = int(
        pairs.agg(F.sum("n_pair")).collect()[0][0] or 0
    )
    if b_total == 0:
        raise ValueError(
            "collocations needs at least one 2-token document"
        )
    pmi = (
        F.log(F.col("n_pair").cast("double"))
        + F.log(F.lit(float(u_total)))
        + F.log(F.lit(float(u_total)))
        - F.log(F.lit(float(b_total)))
        - F.log(F.col("n_w1").cast("double"))
        - F.log(F.col("n_w2").cast("double"))
    )
    scored = (
        pairs.where(F.col("n_pair") >= int(min_count))
        .join(uni.withColumnRenamed("w", "w1")
              .withColumnRenamed("n_w", "n_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2")
              .withColumnRenamed("n_w", "n_w2"), "w2")
        .withColumn("pmi_e6", F.floor(pmi * F.lit(1e6)))
    )
    out = (
        scored.orderBy(
            F.col("pmi_e6").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(int(k))
        .select(
            "w1", "w2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            "pmi_e6",
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(
        F.col("pmi_e6").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return out.withColumn("rank", F.row_number().over(w).cast("int"))


def collocations_oracle(
    k: int = 50, min_count: int = 5, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`collocations` — identical log-sum
    parenthesization, e6 floor."""
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    return f"""
        WITH tok AS (
            SELECT {t} AS ts FROM {table} WHERE text IS NOT NULL
        ),
        uni AS (
            SELECT w, COUNT(*) AS n_w FROM (
                SELECT unnest(ts) AS w FROM tok
            ) GROUP BY 1
        ),
        pairs AS (
            SELECT w1, w2, COUNT(*) AS n_pair FROM (
                SELECT unnest(ts[1:len(ts)-1]) AS w1,
                       unnest(ts[2:len(ts)]) AS w2
                FROM tok WHERE len(ts) >= 2
            ) GROUP BY 1, 2
        ),
        tot AS (
            SELECT (SELECT SUM(n_w) FROM uni) AS u,
                   (SELECT SUM(n_pair) FROM pairs) AS b
        ),
        scored AS (
            SELECT p.w1, p.w2, p.n_pair,
                   CAST(floor((ln(CAST(p.n_pair AS DOUBLE))
                        + ln(CAST(tot.u AS DOUBLE))
                        + ln(CAST(tot.u AS DOUBLE))
                        - ln(CAST(tot.b AS DOUBLE))
                        - ln(CAST(u1.n_w AS DOUBLE))
                        - ln(CAST(u2.n_w AS DOUBLE))) * 1000000.0)
                        AS BIGINT) AS pmi_e6
            FROM pairs p
            JOIN uni u1 ON p.w1 = u1.w
            JOIN uni u2 ON p.w2 = u2.w
            CROSS JOIN tot
            WHERE p.n_pair >= {int(min_count)}
        )
        SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, pmi_e6,
               CAST(ROW_NUMBER() OVER (ORDER BY pmi_e6 DESC, w1, w2)
                    AS INT) AS rank
        FROM scored
        ORDER BY pmi_e6 DESC, w1, w2
        LIMIT {int(k)}
    """


def keyword_snippets(
    df: DataFrame,
    terms: list[str],
    window: int = 3,
    k: int = 20,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context (KWIC) snippets: for each search term, the
    first ``k`` occurrences in (doc, position) order with ±``window``
    tokens of context — the audit/search-result-display companion to
    :func:`bm25_topk` (what a reviewer reads to judge a match). Terms
    probe the positional occurrences by broadcast; the top-k cut
    happens BEFORE context assembly, so token arrays are only touched
    for the ≤ k×|terms| hit docs (the hits broadcast back into one
    corpus join). Lowercased matching, original token order preserved
    in the snippet. Returns ``(term, id, pos int, snippet string,
    rank int)``; deterministic end-to-end (integer positions + string
    joins — the DuckDB twin agrees structurally)."""
    tlist = list(dict.fromkeys(t for t in terms if t and t.strip()))
    if not tlist:
        raise ValueError("keyword_snippets needs at least one term")
    spark = df.sparkSession
    tdf = spark.createDataFrame(
        [(t.strip().lower(),) for t in tlist], "term string"
    )
    hits = build_positional_index(df, col=col, id_col=id_col).join(
        F.broadcast(tdf), "term"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("term").orderBy(
        F.col(id_col).asc(), F.col("pos").asc()
    )
    cut = (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= int(k))
    )
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(col))), r"\s+"), lambda t: t != ""
    )
    docs_t = df.where(F.col(col).isNotNull()).select(
        F.col(id_col), toks.alias("__t")
    )
    start = F.greatest(F.col("pos") + 1 - F.lit(int(window)), F.lit(1))
    end = F.least(
        F.col("pos") + 1 + F.lit(int(window)), F.size(F.col("__t"))
    )
    return (
        docs_t.join(F.broadcast(cut), id_col)
        .select(
            "term",
            id_col,
            "pos",
            F.array_join(
                F.slice(F.col("__t"), start, end - start + 1), " "
            ).alias("snippet"),
            "rank",
        )
    )


def keyword_snippets_oracle(
    terms: list[str], window: int = 3, k: int = 20,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`keyword_snippets`."""
    vals = ", ".join(
        "('" + t.strip().lower().replace("'", "''") + "')"
        for t in dict.fromkeys(t for t in terms if t and t.strip())
    )
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    return f"""
        WITH q(term) AS (VALUES {vals}),
        tok AS (
            SELECT doc_id, {t} AS ts FROM {table} WHERE text IS NOT NULL
        ),
        post AS (
            SELECT doc_id,
                   CAST(generate_subscripts(ts, 1) - 1 AS INT) AS pos,
                   unnest(ts) AS term
            FROM tok
        ),
        cut AS (
            SELECT term, doc_id, pos,
                   CAST(ROW_NUMBER() OVER (PARTITION BY term
                                           ORDER BY doc_id, pos)
                        AS INT) AS rank
            FROM post JOIN q USING (term)
        )
        SELECT cut.term, cut.doc_id, cut.pos,
               array_to_string(tok.ts[
                   greatest(cut.pos + 1 - {int(window)}, 1) :
                   least(cut.pos + 1 + {int(window)}, len(tok.ts))
               ], ' ') AS snippet,
               cut.rank
        FROM cut JOIN tok USING (doc_id)
        WHERE cut.rank <= {int(k)}
    """


# ------------------------------------------------------- corpus drift


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    buckets: int = 512,
    col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Distribution drift between two corpus snapshots via the
    Population Stability Index over hashed term buckets — the
    monitoring op a continuously-ingesting training pipeline runs
    between yesterday's and today's crawl ("did the source mix
    shift?"). Terms hash to ``crc32(term) mod buckets`` (the
    :func:`hashed_tfidf_vectors` bucket, sign-free); per bucket,
    ``PSI_i = (p_i − q_i) · ln(p_i / q_i)`` with additively-smoothed
    ratios, computed as the exact-int log difference
    ``(ln(c_a + s) − ln(U_a + s·B)) − (ln(c_b + s) − ln(U_b + s·B))``
    floored at e9 per bucket. The arithmetic runs DRIVER-side over
    the bucket-bounded count table (Spark only aggregates the
    counts), so the independent pytest oracle replays it as the same
    IEEE ops on the same exact-int operands. Standard
    reading: PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major
    shift. Returns one row per bucket 0..B-1 ``(bucket, n_a, n_b,
    psi_e9)`` plus the ``psi_total_e9`` constant column — buckets
    empty in BOTH corpora included (they carry nonzero smoothed mass
    whenever the corpus sizes differ; the standard all-bins PSI).
    One pass per corpus, shuffle bounded by ``buckets``, driver state
    bounded by ``buckets``. Correctness tiers: the zlib/numpy oracle
    in pytest (Spark's crc32 == zlib.crc32, verified) AND the
    hash-checked driver gate via :func:`corpus_drift_oracle` (r12) —
    the crc32 recursive CTE there runs over DISTINCT terms only, so
    the replay is vocabulary-bounded, not occurrence-bounded.

    Capability analog in the reference: none — extension-tier
    pipeline monitoring."""
    if buckets <= 0:
        raise ValueError(f"buckets must be positive (got {buckets})")
    a = _term_bucket_counts(df_a, col, int(buckets), "n_a")
    b = _term_bucket_counts(df_b, col, int(buckets), "n_b")
    joined = a.join(b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
    )
    # ONE evaluation per corpus: the joined frame is bucket-bounded
    # (<= `buckets` rows), so it collects to the driver and the PSI
    # arithmetic runs there over the FULL bucket spine 0..B-1 —
    # buckets empty in BOTH corpora still carry nonzero smoothed mass
    # whenever the corpus sizes differ (omitting them understates
    # drift), and a driver loop cannot recompute the tokenize
    # pipeline per downstream action the way a live lineage would.
    got = {int(r["bucket"]): (int(r["n_a"]), int(r["n_b"]))
           for r in joined.collect()}
    return _psi_frame(df_a.sparkSession, got, int(buckets), smoothing)


def _term_bucket_counts(
    df: DataFrame, col: str, buckets: int, name: str
) -> DataFrame:
    """Hashed-term bucket occupancy (crc32 mod buckets — the
    :func:`hashed_tfidf_vectors` bucket, sign-free) — the ONE
    tokenize+bucket expression shared by :func:`corpus_drift` and the
    streaming drift store, so persisted counts are byte-compatible
    with inline ones by construction."""
    toks = F.explode(
        F.filter(
            F.split(F.trim(F.lower(F.col(col))), r"\s+"),
            lambda t: t != "",
        )
    ).alias("term")
    return (
        df.where(F.col(col).isNotNull())
        .select(toks)
        .select(
            F.pmod(
                F.crc32(F.encode(F.col("term"), "UTF-8")),
                F.lit(int(buckets)),
            ).cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(name))
    )


def _psi_frame(spark, got: dict, buckets: int, smoothing: float):
    """The driver-side PSI arithmetic over a bucket→(n_a, n_b) count
    table — shared verbatim by :func:`corpus_drift` (inline corpora)
    and :func:`~etl_workflow_spark.streaming.incremental
    .corpus_drift_from_store` (persisted bucket counts), so the two
    paths cannot drift from each other or from the SQL twin."""
    ua = sum(na for na, _ in got.values())
    ub = sum(nb for _, nb in got.values())
    if ua == 0 or ub == 0:
        raise ValueError("corpus_drift needs non-empty text on both sides")
    s = float(smoothing)
    sb = s * buckets
    rows = []
    total = 0
    for bkt in range(int(buckets)):
        na, nb = got.get(bkt, (0, 0))
        lr = (
            (math.log(na + s) - math.log(ua + sb))
            - (math.log(nb + s) - math.log(ub + sb))
        )
        p = (na + s) / (ua + sb)
        q = (nb + s) / (ub + sb)
        e9 = math.floor(((p - q) * lr) * 1e9)
        total += e9
        rows.append((bkt, na, nb, e9))
    return spark.createDataFrame(
        [(bkt, na, nb, e9, total) for bkt, na, nb, e9 in rows],
        "bucket int, n_a bigint, n_b bigint, psi_e9 bigint, "
        "psi_total_e9 bigint",
    )


def expand_queries(
    df: DataFrame | None,
    queries,
    n_docs: int = 5,
    n_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the RM3 recipe
    simplified; Lavrenko & Croft 2001 relevance models, Abdul-Jaleel
    2004 RM3): run each query through BM25, treat its top ``n_docs``
    documents as relevant, score their terms by feedback weight
    ``(Σ tf over feedback docs) · idf`` (idf = the BM25 form over the
    full index), drop the query's own terms, and append the top
    ``n_terms`` (ties by term ascending) to the query text. The
    expanded string feeds straight back into :func:`bm25_topk` (bag
    semantics keep the original terms' weight). One extra
    broadcast-probed postings pass beyond the initial ranking —
    feedback docs are k·|queries| ids, so their term lists broadcast.
    Deterministic: tf sums are exact ints, each term's score is one
    int × double multiply floored at e6 before ranking. Returns
    ``(query, expanded_query, added_terms array<string>)``."""
    if postings is None:
        if df is None:
            raise ValueError("expand_queries needs df or postings")
        # one call consumes the postings ~5 times (stats, the ranking's
        # three evaluations, the feedback join, df) — materialize the
        # inline build once, the bm25_topk contract (a PASSED postings
        # table is left alone: stored tables are broadcast-pruned)
        postings = build_text_index(
            df, col=col, id_col=id_col
        ).localCheckpoint(eager=True)
    stats = _bm25_index_stats(postings, id_col)
    top = bm25_topk(
        None, queries, k=int(n_docs), k1=k1, b=b, id_col=id_col,
        postings=postings, stats=stats,
    ).select("query", id_col)
    fb = postings.join(F.broadcast(top), id_col)
    cand = fb.groupBy("query", "term").agg(
        F.sum("tf").alias("tfsum")
    )
    n_total = stats[0]
    dfreq = postings.join(
        F.broadcast(cand.select("term").distinct()), "term"
    ).groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qtoks = F.split(F.trim(F.lower(F.col("query"))), r"\s+")
    spark = postings.sparkSession
    if not isinstance(queries, DataFrame):
        qdf = spark.createDataFrame(
            [(q,) for q in dict.fromkeys(queries)], "query string"
        )
    else:
        qdf = queries.dropDuplicates(["query"])
    own = qdf.select(
        "query", F.explode(qtoks).alias("term")
    ).where(F.col("term") != "")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_total) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        cand.join(own, ["query", "term"], "left_anti")
        .join(F.broadcast(dfreq), "term")
        .withColumn(
            "score_e6",
            F.floor(F.col("tfsum").cast("double") * idf * F.lit(1e6)),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query").orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    picked = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(n_terms))
        .groupBy("query")
        .agg(
            F.array_sort(F.collect_list(F.struct("rk", "term")))
            .alias("__ts")
        )
        .select(
            "query",
            F.transform(F.col("__ts"), lambda s: s["term"]).alias(
                "added_terms"
            ),
        )
    )
    return qdf.join(picked, "query", "left").select(
        "query",
        F.when(
            F.col("added_terms").isNull()
            | (F.size("added_terms") == 0),
            F.col("query"),
        )
        .otherwise(
            F.concat(
                F.col("query"), F.lit(" "),
                F.array_join("added_terms", " "),
            )
        )
        .alias("expanded_query"),
        F.coalesce(
            F.col("added_terms"),
            F.array().cast("array<string>"),
        ).alias("added_terms"),
    )


def expand_queries_oracle(
    queries: list[str],
    n_docs: int = 5,
    n_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`expand_queries`: the feedback ranking is
    :func:`bm25_topk_oracle` verbatim, the feedback-term score is the
    identically-parenthesized ``(tfsum_double * idf) * 1e6`` floored
    to an integer, ties break by term ascending, and the expanded
    string concatenates in rank order — so ``expanded_query`` matches
    byte-for-byte. Returns ``(query, expanded_query, n_added)``."""
    vals = ", ".join(
        "('" + q.replace("'", "''") + "')"
        for q in dict.fromkeys(queries)
    )
    t = "string_split_regex(trim(lower(text)), '\\s+')"
    qt = "string_split_regex(trim(lower(query)), '\\s+')"
    ranked = bm25_topk_oracle(
        queries, k=int(n_docs), k1=k1, b=b, table=table
    )
    return f"""
        WITH q(query) AS (VALUES {vals}),
        post AS (
            SELECT term, doc_id, COUNT(*) AS tf FROM (
                SELECT doc_id, unnest({t}) AS term
                FROM {table} WHERE text IS NOT NULL
            ) WHERE term <> '' GROUP BY term, doc_id
        ),
        stats AS (
            SELECT COUNT(DISTINCT doc_id) AS n_docs FROM post
        ),
        top AS (
            SELECT query, doc_id FROM ({ranked})
        ),
        cand AS (
            SELECT top.query, post.term, SUM(post.tf) AS tfsum
            FROM post JOIN top USING (doc_id)
            GROUP BY 1, 2
        ),
        dfreq AS (
            SELECT term, COUNT(*) AS df FROM post
            WHERE term IN (SELECT DISTINCT term FROM cand)
            GROUP BY 1
        ),
        own AS (
            SELECT DISTINCT query, term FROM (
                SELECT query, unnest({qt}) AS term FROM q
            ) WHERE term <> ''
        ),
        scored AS (
            SELECT cand.query, cand.term,
                   CAST(floor((CAST(cand.tfsum AS DOUBLE)
                       * ln(1.0 + (stats.n_docs - dfreq.df + 0.5)
                                    / (dfreq.df + 0.5)))
                       * 1000000.0) AS BIGINT) AS score_e6
            FROM cand
            JOIN dfreq USING (term)
            CROSS JOIN stats
            WHERE NOT EXISTS (
                SELECT 1 FROM own
                WHERE own.query = cand.query AND own.term = cand.term
            )
        ),
        picked AS (
            SELECT query, term,
                   ROW_NUMBER() OVER (PARTITION BY query
                                      ORDER BY score_e6 DESC, term)
                       AS rk
            FROM scored
        ),
        agg AS (
            SELECT query, string_agg(term, ' ' ORDER BY rk) AS add_str,
                   CAST(COUNT(*) AS BIGINT) AS n_added
            FROM picked WHERE rk <= {int(n_terms)} GROUP BY 1
        )
        SELECT q.query,
               CASE WHEN agg.add_str IS NULL OR agg.n_added = 0
                    THEN q.query
                    ELSE q.query || ' ' || agg.add_str END
                   AS expanded_query,
               COALESCE(agg.n_added, 0) AS n_added
        FROM q LEFT JOIN agg USING (query)
    """


def corpus_drift_oracle(
    where_a: str,
    where_b: str,
    buckets: int = 64,
    smoothing: float = 0.5,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`corpus_drift` for gate subsets defined by
    SQL predicates (``where_a`` / ``where_b`` select the two corpus
    snapshots from ``table``; restrict both to ASCII text — e.g.
    ``regexp_matches(text, '^[ -~]*$')`` — so ``unicode(char)`` IS the
    UTF-8 byte the engine's crc32 consumes). The crc32 recursive CTE
    runs over DISTINCT terms only (vocabulary-bounded, the same
    reflected-0xEDB88320 byte loop as the dsir gate replay); the PSI
    row arithmetic repeats the driver's exact operation order with
    every float literal CAST to DOUBLE (DuckDB decimal-literal
    arithmetic would otherwise diverge from Python floats). Returns
    ``(bucket, n_a, n_b, psi_e9, psi_total_e9)`` over the full
    0..buckets-1 spine."""
    t = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
         "x -> x <> '')")
    s = f"CAST({float(smoothing)!r} AS DOUBLE)"
    sb = f"CAST({float(smoothing) * int(buckets)!r} AS DOUBLE)"
    return f"""
        WITH RECURSIVE crc_tbl(n, k, c) AS (
            SELECT n, 0, CAST(n AS BIGINT) FROM range(256) t(n)
            UNION ALL
            SELECT n, k + 1,
                   CASE WHEN c & 1 = 1
                        THEN xor(3988292384, c >> 1)
                        ELSE c >> 1 END
            FROM crc_tbl WHERE k < 8
        ),
        tbl AS (SELECT n, c FROM crc_tbl WHERE k = 8),
        terms_a AS (
            SELECT unnest({t}) AS term FROM {table}
            WHERE text IS NOT NULL AND ({where_a})
        ),
        terms_b AS (
            SELECT unnest({t}) AS term FROM {table}
            WHERE text IS NOT NULL AND ({where_b})
        ),
        vocab AS (
            SELECT DISTINCT term FROM (
                SELECT term FROM terms_a
                UNION ALL SELECT term FROM terms_b
            )
        ),
        crc_iter(term, i, n, c) AS (
            SELECT term, 0, length(term), CAST(4294967295 AS BIGINT)
            FROM vocab
            UNION ALL
            SELECT ci.term, ci.i + 1, ci.n, xor(t.c, ci.c >> 8)
            FROM crc_iter ci
            JOIN tbl t
              ON t.n = xor(
                     ci.c & 255, unicode(substr(ci.term, ci.i + 1, 1))
                 )
            WHERE ci.i < ci.n
        ),
        bkt AS (
            SELECT term,
                   CAST(xor(c, 4294967295) % {int(buckets)} AS INT)
                       AS bucket
            FROM crc_iter WHERE i = n
        ),
        ca AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_a
            FROM terms_a JOIN bkt USING (term) GROUP BY 1
        ),
        cb AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b
            FROM terms_b JOIN bkt USING (term) GROUP BY 1
        ),
        spine AS (
            SELECT CAST(range AS INT) AS bucket
            FROM range({int(buckets)})
        ),
        joined AS (
            SELECT spine.bucket,
                   COALESCE(ca.n_a, 0) AS n_a,
                   COALESCE(cb.n_b, 0) AS n_b
            FROM spine
            LEFT JOIN ca USING (bucket)
            LEFT JOIN cb USING (bucket)
        ),
        tots AS (
            SELECT CAST(SUM(n_a) AS BIGINT) AS ua,
                   CAST(SUM(n_b) AS BIGINT) AS ub
            FROM joined
        ),
        psi AS (
            SELECT bucket, n_a, n_b,
                   CAST(FLOOR(
                       ((((n_a + {s}) / (ua + {sb}))
                         - ((n_b + {s}) / (ub + {sb})))
                        * ((ln(n_a + {s}) - ln(ua + {sb}))
                           - (ln(n_b + {s}) - ln(ub + {sb}))))
                       * CAST(1000000000.0 AS DOUBLE)
                   ) AS BIGINT) AS psi_e9
            FROM joined CROSS JOIN tots
        )
        SELECT bucket, n_a, n_b, psi_e9,
               CAST(SUM(psi_e9) OVER () AS BIGINT) AS psi_total_e9
        FROM psi
    """
