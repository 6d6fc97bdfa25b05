"""Property-based checks (hypothesis) for semantics that golden tests
can only spot-check: calendar parity, the revenue rule, session
partitioning invariants. Few examples, tiny frames — each example runs
Spark jobs."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(
    start=st.dates(dt.date(1990, 1, 1), dt.date(2030, 1, 1)),
    span=st.integers(0, 40),
)
def test_dim_time_calendar_parity(spark, start, span):
    """Every derived calendar part must match Python's datetime for a
    random inclusive range (Mon=1 dow, ISO week, quarter, weekend)."""
    from etl_workflow_spark.operators.dimtime import dim_time_frame

    end = start + dt.timedelta(days=span)
    rows = dim_time_frame(spark, start.isoformat(), end.isoformat()).collect()
    assert len(rows) == span + 1  # inclusive bounds (workflow.py:51-53)
    for r in rows:
        d = r.date
        assert r.day_of_week == d.weekday() + 1
        assert r.is_weekend == (d.weekday() >= 5)
        assert r.week_of_year == d.isocalendar()[1]
        assert r.quarter == (d.month - 1) // 3 + 1
        assert r.month_name == d.strftime("%B")
        assert r.day_of_year == d.timetuple().tm_yday


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.decimals("0.01", "99999.99", places=2),
            st.integers(1, 1000),
            st.decimals("0.00", "9999.99", places=2),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_item_total_rule_exact_decimal(spark, rows):
    """total = price*qty - discount, exact under DECIMAL (quirk Q6) —
    compared against Python Decimal arithmetic, no float anywhere."""
    from etl_workflow_spark.operators.etl import recompute_item_total

    df = spark.createDataFrame(
        [(i, str(p), q, str(d)) for i, (p, q, d) in enumerate(rows)],
        ["id", "price", "quantity", "discount"],
    )
    out = {
        r.id: r.total
        for r in recompute_item_total(
            df, price="price", quantity="quantity", discount="discount", out="total"
        ).collect()
    }
    for i, (p, q, d) in enumerate(rows):
        assert out[i] == Decimal(p) * q - Decimal(d)


@SETTINGS
@given(
    gaps=st.lists(st.integers(0, 120), min_size=1, max_size=30),
    gap_minutes=st.integers(1, 60),
)
def test_sessionize_partitions_events(spark, gaps, gap_minutes):
    """Sessions must partition a user's events; boundaries appear
    exactly where consecutive gaps exceed the threshold."""
    from etl_workflow_spark.operators.sessions import sessionize

    base = dt.datetime(2024, 1, 1)
    ts, cur = [], base
    for g in gaps:
        cur = cur + dt.timedelta(minutes=g)
        ts.append(cur)
    df = spark.createDataFrame(
        [(i, t, 1, "e", 1.0, "{}") for i, t in enumerate(ts)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sess = sorted(
        sessionize(df, gap_minutes=gap_minutes).collect(),
        key=lambda r: r.session_idx,
    )
    # events are partitioned: counts sum, sessions don't overlap
    assert sum(r.n_events for r in sess) == len(ts)
    expected_sessions = 1 + sum(1 for g in gaps[1:] if g > gap_minutes)
    assert len(sess) == expected_sessions
    for a, b in zip(sess, sess[1:]):
        gap = (b.session_start - a.session_end).total_seconds() / 60
        assert gap > gap_minutes


@SETTINGS
@given(
    revs=st.lists(
        st.decimals("0.01", "99999999.99", places=2), min_size=2, max_size=40
    )
)
def test_fixed_point_dod_matches_duckdb(spark, revs):
    """The sign-guarded fixed-point pct_change must be BIT-IDENTICAL
    between Spark (DIV truncates toward zero) and DuckDB (// floors) —
    the exact cross-engine class that hash-failed rounds 3 and 4.
    Deltas go negative whenever the series dips, so the sign guard is
    exercised, not just stated."""
    import duckdb

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), d)
            for i, d in enumerate(revs)]
    df = spark.createDataFrame(rows, "date date, revenue decimal(18,2)")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    prev = F.lag("revenue").over(Window.orderBy("date"))
    got = {
        r["date"]: r["pct_e4"]
        for r in df.select(
            "date",
            ((F.col("revenue") - prev) * 100).cast("long").alias("_d"),
            (prev * 100).cast("long").alias("_p"),
        )
        .selectExpr(
            "date",
            "CAST(CASE WHEN _d < 0 THEN -((-_d * 1000000) DIV _p) "
            "ELSE (_d * 1000000) DIV _p END AS BIGINT) AS pct_e4",
        )
        .collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (date DATE, revenue DECIMAL(18,2))"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            """
            WITH s AS (
                SELECT date,
                       CAST((revenue - lag(revenue) OVER (ORDER BY date)) * 100
                            AS BIGINT) AS d,
                       CAST(lag(revenue) OVER (ORDER BY date) * 100 AS BIGINT)
                           AS p
                FROM t
            )
            SELECT date, CAST(CASE WHEN d < 0 THEN -((-d * 1000000) // p)
                         ELSE (d * 1000000) // p END AS BIGINT)
            FROM s
            """
        ).fetchall()
    )
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 99)),
        max_size=12, unique_by=lambda t: t[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 99)),
        max_size=8, unique_by=lambda t: t[0],
    ),
)
def test_merge_into_matches_dict_model(spark, tmp_path_factory, target, source):
    """merge_into must behave exactly like dict.update keyed by id —
    including cross-partition moves and emptied-partition cleanup —
    for arbitrary target/source combinations."""
    from etl_workflow_spark.sources.writers import merge_into

    path = str(tmp_path_factory.mktemp("merge") / "t")
    cols = ["id", "part", "v"]
    if target:
        spark.createDataFrame(target, cols).write.partitionBy("part").parquet(path)

    src = spark.createDataFrame(source, cols) if source else spark.createDataFrame(
        [], "id int, part int, v int"
    )
    updated, inserted = merge_into(spark, path, src, ["id"], partition_col="part")

    model = {t[0]: t for t in target}
    n_matched = sum(1 for s in source if s[0] in model)
    model.update({s[0]: s for s in source})
    if target or source:
        # select explicitly: parquet read-back appends partition cols last
        got = sorted(
            tuple(r) for r in spark.read.parquet(path).select(*cols).collect()
        )
        assert got == sorted(model.values())
    assert (updated, inserted) == (n_matched, len(source) - n_matched)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    target=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 99)),
        min_size=1, max_size=12, unique_by=lambda t: t[0],
    ),
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(0, 99)),
            max_size=6, unique_by=lambda t: t[0],
        ),
        max_size=3,
    ),
)
def test_txn_merge_matches_dict_model(spark, tmp_path_factory, target, batches):
    """txn_merge_into must match the same dict.update model as
    merge_into across a SEQUENCE of commits, and every historical
    version must keep replaying its own model state (time travel)."""
    from etl_workflow_spark.sources import txn

    path = str(tmp_path_factory.mktemp("txnmerge") / "t")
    cols = ["id", "part", "v"]
    txn.txn_create(
        spark, path, spark.createDataFrame(target, cols), partition_col="part"
    )

    model = {t[0]: t for t in target}
    snapshots = {1: sorted(model.values())}
    v = 1
    for batch in batches:
        src = (
            spark.createDataFrame(batch, cols)
            if batch
            else spark.createDataFrame([], "id int, part int, v int")
        )
        n_matched = sum(1 for s in batch if s[0] in model)
        updated, inserted = txn.txn_merge_into(spark, path, src, ["id"])
        assert (updated, inserted) == (n_matched, len(batch) - n_matched)
        if not batch:
            continue  # empty merge is a no-op: no new version
        model.update({s[0]: s for s in batch})
        v += 1
        snapshots[v] = sorted(model.values())

    for version, want in snapshots.items():
        got = sorted(
            tuple(r)
            for r in txn.txn_read(spark, path, version=version).collect()
        )
        assert got == want


@SETTINGS
@given(
    weights=st.lists(st.integers(0, 40), min_size=1, max_size=60),
    budget=st.integers(0, 600),
    nparts=st.integers(2, 6),
)
def test_budget_prefix_property(spark, weights, budget, nparts):
    """select_prefix_by_budget must equal the sequential prefix scan for
    ANY weights (zeros included), budget, and partition count."""
    from etl_workflow_spark.operators.ranking import select_prefix_by_budget
    from pyspark.sql import functions as F

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["id", "w"]).repartition(3)

    run = 0
    expected = {}
    for i, w in rows:  # already in the order asc(id)
        run += w
        if run > budget:
            break
        expected[i] = run

    got = {
        r.id: r.cum_weight
        for r in select_prefix_by_budget(
            df, [F.asc("id")], "w", budget, num_partitions=nparts
        ).collect()
    }
    assert got == expected


@SETTINGS
@given(
    n=st.integers(1, 120),
    buckets=st.integers(1, 9),
    nparts=st.integers(2, 5),
)
def test_distributed_ntile_property(spark, n, buckets, nparts):
    """distributed_ntile == SQL-standard NTILE for any (n, buckets,
    partitioning): first n%buckets buckets get one extra row."""
    from etl_workflow_spark.operators.ranking import distributed_ntile
    from pyspark.sql import functions as F

    df = spark.range(n).repartition(2)
    got = {
        r.id: r.q
        for r in distributed_ntile(
            df, [F.asc("id")], buckets, out_col="q", num_partitions=nparts
        ).collect()
    }
    size, rem = divmod(n, buckets)
    expected = {}
    pos = 0
    for b in range(1, buckets + 1):
        cnt = size + (1 if b <= rem else 0)
        for _ in range(cnt):
            if pos < n:
                expected[pos] = b
                pos += 1
    # fewer rows than buckets: bucket == row number
    if size == 0:
        expected = {i: i + 1 for i in range(n)}
    assert got == expected


# ------------------------------------------------- txn key-stats pruning


@settings(max_examples=300, deadline=None)
@given(
    entry_keys=st.lists(
        st.integers(-1000, 1000), min_size=0, max_size=12, unique=True
    ),
    batch_keys=st.lists(
        st.integers(-1000, 1000), min_size=0, max_size=12, unique=True
    ),
    with_entry_stats=st.booleans(),
    with_batch_stats=st.booleans(),
)
def test_may_intersect_never_prunes_a_real_conflict(
    entry_keys, batch_keys, with_entry_stats, with_batch_stats
):
    """Soundness invariant of the conflict-check pruner (pure driver
    logic, no Spark): whenever the entry and the batch genuinely share
    a key, _may_intersect must keep the entry — with stats on either
    side, both, or neither. Pruning is only ever allowed on provably
    disjoint ranges."""
    from etl_workflow_spark.sources.txn import _may_intersect

    entry = {"partitions": None}
    if with_entry_stats and entry_keys:
        entry["stats"] = {"id": [min(entry_keys), max(entry_keys)]}
    bstats = (
        {"id": [min(batch_keys), max(batch_keys)]}
        if with_batch_stats and batch_keys
        else {}
    )
    keeps = _may_intersect(entry, ["id"], bstats, None)
    if set(entry_keys) & set(batch_keys):
        assert keeps, (
            f"pruned an entry sharing keys: {entry} vs {sorted(batch_keys)}"
        )
    # and statslessness on either side always keeps the entry
    if not (with_entry_stats and entry_keys) or not (
        with_batch_stats and batch_keys
    ):
        assert keeps


@settings(max_examples=200, deadline=None)
@given(
    entry_parts=st.lists(
        st.sampled_from(["a", "b", "c", "d", "__NULL__"]),
        min_size=0, max_size=4, unique=True,
    ),
    batch_parts=st.lists(
        st.sampled_from(["a", "b", "c", "d", "__NULL__"]),
        min_size=0, max_size=4, unique=True,
    ),
)
def test_may_intersect_partition_pruning_is_set_disjointness(
    entry_parts, batch_parts
):
    """With the partition column among the keys, an entry survives iff
    its partition-value set intersects the batch's (NULL encoded like
    the manifest does); entries with partitions=None always survive."""
    from etl_workflow_spark.sources.txn import _may_intersect

    keeps = _may_intersect(
        {"partitions": entry_parts}, ["p"], {}, batch_parts
    )
    assert keeps == bool(set(entry_parts) & set(batch_parts))
    assert _may_intersect({"partitions": None}, ["p"], {}, batch_parts)


# ------------------------------------------------ byte-fallback BPE

# a fixed training vocabulary (ASCII words) — the property quantifies
# over INPUT text, not over models; pure-Python encode via
# _make_bpe_encoder so each example costs no Spark job
_BPE_WORDS = [("hello", 20), ("world", 15), ("byte", 9), ("fall", 7),
              ("back", 7), ("low", 5)]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_byte_fallback_bpe_round_trips_any_string(s):
    """The GPT-2/SentencePiece byte-fallback property: EVERY string —
    unseen scripts, emoji, control chars, non-ASCII whitespace —
    round-trips encode→decode exactly (lowercase=False model). Without
    fallback all unseen characters collapsed into one OOV id."""
    from etl_workflow_spark.operators.text import (
        _make_bpe_encoder, decode_bpe_tokens, learn_bpe,
    )

    model = learn_bpe(
        _BPE_WORDS, num_merges=20, lowercase=False, min_pair_count=1,
        byte_fallback=True,
    )
    toks = _make_bpe_encoder(model)(s)
    assert decode_bpe_tokens(toks, model) == s
    ids = _make_bpe_encoder(model, ids=True)(s)
    assert decode_bpe_tokens(ids, model, ids=True) == s
    # every id is a REAL symbol — the OOV id is never emitted
    assert all(0 <= i < len(model["symbols"]) for i in ids)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_byte_fallback_bpe_round_trips_modulo_lowercase(s):
    """With the default lowercase normalization the round trip returns
    the case-folded input, whitespace preserved exactly."""
    import re

    from etl_workflow_spark.operators.text import (
        _make_bpe_encoder, decode_bpe_tokens, learn_bpe,
    )

    model = learn_bpe(
        _BPE_WORDS, num_merges=20, lowercase=True, min_pair_count=1,
        byte_fallback=True,
    )
    toks = _make_bpe_encoder(model)(s)
    # lowercase applies to the ASCII-split words; whitespace runs pass
    # through byte-encoding untouched
    want = re.sub(
        r"[^\s]+", lambda m: m.group(0).lower(), s, flags=re.ASCII
    )
    assert decode_bpe_tokens(toks, model) == want


# ------------------------------------------- byte-fallback unigram LM

_UNI_WORDS = [("hello", 20), ("world", 15), ("byte", 9), ("fall", 7),
              ("back", 7), ("low", 5)]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_byte_fallback_unigram_round_trips_any_string(s):
    """The unigram twin of the BPE byte-fallback property: EVERY
    string — unseen scripts, emoji, control chars, non-ASCII
    whitespace, lone surrogates — round-trips encode→decode exactly
    (lowercase=False model), in symbol AND id modes, and the reserved
    unknown id is never emitted."""
    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, decode_unigram_tokens, learn_unigram,
    )

    model = learn_unigram(
        _UNI_WORDS, vocab_size=40, lowercase=False, byte_fallback=True,
    )
    toks = _make_unigram_segmenter(model)(s)
    assert decode_unigram_tokens(toks, model) == s
    ids = _make_unigram_segmenter(model, ids=True)(s)
    assert decode_unigram_tokens(ids, model, ids=True) == s
    # every id is a REAL piece — the reserved unknown id never appears
    assert all(0 <= i < len(model["pieces"]) for i in ids)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_byte_fallback_unigram_round_trips_modulo_lowercase(s):
    """Default lowercase normalization: the round trip returns the
    case-folded input, whitespace preserved exactly (the BPE twin)."""
    import re

    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, decode_unigram_tokens, learn_unigram,
    )

    model = learn_unigram(
        _UNI_WORDS, vocab_size=40, lowercase=True, byte_fallback=True,
    )
    toks = _make_unigram_segmenter(model)(s)
    want = re.sub(
        r"[^\s]+", lambda m: m.group(0).lower(), s, flags=re.ASCII
    )
    assert decode_unigram_tokens(toks, model) == want


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=50), st.integers(0, 3))
def test_byte_fallback_unigram_sampling_round_trips(s, seed):
    """Subword-regularization sampling under byte_fallback still
    round-trips: the sampled segmentation differs, the decoded string
    does not (lowercase=False model, doc-key mixed in)."""
    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, decode_unigram_tokens, learn_unigram,
    )

    model = learn_unigram(
        _UNI_WORDS, vocab_size=40, lowercase=False, byte_fallback=True,
    )
    f = _make_unigram_segmenter(model, sample_alpha=0.3, seed=seed)
    assert decode_unigram_tokens(f(s, "doc-77"), model) == s
