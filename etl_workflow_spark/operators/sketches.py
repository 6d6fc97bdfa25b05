"""Mergeable-sketch rollups: the scalable twin of exact COUNT DISTINCT
(reference D6, ``app.py`` analytics).

An exact distinct over an arbitrary date range re-shuffles the range's
raw facts every time someone asks. Datasketches HLL sketches are
MERGEABLE: aggregate each day's users into one ~KB sketch ONCE, store
the sketches, and any later range query is a union of a few hundred
binary blobs — no fact re-scan, no distinct shuffle, error ~1.04/√2^lg_k
(~0.8% at lg_k=14). ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` are Spark built-ins (JVM-side, codegen sinks).

This is the standard "sketch store" pattern of large-scale metrics
platforms (daily uniques, monthly actives, overlap between periods);
the exact tier stays available for audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    lg_k: int = 14,
) -> DataFrame:
    """One HLL sketch of distinct ``id_col`` per calendar day:
    (date, sketch, n_rows). Build once per ingested day (idempotent
    re-aggregation of a day replaces its row), persist, and range
    queries never touch the facts again. Map-side partial aggregation:
    the shuffle carries one partial sketch per (task, day)."""
    return (
        events.groupBy(F.to_date(F.col(ts_col)).alias("date"))
        .agg(
            F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def distinct_over_range(
    sketches: DataFrame,
    start: str,
    end: str,
    date_col: str = "date",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Estimated distinct count over an inclusive date range from the
    stored sketches: filters |days| rows (partition/row-group pruned on
    the date column) and unions their sketches — cost is independent of
    the fact volume the range covers. Returns one row:
    (n_days, distinct_est)."""
    ranged = sketches.where(
        (F.col(date_col) >= F.lit(start)) & (F.col(date_col) <= F.lit(end))
    )
    return ranged.agg(
        F.count(F.lit(1)).alias("n_days"),
        # allowDifferentLgConfigK: a store whose rows were written at
        # different precisions (config drift across maintenance paths)
        # must still answer range queries — union degrades to the
        # coarser lg_k instead of throwing
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), True)
        ).cast("long").alias("distinct_est"),
    )


def monthly_distinct_sketches(
    day_sketches: DataFrame,
    date_col: str = "date",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Coarser tier of the daily distinct-sketch store: one merged HLL
    per calendar month, built FROM the day store (never the facts) —
    HLL union is exact set-union of the sketched population, so a
    month row answers exactly what unioning its day rows would. A
    year-range query then unions 12 rows instead of 365; the day tier
    stays for ragged range edges (:func:`distinct_over_range_tiered`).
    Rebuilding after late data is one pass over the (tiny) day store.
    Returns (month, sketch, n_rows)."""
    return (
        day_sketches.groupBy(
            F.date_trunc("month", F.col(date_col)).cast("date").alias("month")
        )
        .agg(
            F.hll_union_agg(F.col(sketch_col), True).alias(sketch_col),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def distinct_over_range_tiered(
    day_sketches: DataFrame,
    month_sketches: DataFrame,
    start: str,
    end: str,
    date_col: str = "date",
    month_col: str = "month",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Range distinct estimate reading the cheapest tier for each span:
    whole calendar months inside [start, end] come from the month
    store; only the ragged edge days touch the day store. Identical
    answer to a pure day-store union (month rows ARE day-row unions),
    at O(months + edge days) rows instead of O(days). Returns one row
    (n_sketches, distinct_est)."""
    import datetime as _dt

    lo = _dt.date.fromisoformat(start)
    hi = _dt.date.fromisoformat(end)
    if lo > hi:
        raise ValueError(f"empty range: {start} > {end}")

    def _month_start(d: _dt.date) -> _dt.date:
        return d.replace(day=1)

    def _next_month(d: _dt.date) -> _dt.date:
        return (d.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)

    # first/last fully-covered month: lo rounds FORWARD to a month
    # start unless it is one; hi rounds BACK to its own month only if
    # it is a month END, else to the previous month
    first_full = _month_start(lo) if lo.day == 1 else _next_month(lo)
    last_full = (
        _month_start(hi) if (hi + _dt.timedelta(days=1)).day == 1
        else _month_start(_month_start(hi) - _dt.timedelta(days=1))
    )

    parts = []
    if first_full <= last_full:
        parts.append(
            month_sketches.where(
                (F.col(month_col) >= F.lit(str(first_full)))
                & (F.col(month_col) <= F.lit(str(last_full)))
            ).select(F.col(sketch_col).alias("sk"))
        )
        head_end = first_full - _dt.timedelta(days=1)
        tail_start = _next_month(last_full)
        if lo <= head_end:
            parts.append(
                day_sketches.where(
                    (F.col(date_col) >= F.lit(str(lo)))
                    & (F.col(date_col) <= F.lit(str(head_end)))
                ).select(F.col(sketch_col).alias("sk"))
            )
        if tail_start <= hi:
            parts.append(
                day_sketches.where(
                    (F.col(date_col) >= F.lit(str(tail_start)))
                    & (F.col(date_col) <= F.lit(str(hi)))
                ).select(F.col(sketch_col).alias("sk"))
            )
    else:
        # range covers no whole month — day tier only
        parts.append(
            day_sketches.where(
                (F.col(date_col) >= F.lit(str(lo)))
                & (F.col(date_col) <= F.lit(str(hi)))
            ).select(F.col(sketch_col).alias("sk"))
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.agg(
        F.count(F.lit(1)).alias("n_sketches"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sk"), True)
        ).cast("long").alias("distinct_est"),
    )


def period_overlap_estimate(
    sketches_a: DataFrame,
    sketches_b: DataFrame,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Estimated overlap of two periods' distinct populations by
    inclusion-exclusion on sketch unions (retention between months,
    audience overlap): |A∩B| ≈ |A| + |B| − |A∪B|. Same error caveat as
    every HLL subtraction — small overlaps are noisy; audit with the
    exact tier. Returns (a_est, b_est, overlap_est)."""
    a = sketches_a.agg(F.hll_union_agg(F.col(sketch_col), True).alias("sa"))
    b = sketches_b.agg(F.hll_union_agg(F.col(sketch_col), True).alias("sb"))
    both = a.crossJoin(b)
    return both.select(
        F.hll_sketch_estimate("sa").cast("long").alias("a_est"),
        F.hll_sketch_estimate("sb").cast("long").alias("b_est"),
        F.greatest(
            F.lit(0),
            (
                F.hll_sketch_estimate("sa")
                + F.hll_sketch_estimate("sb")
                - F.hll_sketch_estimate(F.hll_union("sa", "sb", True))
            ),
        ).cast("long").alias("overlap_est"),
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Approximate top-k frequent items (``approx_top_k`` built-in —
    a bounded frequent-items sketch per partition, merged once): the
    hot-key detector that feeds the skew tier (`operators/skew.py`)
    and term/domain monitoring, at one pass and O(max_items_tracked)
    state — where an exact top-k pays a full groupBy shuffle over every
    distinct value. Exact counts for items that dominate; items near
    the tracking boundary can under-count (standard frequent-items
    contract). Returns (item, count) rows, most frequent first."""
    sk = df.selectExpr(
        f"approx_top_k({col}, {int(k)}, {int(max_items_tracked)}) AS tk"
    )
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("count")
    )


def value_histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    ts_col: str | None = None,
    lo: float = 0.01,
    hi: float = 1e9,
    growth: float = 1.05,
) -> DataFrame:
    """Mergeable log-scale histogram of a numeric column per group —
    the quantile twin of :func:`daily_distinct_sketches`. Exact
    per-bin counts (binning, not sampling): merging is bin-wise
    addition, so a day's histogram is built ONCE and any later
    range/rollup query unions a few hundred small rows instead of
    re-scanning and re-sorting the facts (what every exact
    percentile_approx over a range pays).

    Bins are geometric: bucket i covers [lo·g^(i-1), lo·g^i), plus an
    underflow bin 0 (v ≤ lo, including zero/negatives) and a terminal
    overflow bin (v ≥ hi). Quantile estimates from the merged counts
    carry relative error ≤ growth−1 (5% at the default 1.05; tighten
    with growth=1.01 for ~2.3× more bins). The sketch rows are
    self-describing (lo/hi/growth/nbins stored alongside) and
    parquet-round-trippable.

    Bin counts are stored SPARSE (``bins map<int,long>``): a group
    touches only as many bins as it has distinct magnitudes — a
    thin-sliced store (per day × source) would waste nbins longs per
    row dense, and the dense materialization itself was the measured
    hot spot (nbins × groups interpreted HOF steps; 2.5k day-rows
    went 2.65 s → ~1.0 s warm end-to-end after the sparse rewrite).
    Only :func:`merge_histogram_sketches`'s single output row
    densifies.

    ``ts_col`` is a convenience: group by its calendar date. One
    groupBy shuffle whose payload is ≤ non-empty (group, bin) cells.
    """
    import math

    if not (hi > lo > 0 and growth > 1):
        raise ValueError("need hi > lo > 0 and growth > 1")
    inner = math.ceil(math.log(hi / lo) / math.log(growth))
    nbins = inner + 2  # underflow + inner + overflow

    keys = [F.col(c) for c in (group_cols or [])]
    if ts_col is not None:
        keys = [F.to_date(F.col(ts_col)).alias("date")] + keys
    v = F.col(value_col).cast("double")
    bucket = (
        F.when(v <= F.lit(float(lo)), F.lit(0))
        .when(v >= F.lit(float(hi)), F.lit(nbins - 1))
        .otherwise(
            (
                F.floor(F.log(v / F.lit(float(lo))) / F.lit(math.log(growth)))
                + F.lit(1)
            ).cast("int")
        )
    )
    per_bucket = (
        df.where(v.isNotNull())
        .groupBy(*keys, bucket.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum(v).alias("bsum"),
            F.min(v).alias("bmin"),
            F.max(v).alias("bmax"),
        )
    )
    key_names = (["date"] if ts_col is not None else []) + list(group_cols or [])
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("b"), F.col("bn").cast("long")))
    )
    sk = per_bucket.groupBy(*[F.col(k) for k in key_names]).agg(
        m.alias("bins"),
        F.sum("bn").alias("n"),
        F.sum("bsum").alias("vsum"),
        F.min("bmin").alias("vmin"),
        F.max("bmax").alias("vmax"),
    )
    return sk.select(
        *key_names,
        "bins",
        "n",
        "vsum",
        "vmin",
        "vmax",
        F.lit(float(lo)).alias("lo"),
        F.lit(float(hi)).alias("hi"),
        F.lit(float(growth)).alias("growth"),
        F.lit(nbins).alias("nbins"),
    )


def merge_histogram_sketches(sketches: DataFrame) -> DataFrame:
    """Merge histogram-sketch rows (a date range, a set of groups)
    into ONE combined histogram — exact on exact counts. A SINGLE
    aggregation over the sketch rows (a two-branch bins+totals plan
    would execute the input lineage twice): collect the sparse bin
    maps, fold them with ``map_zip_with`` addition (work is the number
    of NON-EMPTY cells, not rows × nbins), then densify the one
    surviving map into a ``counts`` array. Both lambdas capture only
    attribute references / lambda variables (O(1) per element —
    expression captures in HOF lambdas are quadratic). All sketches
    must share one (lo, hi, growth) config — bins are only comparable
    within a config. Returns one row: (counts, n, vsum, vmin, vmax,
    lo, hi, growth, nbins)."""
    folded = merge_histogram_rows(sketches, keys=[])
    counts = F.transform(
        F.sequence(F.lit(0), F.col("nbins") - 1),
        lambda i: F.coalesce(
            F.element_at(F.col("bins"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return folded.select(
        counts.alias("counts"),
        "n", "vsum", "vmin", "vmax", "lo", "hi", "growth", "nbins",
    )


def merge_histogram_rows(
    sketches: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Merge sketch rows per ``keys`` group, staying in the SPARSE
    store format (bins map, no densify) — the building block for
    store compaction (collapse a day's per-batch fragments into one
    row) and coarser rollups (day → month). ``keys=[]`` merges
    everything to one row."""
    key_cols = [F.col(k) for k in (keys or [])]
    one = sketches.groupBy(*key_cols).agg(
        F.collect_list("bins").alias("ml"),
        F.sum("n").alias("n"),
        F.sum("vsum").alias("vsum"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.first("growth").alias("growth"),
        F.first("nbins").alias("nbins"),
    )
    merged_map = F.aggregate(
        F.col("ml"),
        F.expr("map()").cast("map<int,bigint>"),
        lambda acc, m: F.map_zip_with(
            acc,
            m,
            lambda _k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
        ),
    )
    return one.select(
        *(keys or []),
        merged_map.alias("bins"),
        "n", "vsum", "vmin", "vmax", "lo", "hi", "growth", "nbins",
    )


def histogram_quantiles(
    merged: DataFrame,
    qs: list[float],
) -> list[tuple[float, float]]:
    """Quantile estimates from a merged histogram row: walk the
    cumulative counts, geometric interpolation inside the landing bin,
    clamped to the observed [vmin, vmax]. Relative error ≤ growth−1
    for values inside (lo, hi); the edge bins answer with the exact
    observed extrema. The input is ONE bounded row — the collect is
    O(nbins), justified. Returns [(q, estimate), ...]."""
    import math

    row = merged.collect()[0]
    counts, n = list(row.counts), int(row.n)
    lo, growth = float(row.lo), float(row.growth)
    vmin, vmax = float(row.vmin), float(row.vmax)
    if n == 0:
        raise ValueError("empty histogram")
    out = []
    cum = [0]
    for c in counts:
        cum.append(cum[-1] + c)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0,1]")
        rank = q * n
        # first bin whose cumulative count reaches the rank
        b = next(i for i in range(len(counts)) if cum[i + 1] >= rank)
        if b == 0:
            est = vmin
        elif b == len(counts) - 1:
            est = vmax
        else:
            lo_edge = lo * growth ** (b - 1)
            hi_edge = lo_edge * growth
            frac = (rank - cum[b]) / counts[b] if counts[b] else 0.0
            est = lo_edge * math.exp(frac * math.log(hi_edge / lo_edge))
        out.append((q, min(max(est, vmin), vmax)))
    return out


def histogram_drift(
    sketches_a: DataFrame,
    sketches_b: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """Numeric-distribution drift between two histogram-sketch sets —
    the value-column twin of
    :func:`~etl_workflow_spark.operators.text.corpus_drift` (did
    document lengths / quality scores / order values shift between
    yesterday's and today's ingest?): merge each side
    (:func:`merge_histogram_sketches`, bin-wise exact addition), then
    run THE SAME driver-side PSI arithmetic over the dense bin counts
    (:func:`~etl_workflow_spark.operators.text._psi_frame` — one PSI
    implementation in the engine, so text and numeric drift cannot
    diverge). Standard reading applies: < 0.1 stable, 0.1-0.25
    moderate, > 0.25 major shift.

    Sides must share one (lo, hi, growth, nbins) config — bins are
    only comparable within a config; mismatches are refused. Cost:
    two sketch merges (cells-bounded) + nbins driver rows. With the
    histogram STORE maintaining per-day sketch rows, day-over-day
    numeric drift never re-scans facts — the same zero-re-scan
    contract as the term-drift bucket store. Returns ``(bucket, n_a,
    n_b, psi_e9, psi_total_e9)`` over the full bin spine."""
    from .text import _psi_frame

    ma = merge_histogram_sketches(sketches_a).collect()[0]
    mb = merge_histogram_sketches(sketches_b).collect()[0]
    # zero sketch ROWS merge to an all-NULL row (first()/collect_list
    # over nothing) — both configs would "match" as (None,)*4 and the
    # zip below would crash illegibly
    if ma["counts"] is None or mb["counts"] is None:
        raise ValueError(
            "histogram_drift needs at least one sketch row per side"
        )
    cfg_a = (ma["lo"], ma["hi"], ma["growth"], ma["nbins"])
    cfg_b = (mb["lo"], mb["hi"], mb["growth"], mb["nbins"])
    if cfg_a != cfg_b:
        raise ValueError(
            "histogram_drift needs both sides under one (lo, hi, "
            f"growth, nbins) config (got {cfg_a} vs {cfg_b})"
        )
    got = {
        i: (int(a), int(b))
        for i, (a, b) in enumerate(zip(ma["counts"], mb["counts"]))
    }
    return _psi_frame(
        sketches_a.sparkSession, got, int(ma["nbins"]), smoothing
    )


def histogram_drift_oracle(
    where_a: str,
    where_b: str,
    value_col: str = "value",
    table: str = "events",
    lo: float = 0.01,
    hi: float = 1e9,
    growth: float = 1.05,
    smoothing: float = 0.5,
) -> str:
    """DuckDB twin of :func:`value_histogram_sketch` →
    :func:`histogram_drift` for gate windows defined by SQL
    predicates: the geometric binning replays with the engine's exact
    operand bits — the log-growth divisor is the PYTHON-computed
    ``math.log(growth)`` embedded as a repr literal, exactly the
    ``F.lit`` the sketch builder ships — and the PSI block repeats
    the driver arithmetic with every float literal CAST to DOUBLE
    (the :func:`~etl_workflow_spark.operators.text
    .corpus_drift_oracle` convention)."""
    import math

    inner = math.ceil(math.log(hi / lo) / math.log(growth))
    nbins = inner + 2
    lo_s = f"CAST({float(lo)!r} AS DOUBLE)"
    hi_s = f"CAST({float(hi)!r} AS DOUBLE)"
    lng = f"CAST({math.log(growth)!r} AS DOUBLE)"
    s = f"CAST({float(smoothing)!r} AS DOUBLE)"
    sb = f"CAST({float(smoothing) * nbins!r} AS DOUBLE)"
    bucket = (
        f"CASE WHEN v <= {lo_s} THEN 0 "
        f"WHEN v >= {hi_s} THEN {nbins - 1} "
        f"ELSE CAST(FLOOR(ln(v / {lo_s}) / {lng}) + 1 AS INT) END"
    )

    def win(pred: str, name: str) -> str:
        return f"""
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS {name} FROM (
                SELECT {bucket} AS bucket FROM (
                    SELECT CAST({value_col} AS DOUBLE) AS v
                    FROM {table}
                    WHERE {value_col} IS NOT NULL AND ({pred})
                )
            ) GROUP BY 1
        """

    return f"""
        WITH ca AS ({win(where_a, "n_a")}),
        cb AS ({win(where_b, "n_b")}),
        spine AS (
            SELECT CAST(range AS INT) AS bucket FROM range({nbins})
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
