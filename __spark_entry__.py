"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator (SURVEY.md §2 + LLM-pipeline extensions) to a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the
DuckDB twin for the correctness gate.  Column names are aliased
identically on both sides (the driver sorts columns by name and hashes
values).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_workflow_spark import queries as Q
from etl_workflow_spark.catalog import table
from etl_workflow_spark.operators import chunking as CH
from etl_workflow_spark.operators import dedup as D
from etl_workflow_spark.operators import etl as E
from etl_workflow_spark.operators import multimodal as M
from etl_workflow_spark.operators import quality as QL
from etl_workflow_spark.operators import ranking as RK
from etl_workflow_spark.operators import sampling as SAMP
from etl_workflow_spark.operators import similarity as S
from etl_workflow_spark.operators import sketches as SK
from etl_workflow_spark.operators import text as T
from etl_workflow_spark.operators.dimtime import dim_time_frame, dim_time_oracle

MONEY = "decimal(18,2)"


# --------------------------------------------------------------------------
# Testdata-bound wrappers for the generic ETL operators (FIXTURES.md §3
# column mapping: orders→orders, order_items→lineitem, products→part).
# --------------------------------------------------------------------------


def _q_daily_sales_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = table(spark, sf_dir, "lineitem").withColumn("item_total", Q.item_total())
    df = E.daily_sales_aggregation(
        items,
        table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey"),
        order_key="l_orderkey",
        product_key="l_partkey",
        order_date="o_orderdate",
        category_key="p_brand",
        quantity="l_quantity",
        total="item_total",
    )
    return df.select(
        F.col("date"),
        F.col("l_partkey").alias("product_id"),
        F.col("p_brand").alias("category_name"),
        F.col("units_sold").cast("double").alias("units_sold"),
        F.col("revenue").cast("double").alias("revenue"),
        F.col("order_count"),
        F.col("avg_unit_price"),
    )


_DAILY_SALES_ORACLE = """
    WITH it AS (
        SELECT l_orderkey, l_partkey,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS item_total
        FROM lineitem
    )
    SELECT CAST(o.o_orderdate AS DATE) AS date,
           it.l_partkey AS product_id,
           p.p_brand AS category_name,
           CAST(SUM(it.qty) AS DOUBLE) AS units_sold,
           CAST(SUM(it.item_total) AS DOUBLE) AS revenue,
           COUNT(DISTINCT it.l_orderkey) AS order_count,
           COALESCE(CAST(SUM(it.item_total) AS DOUBLE)
                    / CAST(SUM(it.qty) AS DOUBLE), 0.0) AS avg_unit_price
    FROM it
    LEFT JOIN orders o ON it.l_orderkey = o.o_orderkey
    LEFT JOIN part p ON it.l_partkey = p.p_partkey
    GROUP BY 1, 2, 3
"""


def _q_lifetime_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = E.with_lifetime_value(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        customer_key="c_custkey",
        order_customer_key="o_custkey",
        amount="o_totalprice",
    )
    return df.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        F.col("lifetime_value").cast("double").alias("lifetime_value"),
    )


_LIFETIME_VALUE_ORACLE = """
    SELECT c.c_custkey AS customer_id,
           c.c_name AS name,
           CAST(COALESCE(o.lv, 0) AS DOUBLE) AS lifetime_value
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS lv
        FROM orders GROUP BY 1
    ) o ON c.c_custkey = o.o_custkey
"""


def _q_customer_purchase_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = E.customer_purchase_summary(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        customer_key="c_custkey",
        order_key="o_orderkey",
        order_date="o_orderdate",
        amount="o_totalprice",
        status="o_orderstatus",
        excluded_status=("F",),
    )
    return df.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("order_count"),
        F.col("total_spent").cast("double").alias("total_spent"),
        F.col("first_order_date"),
        F.col("last_order_date"),
        F.col("avg_days_between_orders").cast("double").alias("avg_days_between_orders"),
    )


_CUSTOMER_SUMMARY_ORACLE = """
    SELECT c.c_custkey AS customer_id,
           COUNT(DISTINCT o.o_orderkey) AS order_count,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           MIN(o.o_orderdate) AS first_order_date,
           MAX(o.o_orderdate) AS last_order_date,
           CAST(datediff('day', CAST(MIN(o.o_orderdate) AS DATE),
                                CAST(MAX(o.o_orderdate) AS DATE)) AS DOUBLE)
               / COUNT(DISTINCT o.o_orderkey) AS avg_days_between_orders
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1
"""


def _q_product_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = table(spark, sf_dir, "lineitem").withColumn("item_total", Q.item_total())
    df = E.product_sales_summary(
        table(spark, sf_dir, "part").withColumnRenamed("p_brand", "category_name"),
        None,
        items.withColumnRenamed("l_partkey", "p_partkey").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        table(spark, sf_dir, "orders"),
        product_key="p_partkey",
        product_name="p_name",
        category_name="category_name",
        order_key="o_orderkey",
        customer_key="o_custkey",
        order_date="o_orderdate",
        quantity="l_quantity",
        total="item_total",
        status="o_orderstatus",
        excluded_status=("F",),
    )
    return df.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("category_name"),
        F.col("total_quantity_sold").cast("double").alias("total_quantity_sold"),
        F.col("total_revenue").cast("double").alias("total_revenue"),
        F.col("order_count"),
        F.col("unique_customers"),
        F.col("last_order_date"),
    )


_PRODUCT_SUMMARY_ORACLE = """
    SELECT p.p_partkey AS product_id,
           p.p_name AS product_name,
           p.p_brand AS category_name,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_quantity_sold,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(l.l_quantity AS DECIMAL(18,2))
                         - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2)))
                AS DOUBLE) AS total_revenue,
           COUNT(DISTINCT o.o_orderkey) AS order_count,
           COUNT(DISTINCT o.o_custkey) AS unique_customers,
           MAX(o.o_orderdate) AS last_order_date
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY 1, 2, 3
"""


def _q_order_items_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 + G1/Q6: clean key nulls then recompute total (workflow.py:120-127)."""
    items = E.clean_nulls(
        table(spark, sf_dir, "lineitem"), ["l_orderkey", "l_partkey", "l_quantity"]
    )
    df = E.recompute_item_total(
        items, price="l_extendedprice", quantity="l_quantity",
        discount="l_discount", out="total",
    )
    return df.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_quantity").cast("int").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("total").cast("double").alias("total"),
    )


_ORDER_ITEMS_TRANSFORM_ORACLE = """
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_number,
           l_partkey AS product_id,
           CAST(l_quantity AS INT) AS quantity,
           CAST(l_extendedprice AS DOUBLE) AS price,
           CAST(l_discount AS DOUBLE) AS discount,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))
                AS DOUBLE) AS total
    FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      AND l_quantity IS NOT NULL
"""


def _q_update_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 updateProduct mutation (app.py:182-226) as a read-side check:
    conditional projection + updated_at stamping, projected onto
    deterministic columns (the timestamp itself becomes a flag)."""
    df = Q.update_product(spark, sf_dir, product_id=1, name="UPDATED", price=99.99)
    return df.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("name"),
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("updated_at").isNotNull().alias("was_updated"),
    )


_UPDATE_PRODUCT_ORACLE = """
    SELECT p_partkey AS product_id,
           CASE WHEN p_partkey = 1 THEN 'UPDATED' ELSE p_name END AS name,
           CAST(CASE WHEN p_partkey = 1 THEN 99.99 ELSE p_retailprice END
                AS DOUBLE) AS price,
           (p_partkey = 1) AS was_updated
    FROM part
"""


def _q_orders_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 membership filter as a left-semi join: orders of high-balance
    customers (data-generator.py:300 sample-membership analog). The
    build side is the filtered dim — broadcastable, no fact shuffle."""
    orders = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    return orders.join(
        F.broadcast(rich),
        orders.o_custkey == rich.c_custkey,
        "left_semi",
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").cast("double").alias("total_amount"),
    )


_ORDERS_SEMIJOIN_ORACLE = """
    SELECT o_orderkey AS order_id,
           o_custkey AS customer_id,
           CAST(o_totalprice AS DOUBLE) AS total_amount
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
"""


# --------------------------------------------------------------------------
# LLM-pipeline operators on documents / embeddings / events
# --------------------------------------------------------------------------

def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-pairwise tier: fine for the documents table (planted
    # near-dups sit at Jaccard ~0.98); minhash_lsh is the scale path.
    docs = table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.5)


def _q_dedup_recipes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated dedup-recipe gate entry — two operators
    (`operators/dedup.py`), each cross-engine hash-checked, unioned
    into one (kind, k1, k2, n) frame (r7 verdict #6: rotate the
    paragraph tier from Python-oracle pytest to the DuckDB gate):

    - ``exact``: byte-duplicate groups over normalized text —
      k1 = content hash, k2 = keeper id, n = copies
      (reference analog: ON CONFLICT DO NOTHING, app.py:186-199);
    - ``para``: corpus-wide paragraph dedup (first occurrence by
      (doc_id, pos) wins, later repeats removed, document rebuilt) —
      k1 = doc id, k2 = the REBUILT text (value-level parity, not
      just counts), n = paragraphs removed;
    - ``spans``: ExactSubstr-style span dedup at 20-token windows
      (``dedup_spans`` — repeated >=L-token runs survive only at
      their first (doc, pos); only affected docs rebuild) — k1 =
      doc id, k2 = rebuilt (or untouched original) text, n = tokens
      removed. Spark groups windows by xxhash64 of the token-hash
      slice; the oracle groups by the literal window string, so a
      hash collision would surface as a gate mismatch.
    """
    docs = table(spark, sf_dir, "documents")
    exact = D.exact_dedup(docs).select(
        F.lit("exact").alias("kind"),
        F.col("content_hash").alias("k1"),
        F.col("keeper_id").cast("string").alias("k2"),
        F.col("n_copies").cast("long").alias("n"),
    )
    paras = D.dedup_paragraphs(docs).select(
        F.lit("para").alias("kind"),
        F.col("doc_id").cast("string").alias("k1"),
        F.coalesce(F.col("text"), F.lit("<NULL>")).alias("k2"),
        F.col("n_paras_removed").cast("long").alias("n"),
    )
    spans = D.dedup_spans(docs, min_tokens=20).select(
        F.lit("spans").alias("kind"),
        F.col("doc_id").cast("string").alias("k1"),
        F.coalesce(F.col("text"), F.lit("<NULL>")).alias("k2"),
        F.col("n_tokens_removed").cast("long").alias("n"),
    )
    return exact.unionByName(paras).unionByName(spans)


_DEDUP_RECIPES_ORACLE = f"""
    WITH exact AS (
        SELECT 'exact' AS kind,
               sha256(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                   AS k1,
               CAST(MIN(doc_id) AS VARCHAR) AS k2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents
        GROUP BY 2
    ),
    split AS (
        SELECT doc_id, string_split(text, chr(10)||chr(10)) AS parts
        FROM documents WHERE text IS NOT NULL
    ),
    paras AS (
        SELECT doc_id,
               generate_subscripts(parts, 1) AS pos,
               unnest(parts) AS para
        FROM split
    ),
    flagged AS (
        SELECT doc_id, pos, para,
               (length(trim(para)) > 0) AS nonempty,
               row_number() OVER (
                   PARTITION BY trim(para) ORDER BY doc_id, pos
               ) AS rn
        FROM paras
    ),
    rebuilt AS (
        SELECT doc_id,
               coalesce(string_agg(
                   CASE WHEN NOT (nonempty AND rn > 1) THEN para END,
                   chr(10)||chr(10) ORDER BY pos), '') AS text,
               CAST(count(CASE WHEN nonempty AND rn > 1 THEN 1 END)
                    AS BIGINT) AS n
        FROM flagged GROUP BY doc_id
    ),
    para_rows AS (
        SELECT 'para' AS kind,
               CAST(d.doc_id AS VARCHAR) AS k1,
               coalesce(r.text, '<NULL>') AS k2,
               CAST(coalesce(r.n, 0) AS BIGINT) AS n
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    ),
    sp_toks AS (
        SELECT doc_id, {T._sql_tokens("text")} AS tk
        FROM documents WHERE text IS NOT NULL
    ),
    sp_wlists AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(tk) - 19, 0)),
                   i -> array_to_string(list_slice(tk, i, i + 19), ' ')
               ) AS ws
        FROM sp_toks
    ),
    sp_wins AS (
        SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS w
        FROM sp_wlists
    ),
    sp_flagged AS (
        SELECT doc_id, wpos,
               count(*) OVER (PARTITION BY w) AS cnt,
               row_number() OVER (
                   PARTITION BY w ORDER BY doc_id, wpos
               ) AS rn
        FROM sp_wins
    ),
    sp_removed AS (
        SELECT DISTINCT doc_id,
               unnest(generate_series(wpos, wpos + 19)) AS tpos
        FROM sp_flagged WHERE cnt > 1 AND rn > 1
    ),
    sp_rem_agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        FROM sp_removed GROUP BY 1
    ),
    sp_toks_pos AS (
        SELECT t.doc_id, generate_subscripts(t.tk, 1) AS tpos,
               unnest(t.tk) AS tok
        FROM sp_toks t SEMI JOIN sp_rem_agg r ON t.doc_id = r.doc_id
    ),
    sp_rebuilt AS (
        SELECT tp.doc_id,
               coalesce(string_agg(
                   CASE WHEN rm.tpos IS NULL THEN tp.tok END,
                   ' ' ORDER BY tp.tpos), '') AS new_text
        FROM sp_toks_pos tp LEFT JOIN sp_removed rm
          ON tp.doc_id = rm.doc_id AND tp.tpos = rm.tpos
        GROUP BY 1
    ),
    span_rows AS (
        SELECT 'spans' AS kind,
               CAST(d.doc_id AS VARCHAR) AS k1,
               coalesce(coalesce(r.new_text, d.text), '<NULL>') AS k2,
               CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n
        FROM documents d
        LEFT JOIN sp_rebuilt r USING (doc_id)
        LEFT JOIN sp_rem_agg a USING (doc_id)
    )
    SELECT kind, k1, k2, n FROM exact
    UNION ALL
    SELECT kind, k1, k2, n FROM para_rows
    UNION ALL
    SELECT kind, k1, k2, n FROM span_rows
"""


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → canonical cluster assignment (connected components):
    the step that makes a pair list an actual dedup decision."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5)
    return D.dedup_clusters(pairs, all_ids=docs)


_DEDUP_CLUSTERS_ORACLE = D.dedup_clusters_oracle(
    D.ngram_jaccard_oracle(threshold=0.5)
)


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash-LSH family in ONE hash-checked row.

    The raw candidate pairs depend on xxhash64 buckets (no DuckDB
    analog), so the gate asserts the falsifiable contract instead:

      n_exact            exact-Jaccard pair count (oracle-exact)
      recall_ok          >= 80% of exact pairs recovered by the banded
                         LSH path (planted near-dups sit at J~0.98
                         where S-curve collision prob ~1)
      no_false_positives the LSH output verifies candidates with the
                         SAME exact Jaccard, so found ⊆ exact must hold
                         as a set identity, not an approximation
      pairs_ordered_ok   every emitted pair has doc_a < doc_b
    """
    docs = table(spark, sf_dir, "documents")
    exact = (
        D.ngram_jaccard_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .persist()
    )
    found = (
        D.minhash_lsh_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .persist()
    )
    # Eager one-row contract: both aggregates are actions over the two
    # persisted pair frames, collected here so the cache can be released
    # before returning (a lazily-returned plan would leak the persisted
    # blocks across the multi-query gate run).
    try:
        j = exact.join(
            found.withColumn("hit", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        n = F.count(F.lit(1))
        hits = F.coalesce(F.sum("hit"), F.lit(0))
        r1 = j.agg(
            n.alias("n_exact"),
            (hits * F.lit(10) >= n * F.lit(8)).alias("recall_ok"),
        ).collect()[0]
        r2 = found.join(
            exact.withColumn("e", F.lit(1)), ["doc_a", "doc_b"], "left"
        ).agg(
            (F.count(F.when(F.col("e").isNull(), 1)) == 0).alias(
                "no_false_positives"
            ),
            F.coalesce(F.expr("bool_and(doc_a < doc_b)"), F.lit(True)).alias(
                "pairs_ordered_ok"
            ),
        ).collect()[0]
    finally:
        exact.unpersist()
        found.unpersist()
    return spark.createDataFrame(
        [
            (
                r1["n_exact"],
                bool(r1["recall_ok"]),
                bool(r2["no_false_positives"]),
                bool(r2["pairs_ordered_ok"]),
            )
        ],
        "n_exact bigint, recall_ok boolean, no_false_positives boolean, "
        "pairs_ordered_ok boolean",
    )


_DEDUP_MINHASH_ORACLE = f"""
    WITH pairs AS ({D.ngram_jaccard_oracle(threshold=0.5)})
    SELECT COUNT(*) AS n_exact, TRUE AS recall_ok,
           TRUE AS no_false_positives, TRUE AS pairs_ordered_ok
    FROM pairs
"""


def _q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash family (fingerprint + pigeonhole Hamming join) in ONE
    hash-checked row. The 64-bit xxhash64 fingerprints themselves have
    no DuckDB analog; the contract does:

      n_docs             one fingerprint per document
      n_exact            exact pairs at Jaccard >= 0.8 (oracle-exact)
      recall_ok          strong near-dups land within Hamming 6, where
                         the 7-segment pigeonhole join GUARANTEES
                         candidate generation — a miss means the
                         fingerprint drifted, not the join
      pairs_ordered_ok   doc_a < doc_b on every pair
      hamming_bounded_ok emitted distances within [0, 6]
    """
    docs = table(spark, sf_dir, "documents")
    fps = D.simhash(docs).persist()
    found = D.hamming_pairs(fps, max_distance=6).persist()
    # Eager one-row contract — see _q_dedup_minhash for why (persisted
    # blocks must be released before the frame is handed back).
    try:
        exact = D.ngram_jaccard_pairs(docs, threshold=0.8).select(
            "doc_a", "doc_b"
        )
        j = exact.join(
            found.select("doc_a", "doc_b").withColumn("hit", F.lit(1)),
            ["doc_a", "doc_b"],
            "left",
        )
        n = F.count(F.lit(1))
        hits = F.coalesce(F.sum("hit"), F.lit(0))
        r1 = j.agg(
            n.alias("n_exact"),
            (hits * F.lit(10) >= n * F.lit(8)).alias("recall_ok"),
        ).collect()[0]
        r2 = fps.agg(F.count(F.lit(1)).alias("n_docs")).collect()[0]
        r3 = found.agg(
            F.coalesce(F.expr("bool_and(doc_a < doc_b)"), F.lit(True)).alias(
                "pairs_ordered_ok"
            ),
            F.coalesce(
                F.expr("bool_and(hamming BETWEEN 0 AND 6)"), F.lit(True)
            ).alias("hamming_bounded_ok"),
        ).collect()[0]
    finally:
        fps.unpersist()
        found.unpersist()
    return spark.createDataFrame(
        [
            (
                r1["n_exact"],
                bool(r1["recall_ok"]),
                r2["n_docs"],
                bool(r3["pairs_ordered_ok"]),
                bool(r3["hamming_bounded_ok"]),
            )
        ],
        "n_exact bigint, recall_ok boolean, n_docs bigint, "
        "pairs_ordered_ok boolean, hamming_bounded_ok boolean",
    )


# literal stopword list for oracle SQL (same tuple the Spark side uses)
_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

_SIMHASH_NEARDUP_ORACLE = f"""
    WITH pairs AS ({D.ngram_jaccard_oracle(threshold=0.8)})
    SELECT COUNT(*) AS n_exact, TRUE AS recall_ok,
           (SELECT COUNT(*) FROM documents) AS n_docs,
           TRUE AS pairs_ordered_ok, TRUE AS hamming_bounded_ok
    FROM pairs
"""


def _q_quality_filtered_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline: quality-score -> filter -> corpus stats, the
    canonical pre-training data funnel (filter feeds token budget).

    Every output column is an exact integer computed from integer
    primitives only: the average is integral fixed-point (1e-4 units)
    via truncating integer division, and the stopword-ratio sum is
    per-doc integer fixed-point ``(stop_hits * 1e6) DIV n_words``
    summed as BIGINT — identical arithmetic in Spark and DuckDB. Two
    rounds of hash-FAILs traced to ``round(double, 4)`` sitting on an
    environment-sensitive knife edge; no float touches this entry now.
    """
    # ONE corpus scan, zero joins: quality verdict, token count, and
    # the stopword fixed-point all project off the same row (the fused
    # form of quality -> filter -> stats; three joined operators would
    # scan the corpus three times).
    # Per-doc fixed point from INTEGER primitives (stop_hits, n_words)
    # — never sum a rounded double ratio: the r3/r4 hash-fails were a
    # last-ulp difference between Spark's and DuckDB's round(double, 4)
    # flipping one doc's 4th decimal. Integer DIV is exact in both.
    docs = table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    agg = (
        docs.select(
            T._passes_quality("text").alias("_ok"),
            T._n_tokens("text").alias("n_tokens"),
            F.size(toks).alias("_nw"),
            F.size(
                F.filter(toks, lambda w: F.lower(w).isin(*T.STOPWORDS_EN))
            ).alias("_sh"),
        )
        .withColumn(
            "_ssr_e6",
            F.expr("CAST((CAST(_sh AS BIGINT) * 1000000) DIV _nw AS BIGINT)"),
        )
        .where(F.col("_ok"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("_ssr_e6").alias("sum_stopword_ratio_e6"),
        )
    )
    return agg.select(
        "n_docs",
        "total_tokens",
        F.expr("CAST((total_tokens * 10000) DIV n_docs AS BIGINT)").alias(
            "avg_tokens_e4"
        ),
        F.col("sum_stopword_ratio_e6").cast("long").alias(
            "sum_stopword_ratio_e6"
        ),
    )


def _ann_recall_frame(
    exact: DataFrame, approx: DataFrame, min_recall: float
) -> DataFrame:
    """Per-query recall of an approximate top-k against the exact tier.

    Turns a hash/quantizer-dependent result (not SQL-expressible) into a
    falsifiable invariant: the oracle asserts ``recall_ok`` for every
    query, so a recall regression fails the gate instead of hiding
    behind a rows-only check. Both tiers run in Spark with deterministic
    tie-breaks, so the recall value itself is reproducible.
    """
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    per_q = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
    )
    recall = F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")
    return per_q.select(
        "query_id",
        F.col("n_exact"),
        (recall >= F.lit(min_recall)).alias("recall_ok"),
    ).orderBy("query_id")


def _hybrid_qmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid tier's query table: ``(qid, qtext)`` where qtext is
    each query doc's first 8 whitespace tokens, lowercased — derived
    IDENTICALLY by the DuckDB oracle (`_ANN_HYBRID_ORACLE`'s hq CTE)."""
    return table(spark, sf_dir, "documents").where("doc_id < 4").select(
        F.col("doc_id").alias("qid"),
        F.array_join(
            F.slice(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8
            ),
            " ",
        ).alias("qtext"),
    )


def _hybrid_search_frame(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Sparse+dense hybrid retrieval, fused: BM25 over the derived
    query text + exact cosine over the query doc's embedding, top-20
    each, combined by integer reciprocal-rank fusion. ONE definition
    shared by the `ann_topk` gate tier and the bench's
    `hybrid_search` entry — the timed workload is exactly the
    hash-checked one."""
    from etl_workflow_spark.operators.ranking import rrf_fuse

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    qmap = _hybrid_qmap(spark, sf_dir)
    qrows = qmap.collect()  # bounded: 4 one-line rows
    sparse = T.bm25_topk(
        docs, [r["qtext"] for r in qrows], k=20
    ).select("query", "doc_id", "rank")
    dense = S.brute_force_topk(
        emb,
        emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id"),
        k=20,
    )
    dense_named = dense.join(
        F.broadcast(qmap), dense["query_id"] == qmap["qid"]
    ).select(
        F.col("qtext").alias("query"),
        F.col("neighbor_id").alias("doc_id"),
        "rank",
    )
    return rrf_fuse([sparse, dense_named], k=k)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole ANN family in ONE hash-checked frame, three row tiers
    plus recall-contract flag columns:

    - tier='exact': brute-force top-5 rows, fully oracle-checked.
    - tier='int8': `quantized_topk` (rerank ×4) rows, ALSO fully
      oracle-checked — the DuckDB twin replicates quantization,
      integer cosine, candidate cut, and exact re-rank bit-for-bit
      (`similarity.quantized_topk_oracle`), so the r8 flagship gets a
      cross-engine hash check, not only a pytest contract.
    - tier='hybrid' (r11): sparse+dense fusion — BM25 over each query
      doc's first-8-token text + exact cosine over its embedding,
      combined by reciprocal-rank fusion (`ranking.rrf_fuse`,
      Cormack et al. 2009; integer-only contributions) — fully
      oracle-checked: the DuckDB twin derives the same query text,
      replays both rankings, and fuses with the same integer
      arithmetic.

    Flags (constant per run, TRUE in the oracle):
    - lsh_recall_ok: per-query recall@5 >= 0.6 for EVERY query.
    - ivf_recall_ok: MEAN recall@5 >= 0.6 — per-query recall on the
      isotropic testdata is noisy (cell membership is near-random for
      the tail); the measured mean sits at ~0.83.
    - pq_recall_ok: the r9 IVF-PQ tier, flat-ADC mode (scan all code
      rows — ~8% of float bytes — then exact re-rank ×8): recall@5
      >= 0.9 against the exact rows. Flat ADC is the mode that holds
      recall on isotropic data, where NO cell-pruned tier can
      (tools/scalecheck.py --ann-recall measures the ceiling).
    - imi_recall_ok (r10): the inverted multi-index tier (product
      cells from two half-space quantizers, pairs probed in summed-
      distance order): mean recall@5 >= 0.6 at cells=8x8 / 24 pairs —
      measured 0.68-0.70 at both gate scales; scalecheck's imi rows
      carry the recall-vs-rows frontier (dominates flat IVF ~2x in
      rows at equal recall on the isotropic corpus).

    The exact tier is bounded (8 queries x k=5 = 40 rows/tier), so the
    frame is materialized eagerly and the persisted base released —
    no cached blocks leak across the gate run.
    """
    emb = table(spark, sf_dir, "embeddings")
    queries_df = emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    exact = S.brute_force_topk(emb, queries_df, k=5).persist()
    try:
        lsh = S.lsh_topk(emb, queries_df, k=5, query_id_col="query_id")
        ivf = S.ivf_topk(emb, queries_df, k=5, n_cells=16, n_probe=8)
        lsh_ok = bool(
            _ann_recall_frame(exact, lsh, min_recall=0.6)
            .agg(
                F.coalesce(F.expr("bool_and(recall_ok)"), F.lit(True)).alias(
                    "ok"
                )
            )
            .collect()[0]["ok"]
        )

        exact_rows = exact.collect()
        # recall flags from the collected (bounded, 40-row) sets —
        # driver-side set math, one Spark job per approximate tier
        # instead of three join/agg jobs each
        exact_pairs = {
            (r["query_id"], r["neighbor_id"]) for r in exact_rows
        }

        def _mean_recall_ok(approx_rows, num: int, den: int) -> bool:
            got = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
            return len(got & exact_pairs) * den >= len(exact_pairs) * num

        ivf_ok = _mean_recall_ok(ivf.collect(), 6, 10)
        pq_model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=256)
        pq = S.pq_topk(
            S.pq_index(emb, pq_model), queries_df, pq_model, emb,
            k=5, rerank_factor=8,
        )
        pq_ok = _mean_recall_ok(pq.collect(), 9, 10)
        imi_model = S.imi_fit(emb, n_cells=8)
        imi = S.imi_topk(
            S.imi_index(emb, imi_model), queries_df, imi_model, emb,
            k=5, n_probe_pairs=24,
        )
        imi_ok = _mean_recall_ok(imi.collect(), 6, 10)
        int8_rows = S.quantized_topk(
            emb, queries_df, k=5, rerank_factor=4
        ).collect()
        # tier='hybrid' (r11): sparse+dense fusion — the "find docs
        # like doc q" query. Each query doc's first 8 tokens are its
        # BM25 text query (derived identically on both engines), its
        # embedding is its dense query; the two top-20 lists fuse by
        # reciprocal-rank (rrf_fuse — pure integer arithmetic, so the
        # whole tier is float-free except inside the two input
        # rankings, each already hash-checked in its own entry). The
        # composition lives in _hybrid_search_frame (shared with the
        # bench, so the timed workload IS the gate-checked one).
        qmap = _hybrid_qmap(spark, sf_dir)
        fused = _hybrid_search_frame(spark, sf_dir)
        hybrid_rows = (
            fused.join(F.broadcast(qmap), fused["query"] == qmap["qtext"])
            .select(
                "qid",
                "doc_id",
                F.expr("rrf_e6 div 100").alias("score_e4"),
                "rank",
            )
            .collect()
        )
        rows = [
            (r["query_id"], r["neighbor_id"], r["score_e4"], r["rank"],
             tier, lsh_ok, ivf_ok, pq_ok, imi_ok)
            for tier, res in (("exact", exact_rows), ("int8", int8_rows))
            for r in res
        ] + [
            (r["qid"], r["doc_id"], r["score_e4"], r["rank"],
             "hybrid", lsh_ok, ivf_ok, pq_ok, imi_ok)
            for r in hybrid_rows
        ]
    finally:
        exact.unpersist()
    return spark.createDataFrame(
        rows,
        "query_id bigint, neighbor_id bigint, score_e4 bigint, rank int, "
        "tier string, lsh_recall_ok boolean, ivf_recall_ok boolean, "
        "pq_recall_ok boolean, imi_recall_ok boolean",
    )


_ANN_HYBRID_ORACLE = f"""
    WITH hq AS (
        SELECT doc_id AS qid,
               array_to_string(list_slice(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   1, 8), ' ') AS qtext
        FROM documents WHERE doc_id < 4
    ),
    hs AS (
        SELECT query, doc_id, rank
        FROM ({T.bm25_topk_oracle(
            k=20, queries_sql="SELECT qtext AS query FROM hq")})
    ),
    hd0 AS ({S.brute_force_topk_oracle(
        k=20, query_predicate="vec_id < 4")}),
    hd AS (
        SELECT hq.qtext AS query, hd0.neighbor_id AS doc_id, hd0.rank
        FROM hd0 JOIN hq ON hd0.query_id = hq.qid
    ),
    hu AS (
        SELECT query, doc_id, 1000000 // (60 + rank) AS c
        FROM (SELECT * FROM hs UNION ALL SELECT * FROM hd)
    ),
    hf AS (
        SELECT query, doc_id, SUM(c) AS rrf_e6
        FROM hu GROUP BY 1, 2
    ),
    hr AS (
        SELECT query, doc_id, rrf_e6,
               CAST(ROW_NUMBER() OVER (PARTITION BY query
                                       ORDER BY rrf_e6 DESC, doc_id)
                    AS INT) AS rank
        FROM hf
    )
    SELECT hq.qid AS query_id, hr.doc_id AS neighbor_id,
           CAST(hr.rrf_e6 // 100 AS BIGINT) AS score_e4, hr.rank
    FROM hr JOIN hq ON hr.query = hq.qtext
    WHERE hr.rank <= 10
"""


_ANN_TOPK_ORACLE = f"""
    SELECT query_id, neighbor_id, score_e4, rank, 'exact' AS tier,
           TRUE AS lsh_recall_ok, TRUE AS ivf_recall_ok,
           TRUE AS pq_recall_ok, TRUE AS imi_recall_ok
    FROM ({S.brute_force_topk_oracle(k=5, query_predicate="vec_id < 8")})
    UNION ALL
    SELECT query_id, neighbor_id, score_e4, rank, 'int8' AS tier,
           TRUE AS lsh_recall_ok, TRUE AS ivf_recall_ok,
           TRUE AS pq_recall_ok, TRUE AS imi_recall_ok
    FROM ({S.quantized_topk_oracle(k=5, rerank_factor=4)})
    UNION ALL
    SELECT query_id, neighbor_id, score_e4, rank, 'hybrid' AS tier,
           TRUE AS lsh_recall_ok, TRUE AS ivf_recall_ok,
           TRUE AS pq_recall_ok, TRUE AS imi_recall_ok
    FROM ({_ANN_HYBRID_ORACLE})
"""


def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three multimodal mapInPandas stages — metadata extraction,
    resize, frame sampling — joined per document into one hash-checked
    frame. The oracle covers every content-determined column (byte
    length, checksum, fake-resize digest, sampled frame count/max from
    the digest-derived frame count); fake decode dimensions are
    unit-tested (tests/test_llm_ops.py)."""
    docs = M.with_binary_payload(table(spark, sf_dir, "documents"))
    meta = M.extract_media_meta(docs).select(
        "doc_id", "payload_bytes", "checksum_sha256"
    )
    rez = M.resize_media(docs, 224, 224).select(
        "doc_id",
        F.lower(F.hex("payload")).alias("resized_hex"),
        "width",
        "height",
    )
    frames = M.sample_frames(docs, every_n=2).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.max("frame_idx").alias("max_frame_idx"),
    )
    # perceptual dHash (r13): text payloads are not PNGs, so the fake
    # tier's 60-bit digest fingerprint is what runs here — SQL-castable
    # by design, so even the stub tier stays hash-gated; the pixel
    # tiers are pytest-tier (exact replay in test_llm_ops)
    dh = M.dhash_media(docs)
    # video near-dup (r14), folded per-doc to stay inside the 50-entry
    # gate window: the full frame-fingerprint pairing runs (the fake
    # chain the oracle replays — see _q_video_neardup), then each
    # doc's pair participation is aggregated; duplicate-text docs get
    # nonzero counts, everyone else coalesces to 0. The pair-level
    # frame is the bench's `video_neardup` entry and pytest-tier.
    vp = _q_video_neardup(spark, sf_dir)
    vstats = (
        vp.select(
            F.col("doc_a").alias("doc_id"), "n_matching_frames",
            "min_hamming",
        )
        .unionByName(
            vp.select(
                F.col("doc_b").alias("doc_id"), "n_matching_frames",
                "min_hamming",
            )
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_video_matches"),
            F.sum("n_matching_frames").cast("int").alias(
                "video_matched_frames"
            ),
            F.min("min_hamming").cast("int").alias("video_min_hamming"),
        )
    )
    # audio near-dup (r14), folded per-doc the same way: the full
    # Haitsma–Kalker frame-fingerprint pairing runs (text payloads are
    # not WAVs, so the fake chain the oracle replays — see
    # _q_audio_neardup); the pair-level frame is the bench's
    # `audio_neardup` entry and the WAV tier is pytest-tier.
    ap = _q_audio_neardup(spark, sf_dir)
    astats = (
        ap.select(
            F.col("doc_a").alias("doc_id"), "n_matching_frames",
            "min_hamming",
        )
        .unionByName(
            ap.select(
                F.col("doc_b").alias("doc_id"), "n_matching_frames",
                "min_hamming",
            )
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_audio_matches"),
            F.sum("n_matching_frames").cast("int").alias(
                "audio_matched_frames"
            ),
            F.min("min_hamming").cast("int").alias("audio_min_hamming"),
        )
    )
    return (
        meta.join(rez, "doc_id").join(frames, "doc_id").join(dh, "doc_id")
        .join(vstats, "doc_id", "left")
        .join(astats, "doc_id", "left")
        .withColumn(
            "n_video_matches",
            F.coalesce(F.col("n_video_matches"), F.lit(0)),
        )
        .withColumn(
            "video_matched_frames",
            F.coalesce(F.col("video_matched_frames"), F.lit(0)),
        )
        .withColumn(
            "n_audio_matches",
            F.coalesce(F.col("n_audio_matches"), F.lit(0)),
        )
        .withColumn(
            "audio_matched_frames",
            F.coalesce(F.col("audio_matched_frames"), F.lit(0)),
        )
    )


def _q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup via frame fingerprints (r14): sample_frames →
    per-frame dHash → Hamming pigeonhole over FRAME fingerprints →
    per-video-pair aggregation (multimodal.video_neardup_pairs). Text
    payloads are not videos, so the deterministic fake chain runs here
    — n_frames from the payload digest, frame payload =
    SHA-256(payload ‖ frame_idx), frame hash = the 60-bit fake dhash —
    every step SQL-derivable, so the DuckDB twin replays the pairing
    bit-for-bit (duplicate-text documents share every sampled frame).
    The pixel tiers (real PNG frames, planted near-dup recall) are
    pytest-tier (tests/test_llm_ops.py)."""
    docs = M.with_binary_payload(
        table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    )
    return M.video_neardup_pairs(docs, every_n=2, max_distance=3)


# The fake chain, replayed in SQL: n_frames = 1 + digest[2] % 8 of
# SHA-256(payload) (hex digit 6 mod 8); sampled idxs = range(0,n,2);
# frame payload = the ASCII hex of SHA-256(payload ‖ ':frame:' ‖ idx);
# frame hash = first 15 hex chars of SHA-256(frame_payload ‖
# ':dhash64') — then the SAME 4×16-bit pigeonhole banding as
# dedup.hamming_pairs(bits=64, max_distance=3) and the per-video-pair
# aggregation.
_VIDEO_NEARDUP_ORACLE = """
    WITH nf AS (
        SELECT doc_id, text,
               1 + ((strpos('0123456789abcdef',
                            substr(sha256(text), 6, 1)) - 1) % 8)
                   AS n_frames
        FROM documents WHERE text IS NOT NULL
    ),
    fr AS (
        SELECT doc_id, text,
               CAST(unnest(range(0, n_frames, 2)) AS INT) AS fidx
        FROM nf
    ),
    fh AS (
        SELECT doc_id, fidx,
               ('0x' || substr(sha256(
                   sha256(text || ':frame:' || CAST(fidx AS VARCHAR))
                   || ':dhash64'), 1, 15))::BIGINT AS h
        FROM fr
    ),
    segs AS (
        SELECT doc_id, fidx, h, s, (h >> (s * 16)) & 65535 AS segval
        FROM fh, (SELECT unnest(range(4)) AS s)
    ),
    cand AS (
        SELECT DISTINCT
               x.doc_id AS va, x.fidx AS fa,
               y.doc_id AS vb, y.fidx AS fb,
               bit_count(xor(x.h, y.h)) AS hamming
        FROM segs x JOIN segs y
          ON x.s = y.s AND x.segval = y.segval
        WHERE (x.doc_id, x.fidx) < (y.doc_id, y.fidx)
    )
    SELECT LEAST(va, vb) AS doc_a,
           GREATEST(va, vb) AS doc_b,
           CAST(COUNT(*) AS INT) AS n_matching_frames,
           CAST(MIN(hamming) AS INT) AS min_hamming
    FROM cand
    WHERE va <> vb AND hamming <= 3
    GROUP BY 1, 2
"""


def _q_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup via Haitsma–Kalker frame fingerprints (r14):
    audio_fingerprint → Hamming pigeonhole over the 32-bit
    sub-fingerprints → per-clip-pair aggregation
    (multimodal.audio_neardup_pairs). Text payloads are not WAVs, so
    the deterministic fake chain runs here — frame count = 1 +
    digest[2] % 8 of SHA-256(payload), sub-fingerprint i = the first
    15 hex chars of SHA-256(payload ‖ ':aframe:' ‖ i) masked to 32
    bits — every step SQL-derivable, so the DuckDB twin replays the
    pairing bit-for-bit (duplicate-text documents share every frame).
    The WAV tier (real band-sign fingerprints, planted-recall,
    gain/stereo invariance) is pytest-tier (tests/test_llm_ops.py)."""
    docs = M.with_binary_payload(
        table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    )
    return M.audio_neardup_pairs(docs, max_distance=3)


# The fake chain, replayed in SQL: n_frames = 1 + digest[2] % 8 of
# SHA-256(payload) (hex digit 6 mod 8 — the same digest-derived count
# as the video tier); sub-fingerprint i = first 15 hex chars of
# SHA-256(payload ‖ ':aframe:' ‖ i) masked to the low 32 bits — then
# the SAME pigeonhole banding as dedup.hamming_pairs(bits=32,
# max_distance=3): 4 segments of 8 bits, and the per-clip-pair
# aggregation.
_AUDIO_NEARDUP_ORACLE = """
    WITH nf AS (
        SELECT doc_id, text,
               1 + ((strpos('0123456789abcdef',
                            substr(sha256(text), 6, 1)) - 1) % 8)
                   AS n_frames
        FROM documents WHERE text IS NOT NULL
    ),
    fr AS (
        SELECT doc_id, text,
               CAST(unnest(range(0, n_frames)) AS INT) AS fidx
        FROM nf
    ),
    fh AS (
        SELECT doc_id, fidx,
               ('0x' || substr(sha256(
                   text || ':aframe:' || CAST(fidx AS VARCHAR)),
                   1, 15))::BIGINT & 4294967295 AS h
        FROM fr
    ),
    segs AS (
        SELECT doc_id, fidx, h, s, (h >> (s * 8)) & 255 AS segval
        FROM fh, (SELECT unnest(range(4)) AS s)
    ),
    cand AS (
        SELECT DISTINCT
               x.doc_id AS va, x.fidx AS fa,
               y.doc_id AS vb, y.fidx AS fb,
               bit_count(xor(x.h, y.h)) AS hamming
        FROM segs x JOIN segs y
          ON x.s = y.s AND x.segval = y.segval
        WHERE (x.doc_id, x.fidx) < (y.doc_id, y.fidx)
    )
    SELECT LEAST(va, vb) AS doc_a,
           GREATEST(va, vb) AS doc_b,
           CAST(COUNT(*) AS INT) AS n_matching_frames,
           CAST(MIN(hamming) AS INT) AS min_hamming
    FROM cand
    WHERE va <> vb AND hamming <= 3
    GROUP BY 1, 2
"""


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.sessions import sessionize

    return sessionize(events_table(spark, sf_dir), gap_minutes=30)


def _q_approx_unique_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 at scale: HyperLogLog++ distinct counts — one pass, fixed
    sketch memory per group, no exact-distinct double shuffle.

    Sketch values are engine-specific, so the gate checks a falsifiable
    invariant instead: the HLL estimate must land within 5% of the
    exact count per group (rsd=0.02, so 5% is a comfortable but real
    bound — a broken sketch fails it). The exact count and group sizes
    are fully oracle-checked; the <2% typical error is also
    unit-tested (tests/test_approx.py)."""
    orders = table(spark, sf_dir, "orders")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    exact = F.countDistinct("o_custkey")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact.alias("exact_customers"),
            # no division: |approx-exact| <= 0.05*exact as integer math
            (
                F.abs(approx - exact) * F.lit(100) <= exact * F.lit(5)
            ).alias("within_bounds"),
        )
        .orderBy("o_orderpriority")
    )


_APPROX_UNIQUE_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS within_bounds
    FROM orders
    GROUP BY 1
    ORDER BY 1
"""


def _q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — the quality-filter
    statistics a training pipeline thresholds on. percentile() is the
    exact tier (full sort per group); percentile_approx (KLL sketch,
    one pass, bounded memory) is the drop-in at 100 TB."""
    from etl_workflow_spark.catalog import events_table

    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            # floor-e4 fixed point: both engines interpolate the same
            # sorted exact values, and FLOOR of the identical double
            # avoids the round(double, 4) half-way knife edge (floor is
            # floor on negatives in both engines, no sign guard needed)
            F.expr(
                "CAST(FLOOR(percentile(value, 0.5) * 10000) AS BIGINT)"
                " AS p50_e4"
            ),
            F.expr(
                "CAST(FLOOR(percentile(value, 0.95) * 10000) AS BIGINT)"
                " AS p95_e4"
            ),
            F.expr(
                "CAST(FLOOR(percentile(value, 0.99) * 10000) AS BIGINT)"
                " AS p99_e4"
            ),
        )
        .orderBy("event_type")
    )


_VALUE_PERCENTILES_ORACLE = """
    SELECT event_type,
           CAST(floor(quantile_cont(value, 0.5) * 10000) AS BIGINT) AS p50_e4,
           CAST(floor(quantile_cont(value, 0.95) * 10000) AS BIGINT) AS p95_e4,
           CAST(floor(quantile_cont(value, 0.99) * 10000) AS BIGINT) AS p99_e4
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency top-k: explode tokens -> two-phase count
    -> TakeOrderedAndProject. The shuffle carries one (term, partial
    count) row per distinct term per partition, never raw tokens."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    return (
        toks.where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(50)
    )


_TOP_TERMS_ORACLE = """
    SELECT term, COUNT(*) AS n
    FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    )
    WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term ASC
    LIMIT 50
"""


# Fake decode derives n_frames = 1 + digest[2] % 8 from the payload's
# SHA-256 (multimodal.py decode_media); frame sampling keeps every 2nd
# index. digest[2] % 8 is the low 3 bits of the third byte, i.e. hex
# digit 6 of the hex digest mod 8 — reproducible in SQL, so the "stub"
# plumbing stays hash-gated end to end.
_MULTIMODAL_ORACLE = f"""
    WITH m AS ({M.media_meta_oracle()}),
    r AS (
        SELECT doc_id, sha256(text || '224x224') AS resized_hex,
               224 AS width, 224 AS height
        FROM documents
    ),
    nf AS (
        SELECT doc_id,
               1 + ((strpos('0123456789abcdef', substr(sha256(text), 6, 1)) - 1)
                    % 8) AS n_frames
        FROM documents
    ),
    fr AS (
        SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
        FROM nf
    ),
    f AS (
        SELECT doc_id, COUNT(*) AS n_frames_sampled,
               CAST(MAX(frame_idx) AS INT) AS max_frame_idx
        FROM fr GROUP BY 1
    ),
    dh AS (
        SELECT doc_id,
               ('0x' || substr(sha256(text || ':dhash64'), 1, 15))::BIGINT
                   AS dhash
        FROM documents
    ),
    vpairs AS (SELECT * FROM ({_VIDEO_NEARDUP_ORACLE}) vq),
    vstats AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_video_matches,
               CAST(SUM(n_matching_frames) AS INT) AS video_matched_frames,
               CAST(MIN(min_hamming) AS INT) AS video_min_hamming
        FROM (
            SELECT doc_a AS doc_id, n_matching_frames, min_hamming
            FROM vpairs
            UNION ALL
            SELECT doc_b AS doc_id, n_matching_frames, min_hamming
            FROM vpairs
        ) GROUP BY 1
    ),
    apairs AS (SELECT * FROM ({_AUDIO_NEARDUP_ORACLE}) aq),
    astats AS (
        SELECT doc_id,
               CAST(COUNT(*) AS INT) AS n_audio_matches,
               CAST(SUM(n_matching_frames) AS INT) AS audio_matched_frames,
               CAST(MIN(min_hamming) AS INT) AS audio_min_hamming
        FROM (
            SELECT doc_a AS doc_id, n_matching_frames, min_hamming
            FROM apairs
            UNION ALL
            SELECT doc_b AS doc_id, n_matching_frames, min_hamming
            FROM apairs
        ) GROUP BY 1
    )
    SELECT m.*, r.resized_hex, r.width, r.height,
           f.n_frames_sampled, f.max_frame_idx, dh.dhash,
           COALESCE(v.n_video_matches, 0) AS n_video_matches,
           COALESCE(v.video_matched_frames, 0) AS video_matched_frames,
           v.video_min_hamming,
           COALESCE(a.n_audio_matches, 0) AS n_audio_matches,
           COALESCE(a.audio_matched_frames, 0) AS audio_matched_frames,
           a.audio_min_hamming
    FROM m JOIN r USING (doc_id) JOIN f USING (doc_id)
    JOIN dh USING (doc_id)
    LEFT JOIN vstats v USING (doc_id)
    LEFT JOIN astats a USING (doc_id)
"""


def _q_embedding_neardup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three embedding near-dup tiers in ONE hash-checked frame.

    The exact pair list (vec_a, vec_b, cosine) is fully oracle-checked
    per row. ``in_blocked`` asserts the blocked-matmul tier found the
    SAME pair (a full outer join, so a pair found only by the blocked
    tier surfaces as an extra row and fails the count/hash — blocked
    is exact-equivalent by construction, just vectorized).
    ``lsh_recall_ok`` is the sketch-tier contract: >= 60% of blocked
    pairs recovered (S-curve expectation ~0.79 at cosine 0.45 with
    r=4 x 8 bands), computed eagerly so nothing persists across the
    gate run."""
    emb = table(spark, sf_dir, "embeddings")
    blocked = S.embedding_neardup_blocked(emb, threshold=0.45)
    found = S.embedding_neardup_lsh(emb, threshold=0.45)
    j = blocked.select("vec_a", "vec_b").join(
        found.select("vec_a", "vec_b").withColumn("hit", F.lit(1)),
        ["vec_a", "vec_b"],
        "left",
    )
    n = F.count(F.lit(1))
    hits = F.coalesce(F.sum("hit"), F.lit(0))
    lsh_ok = bool(
        j.agg((hits * F.lit(10) >= n * F.lit(6)).alias("ok")).collect()[0]["ok"]
    )
    exact = S.embedding_neardup_exact(emb, threshold=0.45)
    pairs = exact.join(
        blocked.select("vec_a", "vec_b").withColumn("hitb", F.lit(1)),
        ["vec_a", "vec_b"],
        "full",
    )
    return pairs.select(
        "vec_a",
        "vec_b",
        "cosine_e4",
        F.col("hitb").isNotNull().alias("in_blocked"),
        F.lit(lsh_ok).alias("lsh_recall_ok"),
    )


_EMBEDDING_NEARDUP_ORACLE = f"""
    SELECT vec_a, vec_b, cosine_e4,
           TRUE AS in_blocked, TRUE AS lsh_recall_ok
    FROM ({S.embedding_neardup_exact_oracle(threshold=0.45)})
"""


def _q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly windowed aggregation + per-group JSON-prop extraction:
    ``sum_prop_k`` sums a field pulled out of the JSON ``props`` column
    (exact integer sum), so both the window agg and the JSON path
    operator feed the hash."""
    from etl_workflow_spark.catalog import events_table

    ev = events_table(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(25,10)")).cast("double").alias("total_value"),
            F.sum(
                F.get_json_object(F.col("props"), "$.k").cast("int")
            ).alias("sum_prop_k"),
        )
        .orderBy("hour", "event_type")
    )


_EVENTS_WINDOWED_ORACLE = """
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_prop_k
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


from etl_workflow_spark.operators.sessions import sessionize_oracle as _sess_oracle

_SESSIONIZE_ORACLE = _sess_oracle(gap_minutes=30)


def _q_incremental_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10/J2: one day's slice of the daily rollup, computed
    incrementally (date filter pushed to the orders scan, items
    semi-joined down before any aggregation)."""
    from etl_workflow_spark.streaming.incremental import incremental_daily_slice

    items = table(spark, sf_dir, "lineitem").withColumn("item_total", Q.item_total())
    df = incremental_daily_slice(
        items,
        table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey"),
        as_of="1995-06-19",
        order_key="l_orderkey",
        product_key="l_partkey",
        order_date="o_orderdate",
        category_key="p_brand",
        quantity="l_quantity",
        total="item_total",
    )
    return df.select(
        F.col("date"),
        F.col("l_partkey").alias("product_id"),
        F.col("p_brand").alias("category_name"),
        F.col("units_sold").cast("double").alias("units_sold"),
        F.col("revenue").cast("double").alias("revenue"),
        F.col("order_count"),
        F.col("avg_unit_price"),
    )


_INCREMENTAL_SLICE_ORACLE = f"""
    SELECT * FROM ({_DAILY_SALES_ORACLE})
    WHERE date = DATE '1995-06-19'
"""


_ITEM_TOTAL_SQL = """CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
    * CAST(l.l_quantity AS DECIMAL(18,2))
    - CAST(l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))"""


_SQL_REVENUE_BY_PRIORITY = """
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
"""


def _q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-level aggregation, oracle-checked: the salt only
    reshapes the shuffle — decomposable aggregates over exact types
    (count/min/max, decimal sum) are salt-independent, so the plain
    GROUP BY oracle must match bit-for-bit."""
    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.skew import salted_aggregate

    ev = events_table(spark, sf_dir).withColumn(
        "v", F.col("value").cast("decimal(25,10)")
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "event_id"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
            "total_value": ("sum", "v"),
        },
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


_SKEW_SALTED_AGG_ORACLE = """
    SELECT event_type,
           COUNT(event_id) AS n_events,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
"""


def _q_qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation with engine-exact accumulation: both moments
    are integer sums (quantity, price in cents; squares as
    DECIMAL(38,0) — cents² overflows a long) so the only float math is
    the final closed-form ratio, identical IEEE ops on both engines.
    A direct ``corr()`` accumulates doubles in partition order and
    never reproduces across engines or runs."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    # floor-e6 fixed point (see percentiles entry): floor of the same
    # closed-form double is engine-identical, round(double, 6) is not
    return s.select(
        F.col("n"),
        F.floor(corr * F.lit(1000000)).alias("corr_qty_price_e6"),
    )


_QTY_PRICE_CORR_ORACLE = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
               SUM(CAST(y * y AS DECIMAL(38,0))) AS syy,
               SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
        FROM (
            SELECT CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        )
    )
    SELECT n,
           CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                      * 1000000) AS BIGINT)
               AS corr_qty_price_e6
    FROM s
"""


def _q_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE segmentation: customers bucketed into revenue quartiles
    (deterministic total order via the custkey tiebreak).

    Rides ``operators.ranking.distributed_ntile`` — range-partition +
    per-partition offsets — instead of ``Window.orderBy`` with no
    partition, which collapses the whole table into ONE task (Spark's
    own WindowExec warning). Same NTILE values, distributed cost.
    """
    from etl_workflow_spark.operators.ranking import distributed_ntile

    lv = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ltv"))
    )
    ranked = distributed_ntile(
        lv, [F.desc("ltv"), F.asc("o_custkey")], 4, out_col="quartile"
    )
    return ranked.select(
        F.col("o_custkey"),
        F.col("ltv").cast("double").alias("ltv"),
        F.col("quartile").cast("int").alias("quartile"),
    )


_CUSTOMER_QUARTILES_ORACLE = """
    WITH lv AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ltv
        FROM orders GROUP BY 1
    )
    SELECT o_custkey, CAST(ltv AS DOUBLE) AS ltv,
           CAST(NTILE(4) OVER (ORDER BY ltv DESC, o_custkey) AS INT)
               AS quartile
    FROM lv
"""


def _q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL surface: register the catalog as temp views and run
    the query through ``spark.sql`` — same Catalyst plan as the
    DataFrame API, and the oracle is the IDENTICAL SQL text."""
    from etl_workflow_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_SQL_REVENUE_BY_PRIORITY)


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderstatus", False),
    ("o_orderpriority", False),
]


def _q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the Deequ capability): nulls, exact distincts,
    numeric ranges — one aggregation over one scan."""
    from etl_workflow_spark.operators.quality import profile_table

    return profile_table(
        table(spark, sf_dir, "orders"), cols=[c for c, _ in _PROFILE_COLS]
    )


def _q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated data-quality gate entry (three operators, one frame):

    1. Warehouse invariants as machine-checkable violation counts — PK
       uniqueness, FK containment, key non-nullness — as
       ``(check_name, 0, '', n_violations)`` rows.
    2. The lapsed-customer anti-join (B9's complement: NOT EXISTS with
       a pushed date predicate — formerly its own entry), row-level
       hash-checked as ``('lapsed_customer', c_custkey, c_name,
       c_nationkey)`` rows.
    3. The fixed-width order-value histogram (formerly its own entry —
       consolidated to free a gate slot): per-bucket order counts as
       ``('hist_orders', bucket, '', n)`` and per-bucket value sums in
       exact integer CENTS as ``('hist_value_cents', bucket, '', n)``
       — the decimal(18,2) sum × 100 is integral, so the packing into
       the shared ``long n`` loses nothing.

    Packing: (check_name, entity_id, detail, n) — the anti-join's name
    rides in ``detail`` and its nationkey in ``n`` so all three
    operators share one hashable schema.
    """
    from etl_workflow_spark.operators.quality import (
        expect_non_null,
        expect_subset,
        expect_unique,
        run_checks,
    )

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")
    checks = run_checks(
        expect_unique(orders, ["o_orderkey"], "orders_pk_unique"),
        expect_subset(
            lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_fk_orders"
        ),
        expect_subset(
            orders, "o_custkey", customer, "c_custkey", "orders_fk_customer"
        ),
        expect_non_null(lineitem, "l_partkey", "lineitem_partkey_not_null"),
    ).select(
        "check_name",
        F.lit(0).cast("long").alias("entity_id"),
        F.lit("").alias("detail"),
        F.col("n_violations").cast("long").alias("n"),
    )
    # orders side filtered at the scan and projected to the key before
    # the anti-join (8 bytes/row shuffle; AQE broadcasts the small side)
    recent = (
        orders
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    lapsed = customer.join(recent, on="c_custkey", how="left_anti").select(
        F.lit("lapsed_customer").alias("check_name"),
        F.col("c_custkey").cast("long").alias("entity_id"),
        F.col("c_name").alias("detail"),
        F.col("c_nationkey").cast("long").alias("n"),
    )
    # one agg shuffle on the bucket id (20 groups); partial aggregation
    # does the real work map-side. Bucket = floor(v / width) clamped to
    # the last bucket; identical integer arithmetic on both engines.
    width, nbuckets = 25_000.0, 20
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(width)).cast("int"),
        F.lit(nbuckets - 1),
    )
    hist = (
        orders.select(
            bucket.cast("long").alias("bucket"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("v") * 100).cast("long").alias("cents"),
        )
    )
    hist_n = hist.select(
        F.lit("hist_orders").alias("check_name"),
        F.col("bucket").alias("entity_id"),
        F.lit("").alias("detail"),
        F.col("n_orders").cast("long").alias("n"),
    )
    hist_v = hist.select(
        F.lit("hist_value_cents").alias("check_name"),
        F.col("bucket").alias("entity_id"),
        F.lit("").alias("detail"),
        F.col("cents").alias("n"),
    )
    return checks.unionByName(lapsed).unionByName(hist_n).unionByName(hist_v)


_PROFILE_ORDERS_ORACLE = QL.profile_table_oracle("orders", _PROFILE_COLS)
_CONSTRAINT_CHECKS_ORACLE = """
    SELECT 'orders_pk_unique' AS check_name,
           CAST(0 AS BIGINT) AS entity_id, '' AS detail,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders', 0, '',
           (SELECT COUNT(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_fk_customer', 0, '',
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_partkey_not_null', 0, '',
           (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL)
    UNION ALL
    SELECT 'lapsed_customer', c_custkey, c_name, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
    UNION ALL
    SELECT 'hist_orders',
           CAST(LEAST(CAST(FLOOR(o_totalprice / 25000.0) AS INT), 19)
                AS BIGINT),
           '', COUNT(*)
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'hist_value_cents',
           CAST(LEAST(CAST(FLOOR(o_totalprice / 25000.0) AS INT), 19)
                AS BIGINT),
           '',
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
    FROM orders GROUP BY 2
"""


def _q_txn_mutations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated transactional-table gate entry — the txn mutation
    surface (``sources/txn.py``; reference analog: Postgres
    transactional DML, database-schema.sql:202-231) cross-engine
    hash-checked END TO END rather than only via pytest:

    1. ``txn_create`` (partitioned on status, key stats recorded),
    2. ``txn_append(keys=...)`` — INSERT-if-absent: one overlapping
       residue class is dropped by the stats-pruned anti-join,
    3. ``txn_merge_into(evolve_schema=True)`` — UPDATE + INSERT + ADD
       COLUMN in one commit (price doubled, ``flag`` added),
    4. ``txn_delete`` — predicate delete via the replace_where path,

    then the FINAL SNAPSHOT is read back through the manifest log and
    compared against a DuckDB oracle computing the same final state
    relationally. Every mutation routes through version-manifest
    commits on a throwaway table under ``tempfile``; the sf_dir
    parquet is only ever read.
    """
    import shutil
    import tempfile

    from etl_workflow_spark.sources import txn as T

    path = tempfile.mkdtemp(prefix="txn_gate_") + "/t"
    uni = table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") <= 4200
    ).select(
        F.col("o_orderkey").cast("long").alias("id"),
        F.col("o_custkey").cast("long").alias("cust"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    # create: residue classes 0-4 of the id<=4000 slice
    T.txn_create(
        spark,
        path,
        uni.where((F.col("id") <= 4000) & (F.col("id") % 7 < 5)),
        partition_col="status",
        stats_cols=["id"],
    )
    # keyed append: classes 4-6 — class 4 already exists and must be
    # dropped by the (stats-pruned, null-safe) conflict anti-join
    T.txn_append(
        spark,
        path,
        uni.where((F.col("id") <= 4000) & (F.col("id") % 7 >= 4)),
        keys=["id"],
    )
    # evolving merge: ids ≡ 0 (mod 10) get price×2 and a new `flag`
    # column; ids in (4000, 4200] are fresh inserts
    T.txn_merge_into(
        spark,
        path,
        uni.where(F.col("id") % 10 == 0).select(
            "id",
            "cust",
            (F.col("price") * 2).cast("decimal(18,2)").alias("price"),
            "status",
            F.lit(1).cast("long").alias("flag"),
        ),
        ["id"],
        evolve_schema=True,
    )
    # predicate delete (NULL-evaluating rows kept — none here)
    T.txn_delete(spark, path, F.col("price") > 400000)
    snap = T.txn_read(spark, path).select(
        "id", "cust",
        F.col("price").cast("double").alias("price"),
        "status", "flag",
    )
    # the returned frame must outlive the throwaway table: pin the
    # final projection in executor storage, THEN remove the temp root
    # — without this every gate/bench invocation accreted a full
    # table copy (all versions) under /tmp for the life of the host
    snap = snap.localCheckpoint(eager=True)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return snap


_TXN_MUTATIONS_ORACLE = """
    WITH uni AS (
        SELECT CAST(o_orderkey AS BIGINT) AS id,
               CAST(o_custkey AS BIGINT) AS cust,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               o_orderstatus AS status
        FROM orders WHERE o_orderkey <= 4200
    ),
    tbl AS (   -- create (classes 0-4) + keyed append (5,6; 4 dropped)
        SELECT id, cust, price, status FROM uni WHERE id <= 4000
    ),
    msrc AS (  -- evolving merge source
        SELECT id, cust, CAST(price * 2 AS DECIMAL(18,2)) AS price,
               status, CAST(1 AS BIGINT) AS flag
        FROM uni WHERE id % 10 = 0
    ),
    merged AS (
        SELECT t.id, t.cust, t.price, t.status,
               CAST(NULL AS BIGINT) AS flag
        FROM tbl t WHERE t.id NOT IN (SELECT id FROM msrc)
        UNION ALL
        SELECT id, cust, price, status, flag FROM msrc
    )
    SELECT id, cust, CAST(price AS DOUBLE) AS price, status, flag
    FROM merged WHERE NOT (price > 400000)
"""


def _q_top_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 generalized: top-3 products per brand by revenue via a ranked
    window — one agg shuffle + one window sort; the dim side broadcast."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem").withColumn("rev", Q.item_total())
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    agg = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev"), F.col("l_partkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            "p_brand",
            F.col("l_partkey").alias("product_id"),
            F.col("rev").cast("double").alias("revenue"),
            "rank",
        )
    )


_TOP_PER_BRAND_ORACLE = f"""
    WITH agg AS (
        SELECT p.p_brand, l.l_partkey AS product_id,
               SUM({_ITEM_TOTAL_SQL}) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p_brand, product_id, rev,
               CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                       ORDER BY rev DESC, product_id) AS INT)
                   AS rank
        FROM agg
    )
    SELECT p_brand, product_id, CAST(rev AS DOUBLE) AS revenue, rank
    FROM ranked WHERE rank <= 3
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity profile: event-type counts pivoted to
    columns plus decimal-exact purchase value (conditional aggregation
    — the same plan Spark's pivot-with-explicit-values produces, with
    zero-filled counts instead of nulls)."""
    from etl_workflow_spark.catalog import events_table

    ev = events_table(spark, sf_dir)
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(
        *aggs,
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).cast(
                "decimal(25,10)"
            )
        )
        .cast("double")
        .alias("purchase_value"),
    )


_EVENTS_PIVOT_ORACLE = f"""
    SELECT user_id,
           {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
                      for t in _EVENT_TYPES)},
           CAST(SUM(CAST(value AS DECIMAL(25,10)))
                FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS purchase_value
    FROM events GROUP BY user_id
"""


def _q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (brand, year): per-cell, per-brand and grand totals in one
    pass — partial aggregation handles all grouping sets in the same
    shuffle instead of three separate jobs."""
    li = table(spark, sf_dir, "lineitem").withColumn("rev", Q.item_total())
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .withColumn("order_year", F.year("o_orderdate").cast("int"))
    )
    return df.rollup("p_brand", "order_year").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_REVENUE_ROLLUP_ORACLE = f"""
    SELECT p.p_brand, CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM({_ITEM_TOTAL_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY ROLLUP (p_brand, order_year)
"""


_CHUNK_DOCUMENTS_ORACLE = CH.chunk_documents_oracle(chunk_tokens=32)


def _q_pack_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing checked by falsifiable invariants (the pack ids
    themselves depend on the shard hash, so the oracle verifies the
    contract: conservation, budget, and fill floor)."""
    chunks = CH.chunk_documents(table(spark, sf_dir, "documents"), chunk_tokens=32)
    packed = CH.pack_sequences(chunks, budget_tokens=256, num_shards=16)
    fills = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill"))
    return fills.agg(
        F.sum("fill").cast("long").alias("total_tokens"),
        (F.max("fill") <= F.lit(256)).alias("packs_within_budget"),
        (F.avg("fill") >= F.lit(128.0)).alias("fill_floor_ok"),
    )


def _q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase event joined as-of to the
    user's most recent click at-or-before it (union+window as-of join —
    one sort shuffle, no range explosion)."""
    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.temporal import asof_join

    ev = events_table(spark, sf_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts", "click_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "click_id",
        "click_ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))).alias(
            "micros_since_click"
        ),
    )


_ASOF_ATTRIBUTION_ORACLE = """
    WITH c AS (
        SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
           epoch_us(p.ts) - epoch_us(c.click_ts) AS micros_since_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
"""


def _q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless points-in-intervals: events from ANY user counted inside
    the 50 busiest session windows (time-binned equi-join, not the
    BroadcastNestedLoop Spark would plan for a bare range predicate)."""
    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.sessions import sessionize
    from etl_workflow_spark.operators.temporal import interval_join

    ev = events_table(spark, sf_dir)
    sess = sessionize(ev, gap_minutes=30)
    top = (
        sess.orderBy(F.desc("n_events"), "user_id", "session_start")
        .limit(50)
        .select(
            F.col("user_id").alias("window_user"), "session_start", "session_end"
        )
    )
    joined = interval_join(
        ev.select("event_id", "ts"), top, "ts", "session_start", "session_end",
        bin_seconds=900,
    )
    return joined.groupBy("window_user", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_events_in_window")
    )


_INTERVAL_JOIN_ORACLE = f"""
    WITH sessions AS ({_sess_oracle(gap_minutes=30)}),
    top AS (
        SELECT user_id AS window_user, session_start, session_end
        FROM sessions
        ORDER BY n_events DESC, user_id, session_start LIMIT 50
    )
    SELECT t.window_user, t.session_start, t.session_end,
           COUNT(*) AS n_events_in_window
    FROM top t JOIN events e ON e.ts BETWEEN t.session_start AND t.session_end
    GROUP BY 1, 2, 3
"""


def _q_revenue_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day deltas via lag(): the change and percent change of
    daily revenue — one sort shuffle, O(1) window state.

    ``pct_change_e4`` is BIGINT fixed-point (percent in 1e-4 units) via
    integer cents arithmetic: delta can be negative, so the division is
    sign-guarded trunc — identical in Spark (DIV truncates) and the
    DuckDB oracle (// floors; the CASE normalizes both to trunc). The
    old ``round(double, 4)`` pct hash-failed on a .00005 knife edge.
    """
    from pyspark.sql.window import Window

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("date"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    )
    w = Window.orderBy("date")
    prev = F.lag("revenue").over(w)
    stage = daily.select(
        "date",
        "revenue",
        (F.col("revenue") - prev).alias("delta"),
        # cents are integral for scale-2 decimals -> exact long cast
        ((F.col("revenue") - prev) * 100).cast("long").alias("_delta_c"),
        (prev * 100).cast("long").alias("_prev_c"),
    )
    return stage.withColumn(
        "pct_change_e4",
        F.expr(
            "CAST(CASE WHEN _delta_c < 0 "
            "THEN -((-_delta_c * 1000000) DIV _prev_c) "
            "ELSE (_delta_c * 1000000) DIV _prev_c END AS BIGINT)"
        ),
    ).drop("_delta_c", "_prev_c")


_REVENUE_DOD_ORACLE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS date,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM orders GROUP BY 1
    ),
    staged AS (
        SELECT date, revenue,
               revenue - lag(revenue) OVER (ORDER BY date) AS delta,
               CAST((revenue - lag(revenue) OVER (ORDER BY date)) * 100
                    AS BIGINT) AS delta_c,
               CAST(lag(revenue) OVER (ORDER BY date) * 100 AS BIGINT)
                   AS prev_c
        FROM daily
    )
    SELECT date, revenue, delta,
           CAST(CASE WHEN delta_c < 0
                THEN -((-delta_c * 1000000) // prev_c)
                ELSE (delta_c * 1000000) // prev_c END AS BIGINT)
               AS pct_change_e4
    FROM staged
"""


def _q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-windowed trailing 7-day revenue + running cumulative
    over the daily order rollup (RANGE frame on days, so calendar gaps
    shrink the window instead of stretching it)."""
    from etl_workflow_spark.operators.temporal import rolling_daily

    daily = (
        table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("date"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")
        )
    )
    return rolling_daily(daily, "date", "revenue", days=7)


_ROLLING_REVENUE_ORACLE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS date,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM orders GROUP BY 1
    ),
    staged AS (
        SELECT date, revenue,
               SUM(revenue) OVER w7 AS revenue_7d_sum,
               CAST(SUM(revenue) OVER w7 * 10000 AS BIGINT) AS sum_e4,
               COUNT(revenue) OVER w7 AS cnt,
               SUM(revenue) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING)
                   AS revenue_cumulative
        FROM daily
        WINDOW w7 AS (ORDER BY date
                      RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    )
    SELECT date, revenue, revenue_7d_sum,
           CAST(CASE WHEN sum_e4 < 0 THEN -((-sum_e4) // cnt)
                ELSE sum_e4 // cnt END AS BIGINT) AS revenue_7d_avg_e4,
           revenue_cumulative
    FROM staged
"""


def _q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRIMARY entry point end to end
    (``workflow.py:355-361``): raw CSVs → extract → clean/transform →
    idempotent load → daily aggregation → warehouse, then a query over
    the landed warehouse table.

    Testdata parquet is first re-shaped into the reference's CSV layout
    (deterministic column mapping: part→products + brand-derived
    categories, orders→orders, lineitem→order_items), written as real
    CSVs, and run through ``run_pipeline``. The gate then reads
    ``daily_sales_aggregation`` back FROM THE WAREHOUSE FILES — so CSV
    parsing, schema application, null-cleaning, total recomputation
    (quirk Q6), both enrichment joins, the rollup, and the partitioned
    write are all inside the hash-checked path.
    """
    import tempfile

    from pyspark.sql.window import Window

    from etl_workflow_spark.pipeline import run_pipeline

    part = table(spark, sf_dir, "part")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    customer = table(spark, sf_dir, "customer")

    # category ids: alphabetical dense index over distinct brands —
    # reproducible in SQL (25 rows; the window is driver-trivial)
    cat = (
        part.select("p_brand")
        .distinct()
        .withColumn(
            "category_id", F.row_number().over(Window.orderBy("p_brand")).cast("int")
        )
    )
    categories = cat.select(
        "category_id",
        F.col("p_brand").alias("name"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("int").alias("parent_id"),
        F.lit(None).cast("timestamp").alias("created_at"),
    )
    products = (
        part.join(F.broadcast(cat), "p_brand")
        .select(
            F.col("p_partkey").cast("int").alias("product_id"),
            F.col("p_name").alias("name"),
            F.lit(None).cast("string").alias("description"),
            F.col("p_retailprice").cast("decimal(10,2)").alias("price"),
            F.lit(None).cast("decimal(10,2)").alias("cost"),
            F.col("category_id"),
            F.col("p_partkey").cast("string").alias("sku"),
            F.lit(None).cast("int").alias("inventory_count"),
            F.lit(None).cast("decimal(8,2)").alias("weight"),
            F.lit(None).cast("timestamp").alias("created_at"),
            F.lit(True).alias("is_active"),
        )
    )
    customers = customer.select(
        F.col("c_custkey").cast("int").alias("customer_id"),
        F.concat(F.lit("c"), F.col("c_custkey"), F.lit("@example.com")).alias("email"),
        F.col("c_name").alias("first_name"),
        F.lit("x").alias("last_name"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "street_address", "city", "state", "zip_code", "country", "phone",
            )
        ],
        F.lit(None).cast("timestamp").alias("registration_date"),
        F.lit(None).cast("timestamp").alias("last_login"),
    )
    orders_csv = orders.select(
        F.col("o_orderkey").cast("int").alias("order_id"),
        F.col("o_custkey").cast("int").alias("customer_id"),
        F.col("o_orderdate").cast("timestamp").alias("order_date"),
        F.col("o_orderstatus").alias("status"),
        F.lit(None).cast("string").alias("payment_method"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "shipping_address", "shipping_city", "shipping_state",
                "shipping_zip", "shipping_country",
            )
        ],
        *[
            F.lit(None).cast("timestamp").alias(c)
            for c in ("processing_date", "shipping_date", "delivery_date")
        ],
        F.col("o_totalprice").cast("decimal(12,2)").alias("total_amount"),
    )
    items_csv = lineitem.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("int")
        .alias("order_item_id"),
        F.col("l_orderkey").cast("int").alias("order_id"),
        F.col("l_partkey").cast("int").alias("product_id"),
        F.col("l_quantity").cast("int").alias("quantity"),
        F.col("l_extendedprice").cast("decimal(10,2)").alias("price"),
        F.col("l_discount").cast("decimal(10,2)").alias("discount"),
        F.lit(None).cast("decimal(10,2)").alias("total"),  # recomputed (Q6)
    )

    workdir = tempfile.mkdtemp(prefix="pipeline_e2e_")
    raw = f"{workdir}/raw"
    warehouse = f"{workdir}/warehouse"
    from etl_workflow_spark.sources.writers import write_csv

    for name, df in (
        ("product_categories", categories),
        ("products", products),
        ("customers", customers),
        ("orders", orders_csv),
        ("order_items", items_csv),
    ):
        write_csv(df, f"{raw}/{name}.csv")

    run_pipeline(spark, raw, warehouse)

    daily = spark.read.parquet(f"{warehouse}/daily_sales_aggregation")
    return daily.select(
        "date",
        "product_id",
        "category_id",
        F.col("units_sold").cast("double").alias("units_sold"),
        F.col("revenue").cast("double").alias("revenue"),
        "order_count",
        F.col("avg_unit_price").cast("double").alias("avg_unit_price"),
    )


_PIPELINE_E2E_ORACLE = """
    WITH cat AS (
        SELECT p_brand,
               CAST(row_number() OVER (ORDER BY p_brand) AS INT) AS category_id
        FROM (SELECT DISTINCT p_brand FROM part)
    ),
    prod AS (
        SELECT CAST(p.p_partkey AS INT) AS product_id, c.category_id
        FROM part p JOIN cat c USING (p_brand)
    ),
    items AS (
        SELECT CAST(l_orderkey AS INT) AS order_id,
               CAST(l_partkey AS INT) AS product_id,
               CAST(l_quantity AS INT) AS quantity,
               CAST(CAST(CAST(l_extendedprice AS DECIMAL(10,2)) AS DECIMAL(18,2))
                    * CAST(CAST(l_quantity AS INT) AS DECIMAL(18,2))
                    - CAST(CAST(l_discount AS DECIMAL(10,2)) AS DECIMAL(18,2))
                    AS DECIMAL(18,2)) AS total
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
          AND l_linenumber IS NOT NULL
    ),
    o AS (SELECT CAST(o_orderkey AS INT) AS order_id, o_orderdate FROM orders)
    SELECT CAST(o.o_orderdate AS DATE) AS date,
           i.product_id,
           p.category_id,
           CAST(SUM(CAST(i.quantity AS DECIMAL(18,2))) AS DOUBLE) AS units_sold,
           CAST(SUM(i.total) AS DOUBLE) AS revenue,
           COUNT(DISTINCT i.order_id) AS order_count,
           COALESCE(CAST(SUM(i.total) AS DOUBLE)
                    / CAST(SUM(CAST(i.quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0)
               AS avg_unit_price
    FROM items i
    LEFT JOIN o o ON i.order_id = o.order_id
    LEFT JOIN prod p ON i.product_id = p.product_id
    GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Consolidated gate entries — the driver's correctness harness checks
# only the first ~50 queries() entries, so related operators share one
# hash-checked frame (join on the common key / union with a tag column):
# every underlying operator keeps its full row-level oracle check, and
# the whole dict fits inside the verified window.
# --------------------------------------------------------------------------


def _q_sales_trends_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/G6 at every granularity: the three date_trunc buckets
    (month/week/day) union-tagged into one frame — same three plans,
    one gate entry."""
    out = None
    for grain in ("month", "week", "day"):
        cur = Q.sales_trends(spark, sf_dir, interval=grain).withColumn(
            "grain", F.lit(grain)
        )
        out = cur if out is None else out.unionByName(cur)
    return out


_SALES_TRENDS_ALL_ORACLE = " UNION ALL ".join(
    f"SELECT '{g}' AS grain, * FROM ({Q.sales_trends_oracle(interval=g)})"
    for g in ("month", "week", "day")
)


def _q_top_selling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/E3 top-selling-by-category, undated and date-bounded variants
    union-tagged (B5 date BETWEEN covered by the dated leg)."""
    base = Q.top_selling_by_category(spark, sf_dir).withColumn(
        "variant", F.lit("all")
    )
    dated = Q.top_selling_by_category(
        spark, sf_dir, start_date="1994-01-01", end_date="1996-12-31"
    ).withColumn("variant", F.lit("dated"))
    return base.unionByName(dated)


_TOP_SELLING_ORACLE = f"""
    SELECT 'all' AS variant, * FROM ({Q.top_selling_by_category_oracle()})
    UNION ALL
    SELECT 'dated' AS variant, * FROM ({Q.top_selling_by_category_oracle(
        start_date="1994-01-01", end_date="1996-12-31")})
"""


#: Crafted probe documents for the page-filter gate: the synthetic
#: corpus is single-line stop-word-poor text, so EVERY testdata doc
#: fails Gopher and C4 — these exercise the pass paths (a clean
#: multi-line prose page), the bullet/ellipsis line rules, and the
#: lorem-ipsum page drop, identically on both engines. No apostrophes
#: (SQL literal escaping stays trivial); ids far above the corpus.
_QUALITY_PROBE_DOCS = [
    (9_000_001, [
        "The old system and the new system have to work with the data.",
        "We keep the fast path and the slow path of the plan in sync.",
        "Each stage of the scan must have a sort that holds the order.",
        "The rows that we keep have to be part of the final output.",
        "That rule is the core of the design and we test it with care.",
    ]),
    (9_000_002, [
        "- first bullet item in the list",
        "- second bullet item in the list",
        "the line that trails off without an ending...",
    ]),
    (9_000_003, [
        "This page looks like prose but it is lorem ipsum filler.",
        "The body repeats the lorem ipsum block with the same text.",
        "The filter must drop the page and keep the counts intact.",
    ]),
    (9_000_004, ["Tiny doc."]),
]


def _quality_probe_frame(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in _QUALITY_PROBE_DOCS],
        "doc_id long, text string",
    )


_QUALITY_PROBE_SQL = (
    "(SELECT doc_id, text FROM documents UNION ALL SELECT * FROM "
    "(VALUES "
    + ", ".join(
        f"({i}, " + " || chr(10) || ".join(
            "'" + ln + "'" for ln in lines
        ) + ")"
        for i, lines in _QUALITY_PROBE_DOCS
    )
    + ") v(doc_id, text))"
)


def _q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_count + text_quality + the published page filters (r12:
    Gopher rules and the C4 line filter, every ratio fixed-point and
    the rebuilt kept_text hash-checked) joined per document — all
    shuffle-free projections joined on the id they were derived from.
    The corpus is augmented with the crafted probe pages so both
    verdict polarities hash-check."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).unionByName(_quality_probe_frame(spark))
    return (
        T.token_count(docs)
        .join(T.text_quality(docs), "doc_id")
        .join(
            T.gopher_quality_flags(docs).withColumnRenamed(
                "n_words", "g_n_words"
            ),
            "doc_id",
        )
        .join(T.c4_line_filter(docs), "doc_id")
        # r12: the bigram-LM perplexity filter, self-fit on the same
        # augmented corpus — every pair contribution e9-floored before
        # the integer sum, so all three columns hash-check
        .join(T.lm_score(docs), "doc_id")
        # r13: the stupid-backoff trigram tier, same fixed-point
        # convention one order up (columns disambiguated from the
        # bigram model's)
        .join(
            T.lm_score_backoff(docs)
            .withColumnRenamed("logprob_e9_sum", "bo_logprob_e9_sum")
            .withColumnRenamed("avg_nll_e6", "bo_avg_nll_e6"),
            "doc_id",
        )
        # r13: interpolated Kneser-Ney, the third smoothing regime —
        # continuation counts derived from the same bigram table
        .join(
            T.lm_score_kn(docs)
            .withColumnRenamed("n_pairs", "kn_n_pairs")
            .withColumnRenamed("logprob_e9_sum", "kn_logprob_e9_sum")
            .withColumnRenamed("avg_nll_e6", "kn_avg_nll_e6"),
            "doc_id",
        )
        # r13: the GENERALIZED backoff machinery hash-checked at an
        # order the hand-written trigram tier doesn't cover (the
        # generated DuckDB twin replays the same order-4 chain)
        .join(
            T.lm_score_backoff_n(docs, order=4)
            .withColumnRenamed("n_ctx", "bo4_n_ctx")
            .withColumnRenamed("logprob_e9_sum", "bo4_logprob_e9_sum")
            .withColumnRenamed("avg_nll_e6", "bo4_avg_nll_e6"),
            "doc_id",
        )
    )


_TEXT_METRICS_ORACLE = f"""
    SELECT tc.*, tq.* EXCLUDE (doc_id),
           gq.n_words AS g_n_words,
           gq.* EXCLUDE (doc_id, n_words),
           c4.* EXCLUDE (doc_id),
           lm.* EXCLUDE (doc_id),
           bo.n_ctx,
           bo.logprob_e9_sum AS bo_logprob_e9_sum,
           bo.avg_nll_e6 AS bo_avg_nll_e6,
           kn.* EXCLUDE (doc_id),
           bo4.* EXCLUDE (doc_id)
    FROM ({T.token_count_oracle(table=_QUALITY_PROBE_SQL)}) tc
    JOIN ({T.text_quality_oracle(table=_QUALITY_PROBE_SQL)}) tq
        USING (doc_id)
    JOIN ({T.gopher_quality_flags_oracle(table=_QUALITY_PROBE_SQL)}) gq
        USING (doc_id)
    JOIN ({T.c4_line_filter_oracle(table=_QUALITY_PROBE_SQL)}) c4
        USING (doc_id)
    JOIN ({T.lm_score_oracle(table=_QUALITY_PROBE_SQL)}) lm
        USING (doc_id)
    JOIN ({T.lm_score_backoff_oracle(table=_QUALITY_PROBE_SQL)}) bo
        USING (doc_id)
    JOIN (SELECT doc_id, n_pairs AS kn_n_pairs,
                 logprob_e9_sum AS kn_logprob_e9_sum,
                 avg_nll_e6 AS kn_avg_nll_e6
          FROM ({T.lm_score_kn_oracle(table=_QUALITY_PROBE_SQL)})) kn
        USING (doc_id)
    JOIN (SELECT doc_id, n_ctx AS bo4_n_ctx,
                 logprob_e9_sum AS bo4_logprob_e9_sum,
                 avg_nll_e6 AS bo4_avg_nll_e6
          FROM ({T.lm_score_backoff_n_oracle(
              table=_QUALITY_PROBE_SQL, order=4)})) bo4
        USING (doc_id)
"""


#: Unicode probe pages for the normalize_text gate: the synthetic
#: corpus is plain ASCII (NFC is a no-op there), so these exercise
#: real recomposition (e + combining acute), control stripping,
#: run collapsing, and paragraph preservation on both engines. The
#: decomposed accent is spelled with an explicit escape so the source
#: file itself stays NFC-clean.
_UNICODE_PROBE_DOCS = [
    (9_100_001, "cafe\u0301 becomes composed under NFC"),
    (9_100_002, "tabs\tand   runs \t collapse"),
    (9_100_003, "ctlcharsdie but text lives"),
    (9_100_004, "para one\n\n\n\n\npara two"),
]


def _q_text_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lang_id + doc fingerprint + unicode/whitespace normalization
    (r12: `normalize_text` — the NFC step runs as an Arrow batch, the
    cleanup chain is codegen; the normalized string and the changed
    flag hash-check against utf8proc's nfc_normalize) joined per
    document, with unicode probe pages appended so recomposition is
    exercised on an otherwise-ASCII corpus."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).unionByName(
        spark.createDataFrame(
            _UNICODE_PROBE_DOCS, "doc_id long, text string"
        )
    )
    return (
        T.lang_id(docs)
        .join(T.fingerprint(docs), "doc_id")
        .join(T.normalize_text(docs), "doc_id")
    )


_UNICODE_PROBE_SQL = (
    "(SELECT doc_id, text FROM documents UNION ALL SELECT * FROM "
    "(VALUES "
    + ", ".join(
        f"({i}, '" + t.replace("'", "''") + "')"
        for i, t in _UNICODE_PROBE_DOCS
    )
    + ") v(doc_id, text))"
)

_TEXT_IDENTITY_ORACLE = f"""
    SELECT li.*, fp.* EXCLUDE (doc_id), nt.* EXCLUDE (doc_id)
    FROM ({T.lang_id_oracle(table=_UNICODE_PROBE_SQL)}) li
    JOIN ({T.fingerprint_oracle(table=_UNICODE_PROBE_SQL)}) fp
        USING (doc_id)
    JOIN ({T.normalize_text_oracle(table=_UNICODE_PROBE_SQL)}) nt
        USING (doc_id)
"""


def _q_text_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction + repetition signals joined per document."""
    docs = table(spark, sf_dir, "documents")
    return T.redact_pii(docs).join(T.repetition_signals(docs), "doc_id")


_TEXT_SAFETY_ORACLE = f"""
    SELECT * FROM ({T.redact_pii_oracle()}) rp
    JOIN ({T.repetition_signals_oracle()}) rs USING (doc_id)
"""


#: Fixed BM25 gate queries — phrases built from the synthetic
#: documents table's vocabulary so every query matches real postings
#: (multi-term, one repeated-term bag, one term that misses).
_BM25_QUERIES = [
    "hash join merge",
    "slow query filter",
    "window sort stream",
    "vector vector the zzzmiss",
]

#: Fixed phrase-search gate queries: frequent testdata bigrams, a
#: trigram, a repeated-term phrase (each offset must be witnessed
#: independently), and a guaranteed miss.
_PHRASE_QUERIES = [
    "order fast",
    "data slow",
    "window join stream",
    "order order",
    "zzz yyy",
]


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 terms + per-document TF-IDF top-k terms +
    BM25 full-text search top-10 per fixed query + exact positional
    phrase search top-10 per fixed phrase (r11, scope='phrase':
    integer-only adjacency join, term=the phrase, n=hit count),
    union-tagged by
    scope (corpus rows carry NULL doc_id/score/rank; bm25 rows carry
    the query string in `term`, the matched-term count in `n`, and
    the fixed-point integer-summed BM25 score in `score_e4` — the
    oracle replays the identical per-term double and floor, so the
    ranking hash-matches bit-for-bit)."""
    docs = table(spark, sf_dir, "documents")
    corpus = _q_top_terms(spark, sf_dir).select(
        F.lit("corpus").alias("scope"),
        F.lit(None).cast("bigint").alias("doc_id"),
        "term",
        F.col("n").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        F.lit(None).cast("int").alias("rank"),
    )
    perdoc = T.tfidf_top_terms(docs, k=5).select(
        F.lit("doc").alias("scope"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "term",
        F.col("tf").cast("bigint").alias("n"),
        "score_e4",
        "rank",
    )
    # ONE bm25 call feeds three scopes (bm25/metrics/mmr): each
    # df-path call eagerly builds + localCheckpoints the text index
    # (r12), so duplicate calls would tokenize and materialize the
    # corpus index once per scope
    ranked10 = T.bm25_topk(docs, _BM25_QUERIES, k=10)
    bm25 = ranked10.select(
        F.lit("bm25").alias("scope"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("query").alias("term"),
        F.col("n_terms").cast("bigint").alias("n"),
        "score_e4",
        "rank",
    )
    phrase = T.phrase_topk(docs, _PHRASE_QUERIES, k=10).select(
        F.lit("phrase").alias("scope"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("phrase").alias("term"),
        F.col("n_hits").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        "rank",
    )
    colloc = T.collocations(docs, k=30, min_count=5).select(
        F.lit("colloc").alias("scope"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.concat_ws(" ", "w1", "w2").alias("term"),
        F.col("n_pair").alias("n"),
        F.expr("pmi_e6 div 100").alias("score_e4"),
        "rank",
    )
    # scope='metrics' (r12): the retrieval-evaluation family gated
    # cross-engine — retrieval_metrics over the SAME bm25 ranking the
    # 'bm25' scope hash-checks, against synthetic-but-deterministic
    # qrels derived from doc_id arithmetic (query i judges docs with
    # doc_id % 17 == i at grade 1 + doc_id % 3 — replayed identically
    # in the oracle). All six metric values are exact ints or
    # fixed-point by construction; rows un-pivot to one (query,
    # metric) pair per row so the consolidated shape holds.
    qidx = docs.sparkSession.createDataFrame(
        [(q, i) for i, q in enumerate(_BM25_QUERIES)],
        "query string, idx int",
    )
    qrels = (
        docs.withColumn("idx", (F.col("doc_id") % 17).cast("int"))
        .join(F.broadcast(qidx), "idx")
        .select(
            "query",
            "doc_id",
            (F.lit(1) + F.col("doc_id") % 3).cast("int").alias("rel"),
        )
    )
    met = RK.retrieval_metrics(ranked10, qrels, k=10)
    metrics = met.select(
        "query",
        F.explode(
            F.create_map(
                F.lit("n_rel"), F.col("n_rel").cast("bigint"),
                F.lit("n_hit"), F.col("n_hit").cast("bigint"),
                F.lit("mrr_e6"), F.col("mrr_e6").cast("bigint"),
                F.lit("dcg_e9"), F.col("dcg_e9").cast("bigint"),
                F.lit("idcg_e9"), F.col("idcg_e9").cast("bigint"),
                F.lit("ndcg_e6"), F.col("ndcg_e6").cast("bigint"),
            )
        ).alias("metric", "val"),
    ).select(
        F.lit("metrics").alias("scope"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.concat_ws("::", "query", "metric").alias("term"),
        F.col("val").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        F.lit(None).cast("int").alias("rank"),
    )
    # scope='rm3' (r12): pseudo-relevance-feedback expansion gated by
    # its full expanded string (order + content in one value) — the
    # oracle replays the bm25 feedback ranking, the (tfsum·idf)
    # fixed-point term scores, and the rank-ordered concatenation.
    rm3 = T.expand_queries(
        docs, _BM25_QUERIES, n_docs=5, n_terms=5
    ).select(
        F.lit("rm3").alias("scope"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.col("expanded_query").alias("term"),
        F.size("added_terms").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        F.lit(None).cast("int").alias("rank"),
    )
    # scope='kwic' (r12): keyword-in-context snippets — integer
    # positions + string slicing end-to-end, so the assembled snippet
    # strings hash-check (the term and its snippet pack into `term`,
    # the 0-based token position rides in `n`).
    kwic = T.keyword_snippets(
        docs, _KWIC_TERMS, window=3, k=15
    ).select(
        F.lit("kwic").alias("scope"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.concat_ws("::", "term", "snippet").alias("term"),
        F.col("pos").cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        "rank",
    )
    # scope='drift' (r12): corpus-drift PSI between the full corpus
    # and a deterministic "yesterday" subset (doc_id % 3 != 0), both
    # restricted to ASCII text so the oracle's per-character crc32
    # replay consumes the same bytes. Bucket counts ride in `term`,
    # the per-bucket fixed-point PSI in `n`, the corpus total in
    # `score_e4` (a constant column — also hash-checked).
    adocs = docs.where(
        F.col("text").isNotNull() & F.col("text").rlike("^[ -~]*$")
    )
    drift = T.corpus_drift(
        adocs, adocs.where("doc_id % 3 != 0"), buckets=64
    ).select(
        F.lit("drift").alias("scope"),
        F.col("bucket").cast("bigint").alias("doc_id"),
        F.concat_ws(":", F.lit("b"), "n_a", "n_b").alias("term"),
        F.col("psi_e9").alias("n"),
        F.col("psi_total_e9").alias("score_e4"),
        F.lit(None).cast("int").alias("rank"),
    )
    # scope='mmr' (r12): the MMR diversity pass gated bit-for-bit —
    # possible because the r12 quantized-cosine path makes every
    # similarity an order-free integer dot. Candidates are the gated
    # bm25 ranking; vectors are exact small-integer arrays derived
    # from doc_id arithmetic (so norms are square roots of exact sums
    # and both engines feed libm identical operands).
    vdf = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 15), j -> "
            "CAST((doc_id * (j + 3) + j * j) % 17 - 8 AS DOUBLE))"
        ).alias("embedding"),
    )
    # k=8 candidates are the rank<=8 PREFIX of the k=10 ranking (the
    # window rank is computed before the cut), so no third index build
    mmr = RK.mmr_rerank(
        ranked10.where("rank <= 8"), vdf, k=5, lam=0.7
    ).select(
        F.lit("mmr").alias("scope"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("query").alias("term"),
        F.col("mmr_e6").alias("n"),
        F.lit(None).cast("bigint").alias("score_e4"),
        "rank",
    )
    # scope='vdrift' (r12): NUMERIC drift — PSI between two event-value
    # windows through the histogram-sketch path (build two sketches,
    # merge, dense counts, the shared _psi_frame arithmetic); the
    # oracle replays the geometric binning with the engine's exact
    # operand bits (the log-growth divisor ships as the same Python
    # repr literal F.lit embeds) and the PSI block.
    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.operators.sketches import (
        histogram_drift, value_histogram_sketch,
    )

    ev = events_table(spark, sf_dir)
    vdrift = histogram_drift(
        value_histogram_sketch(
            ev.where("user_id % 2 = 0"), "value",
            lo=0.01, hi=1e6, growth=1.5,
        ),
        value_histogram_sketch(
            ev.where("user_id % 2 != 0"), "value",
            lo=0.01, hi=1e6, growth=1.5,
        ),
    ).select(
        F.lit("vdrift").alias("scope"),
        F.col("bucket").cast("bigint").alias("doc_id"),
        F.concat_ws(":", F.lit("b"), "n_a", "n_b").alias("term"),
        F.col("psi_e9").alias("n"),
        F.col("psi_total_e9").alias("score_e4"),
        F.lit(None).cast("int").alias("rank"),
    )
    return (
        corpus.unionByName(perdoc).unionByName(bm25)
        .unionByName(phrase).unionByName(colloc)
        .unionByName(metrics).unionByName(rm3).unionByName(kwic)
        .unionByName(drift).unionByName(mmr).unionByName(vdrift)
    )


_TERM_STATS_ORACLE = f"""
    SELECT 'corpus' AS scope, CAST(NULL AS BIGINT) AS doc_id, term,
           CAST(n AS BIGINT) AS n, CAST(NULL AS BIGINT) AS score_e4,
           CAST(NULL AS INT) AS rank
    FROM ({_TOP_TERMS_ORACLE})
    UNION ALL
    SELECT 'doc', doc_id, term, CAST(tf AS BIGINT), score_e4, rank
    FROM ({T.tfidf_top_terms_oracle(k=5)})
    UNION ALL
    SELECT 'bm25', doc_id, query AS term, CAST(n_terms AS BIGINT),
           score_e4, rank
    FROM ({T.bm25_topk_oracle(_BM25_QUERIES, k=10)})
    UNION ALL
    SELECT 'phrase', doc_id, phrase AS term, CAST(n_hits AS BIGINT),
           CAST(NULL AS BIGINT), rank
    FROM ({T.phrase_topk_oracle(_PHRASE_QUERIES, k=10)})
    UNION ALL
    SELECT 'colloc', CAST(NULL AS BIGINT), w1 || ' ' || w2, n_pair,
           pmi_e6 // 100, rank
    FROM ({T.collocations_oracle(k=30, min_count=5)})
    UNION ALL
    SELECT 'metrics', CAST(NULL AS BIGINT), query || '::' || m, v,
           CAST(NULL AS BIGINT), CAST(NULL AS INT)
    FROM (
        WITH mtr AS ({{METRICS_ORACLE}})
        SELECT query, 'n_rel' AS m, CAST(n_rel AS BIGINT) AS v FROM mtr
        UNION ALL
        SELECT query, 'n_hit', CAST(n_hit AS BIGINT) FROM mtr
        UNION ALL
        SELECT query, 'mrr_e6', CAST(mrr_e6 AS BIGINT) FROM mtr
        UNION ALL
        SELECT query, 'dcg_e9', CAST(dcg_e9 AS BIGINT) FROM mtr
        UNION ALL
        SELECT query, 'idcg_e9', CAST(idcg_e9 AS BIGINT) FROM mtr
        UNION ALL
        SELECT query, 'ndcg_e6', CAST(ndcg_e6 AS BIGINT) FROM mtr
    )
    UNION ALL
    SELECT 'rm3', CAST(NULL AS BIGINT), expanded_query,
           CAST(n_added AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS INT)
    FROM ({T.expand_queries_oracle(_BM25_QUERIES, n_docs=5, n_terms=5)})
    UNION ALL
    SELECT 'kwic', doc_id, term || '::' || snippet,
           CAST(pos AS BIGINT), CAST(NULL AS BIGINT), rank
    FROM ({{KWIC_ORACLE}})
"""

_QRELS_ORACLE = (
    "SELECT v.query, d.doc_id, CAST(1 + d.doc_id % 3 AS INT) AS rel "
    "FROM (VALUES "
    + ", ".join(
        "('" + q.replace("'", "''") + f"', {i})"
        for i, q in enumerate(_BM25_QUERIES)
    )
    + ") v(query, idx) JOIN documents d ON d.doc_id % 17 = v.idx"
)

#: Fixed KWIC gate terms: two frequent testdata terms plus one absent
#: (the no-hit path must stay a no-op, not an error, on both engines).
_KWIC_TERMS = ["hash", "customer", "zzznothere"]

_TERM_STATS_ORACLE = _TERM_STATS_ORACLE.replace(
    "{METRICS_ORACLE}",
    RK.retrieval_metrics_oracle(
        T.bm25_topk_oracle(_BM25_QUERIES, k=10), _QRELS_ORACLE, k=10
    ),
).replace(
    "{KWIC_ORACLE}",
    T.keyword_snippets_oracle(_KWIC_TERMS, window=3, k=15),
)

_ASCII_DOCS = "regexp_matches(text, '^[ -~]*$')"
_MMR_VECTORS_SQL = (
    "SELECT doc_id, [CAST((doc_id * (j + 3) + j * j) % 17 - 8 "
    "AS DOUBLE) for j in generate_series(0, 15)] AS v FROM documents"
)
_TERM_STATS_ORACLE += f"""
    UNION ALL
    SELECT 'drift', CAST(bucket AS BIGINT),
           'b:' || CAST(n_a AS VARCHAR) || ':' || CAST(n_b AS VARCHAR),
           psi_e9, psi_total_e9, CAST(NULL AS INT)
    FROM ({T.corpus_drift_oracle(
        _ASCII_DOCS, _ASCII_DOCS + " AND doc_id % 3 != 0", buckets=64,
    )})
    UNION ALL
    SELECT 'mmr', doc_id, query, mmr_e6, CAST(NULL AS BIGINT), rank
    FROM ({RK.mmr_rerank_oracle(
        T.bm25_topk_oracle(_BM25_QUERIES, k=8), _MMR_VECTORS_SQL,
        k=5, lam=0.7,
    )})
    UNION ALL
    SELECT 'vdrift', CAST(bucket AS BIGINT),
           'b:' || CAST(n_a AS VARCHAR) || ':' || CAST(n_b AS VARCHAR),
           psi_e9, psi_total_e9, CAST(NULL AS INT)
    FROM ({SK.histogram_drift_oracle(
        "user_id % 2 = 0", "user_id % 2 != 0",
        lo=0.01, hi=1e6, growth=1.5,
    )})
"""


def _q_sampling_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every hash-bucketed selection operator as one membership frame:
    (method, doc_id) rows for the Bernoulli sample, the stratified
    sample, the train/valid/test split assignment, the solved
    target-mixture downsample, the per-row weighted sample, the exact-k
    Gumbel-top-k weighted sample, the exact-k uniform sample, the
    k-per-group sample, and the DSIR/classifier scores — all
    pure functions of the doc id (and, for the mixture, the stratum
    counts), so the oracle replays each decision exactly. The mixture
    rows cross-check `target_mixture`'s rate-solving ARITHMETIC: the
    DuckDB oracle re-derives the per-stratum keep rates from its own
    counts with the identical double-precision operation order, so any
    drift in the solver shows up as a membership hash mismatch. The
    gumbel_topk rows (r11) replay `weighted_sample_k`'s EXACT top-k:
    both engines derive u from the same 32 sha256 bits (every term
    exactly representable), so the Gumbel keys are the same two libm
    log calls on the same doubles and the k-th boundary agrees
    (verified at sf0.001/0.01/0.1). The dsir and qcls rows (r11)
    carry `dsir_score`'s fixed-point score and
    `quality_classifier_score`'s (dot, gram-count) integers per doc
    in the method string under FIXED 32-bucket models; the oracle
    re-implements the whole featurizer ONCE in SQL — lowercase,
    whitespace split, 1..2-grams, and zlib crc32 via a recursive-CTE
    byte loop over the reflected 0xEDB88320 table — and projects both
    models' sums from it, on the ASCII doc subset (non-ASCII stays
    covered by the hypothesis/numpy-oracle pytest tier)."""
    docs = table(spark, sf_dir, "documents")
    out = SAMP.deterministic_sample(docs, rate=0.2).select(
        F.lit("bernoulli").alias("method"), "doc_id"
    )
    strat = SAMP.stratified_sample(
        docs, rates={"en": 0.3, "zh": 1.0}, strata_col="lang", default_rate=0.5
    ).select(F.lit("stratified").alias("method"), "doc_id")
    out = out.unionByName(strat)
    for name, df in SAMP.split_frame(
        docs, {"train": 0.8, "valid": 0.1, "test": 0.1}
    ).items():
        out = out.unionByName(
            df.select(F.lit(f"split:{name}").alias("method"), "doc_id")
        )
    mixed, _rates = SAMP.target_mixture(
        docs, {"en": 0.6, "zh": 0.4}, "lang", salt="mix"
    )
    out = out.unionByName(
        mixed.select(F.lit("mixture").alias("method"), "doc_id")
    )
    # r12: temperature sampling (p_i ∝ (n_i/N)^alpha) — the weights
    # fixed-point at e12 before the normalizing sum, so the solved
    # rates replay exactly in the oracle
    tempered, _trates = SAMP.temperature_mixture(
        docs, "lang", alpha=0.7, salt="temp"
    )
    out = out.unionByName(
        tempered.select(F.lit("temperature").alias("method"), "doc_id")
    )
    # r12: the streaming sample STORE under the gate — two fragment
    # writes + a compaction + the store read must equal the k
    # smallest salted hashes of the whole corpus (min-k merging is
    # associative, so the store mechanics are what is being checked;
    # the oracle replays the plain global_sample_k SQL)
    import shutil
    import tempfile

    from etl_workflow_spark.streaming import incremental as _inc

    tmp = tempfile.mkdtemp(prefix="sample_store_gate_")
    try:
        st = os.path.join(tmp, "store")
        _inc.sample_rollup_batch(
            docs.where("doc_id % 2 = 0"), st, 0, k=120, salt="sgate"
        )
        _inc.sample_rollup_batch(
            docs.where("doc_id % 2 != 0"), st, 1, k=120, salt="sgate"
        )
        _inc.compact_sample_store(spark, st, before_batch_id=1)
        stored = [
            (r["doc_id"],)
            for r in _inc.read_sample_store(spark, st)
            .select("doc_id").collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = out.unionByName(
        spark.createDataFrame(stored, "doc_id bigint").select(
            F.lit("store_sample").alias("method"), "doc_id"
        )
    )
    weighted = SAMP.weighted_sample(
        docs.withColumn(
            "w_rate", (F.col("doc_id") % 10).cast("double") / F.lit(10.0)
        ),
        "w_rate",
    )
    out = out.unionByName(
        weighted.select(F.lit("weighted").alias("method"), "doc_id")
    )
    gumbel = SAMP.weighted_sample_k(
        docs.withColumn(
            "logw", (F.col("doc_id") % 7).cast("double") / F.lit(2.0)
        ),
        "logw", 500, key="doc_id", salt="gk",
    )
    out = out.unionByName(
        gumbel.select(F.lit("gumbel_topk").alias("method"), "doc_id")
    )
    out = out.unionByName(
        SAMP.global_sample_k(docs, 400, salt="glk").select(
            F.lit("global_k").alias("method"), "doc_id"
        )
    )
    out = out.unionByName(
        SAMP.per_group_sample(
            docs, ["lang"], 40, salt="pgs"
        ).select(
            F.concat(F.lit("pergroup:"), F.col("lang")).alias("method"),
            "doc_id",
        )
    )
    # \A..\z, not ^..$: Java's $ matches BEFORE a final line
    # terminator, so '^[ -~]*$' would admit a trailing-newline doc
    # the oracle's RE2 (end-of-text $) rejects — a latent gate
    # divergence on data this filter exists to exclude
    ascii_docs = docs.where("doc_id < 40 AND text IS NOT NULL").where(
        F.col("text").rlike("\\A[ -~]*\\z")
    )
    scored = T.dsir_score(ascii_docs, _DSIR_GATE_MODEL)
    out = out.unionByName(
        scored.select(
            F.concat(
                F.lit("dsir:"), F.col("logw_e6").cast("string")
            ).alias("method"),
            "doc_id",
        )
    )
    qscored = T.quality_classifier_score(ascii_docs, _QCLS_GATE_MODEL)
    out = out.unionByName(
        qscored.select(
            F.concat(
                F.lit("qcls:"),
                F.col("qdot_e6").cast("string"),
                F.lit(":"),
                F.col("n_grams").cast("string"),
            ).alias("method"),
            "doc_id",
        )
    )
    return out


# FIXED dsir model for the cross-engine scoring tier: constant
# log-ratios (a quadratic residue pattern — arbitrary but stable and
# sign-mixed), so the oracle needs no fit replication, only the
# featurizer + dot product
_DSIR_GATE_MODEL = {
    "format": "spark-graft-dsir/v1",
    "n": 2,
    "buckets": 32,
    "smoothing": 1.0,
    "log_ratio_e6": [
        ((37 * i * i + 11 * i) % 4000001) - 2000000 for i in range(32)
    ],
}

# FIXED qcls model for the classifier tier — same 32-bucket feature
# space so the oracle's gram/crc32 computation is shared verbatim
_QCLS_GATE_MODEL = {
    "format": "spark-graft-qcls/v1",
    "n": 2,
    "buckets": 32,
    "bias_e6": -250000,
    "weights_e6": [
        ((23 * i * i + 7 * i) % 3000001) - 1500000 for i in range(32)
    ],
}


def _sampling_splits_oracle() -> str:
    from etl_workflow_spark.operators.sampling import _thr

    t_train, t_valid = _thr(0.8), _thr(0.9)
    ratio_vals = ", ".join(
        f"({i}, CAST({v} AS BIGINT))"
        for i, v in enumerate(_DSIR_GATE_MODEL["log_ratio_e6"])
    )
    qcls_vals = ", ".join(
        f"({i}, CAST({v} AS BIGINT))"
        for i, v in enumerate(_QCLS_GATE_MODEL["weights_e6"])
    )
    return f"""
        SELECT 'bernoulli' AS method, doc_id
        FROM ({SAMP.deterministic_sample_oracle(rate=0.2)})
        UNION ALL
        SELECT 'stratified', doc_id
        FROM ({SAMP.stratified_sample_oracle(
            rates={"en": 0.3, "zh": 1.0}, strata_col="lang", default_rate=0.5)})
        UNION ALL
        SELECT 'split:' || CASE WHEN h < '{t_train}' THEN 'train'
                                WHEN h < '{t_valid}' THEN 'valid'
                                ELSE 'test' END,
               doc_id
        FROM (
            SELECT doc_id,
                   substr(sha256('split' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
            FROM documents
        )
        UNION ALL
        -- target_mixture replay: the oracle re-solves the keep rates
        -- from ITS OWN stratum counts with the exact double-precision
        -- operation order of sampling.target_mixture (share = w/total,
        -- t_out = min(n/share), rate = min(1, (share*t_out)/n)), then
        -- re-derives the per-stratum hex threshold exactly as _thr()
        -- does (truncate rate*2^32, clamp to [0, 2^32-1], 8-hex).
        -- Literals are CAST to DOUBLE: DuckDB decimal-literal
        -- arithmetic would otherwise diverge from Python floats.
        SELECT 'mixture', d.doc_id
        FROM documents d
        JOIN (
            SELECT lang,
                   printf('%08x', LEAST(GREATEST(CAST(FLOOR(
                       LEAST(CAST(1.0 AS DOUBLE),
                             (share * t_out) / n) * 4294967296.0
                   ) AS BIGINT), 0), 4294967295)) AS thr
            FROM (
                SELECT lang, n, share,
                       MIN(n / share) OVER () AS t_out
                FROM (
                    SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
                           CASE lang
                               WHEN 'en' THEN CAST(0.6 AS DOUBLE)
                                   / (CAST(0.6 AS DOUBLE)
                                      + CAST(0.4 AS DOUBLE))
                               WHEN 'zh' THEN CAST(0.4 AS DOUBLE)
                                   / (CAST(0.6 AS DOUBLE)
                                      + CAST(0.4 AS DOUBLE))
                           END AS share
                    FROM documents WHERE lang IN ('en', 'zh')
                    GROUP BY lang
                )
            )
        ) r ON d.lang = r.lang
        WHERE substr(sha256('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < r.thr
        UNION ALL
        -- temperature_mixture replay (r12): weight = pow(n/N, alpha)
        -- FIXED-POINTED at e12 before the normalizing sum (exact
        -- integer, order-free), then share / feasible-output / rate /
        -- threshold re-derived with the exact double operation order
        -- of sampling.temperature_mixture; same _thr() truncation as
        -- the mixture tier
        SELECT 'temperature', d.doc_id
        FROM documents d
        JOIN (
            SELECT lang,
                   printf('%08x', LEAST(GREATEST(CAST(FLOOR(
                       LEAST(CAST(1.0 AS DOUBLE),
                             (p * t_out) / n) * 4294967296.0
                   ) AS BIGINT), 0), 4294967295)) AS thr
            FROM (
                SELECT lang, n, p,
                       MIN(CASE WHEN p > 0 THEN n / p END) OVER ()
                           AS t_out
                FROM (
                    SELECT lang, n,
                           CAST(we12 AS DOUBLE)
                               / CAST(SUM(we12) OVER () AS DOUBLE) AS p
                    FROM (
                        SELECT lang, CAST(n AS DOUBLE) AS n,
                               CAST(FLOOR(pow(
                                   CAST(n AS DOUBLE)
                                       / CAST(SUM(n) OVER () AS DOUBLE),
                                   CAST(0.7 AS DOUBLE)
                               ) * CAST(1000000000000.0 AS DOUBLE))
                               AS BIGINT) AS we12
                        FROM (
                            SELECT lang, COUNT(*) AS n FROM documents
                            WHERE lang IS NOT NULL GROUP BY 1
                        )
                    )
                )
            )
        ) r ON d.lang = r.lang
        WHERE d.lang IS NOT NULL
          AND substr(sha256('temp' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < r.thr
        UNION ALL
        -- weighted_sample replay: u = first-32-bits(sha)/2^32 < rate,
        -- with the per-row rate (doc_id % 10)/10 derived identically
        SELECT 'weighted', doc_id
        FROM documents
        WHERE (CAST(('0x' || substr(
                   sha256('wsample' || CAST(doc_id AS VARCHAR)), 1, 8
               )) AS BIGINT) / CAST(4294967296 AS DOUBLE))
              < (CAST(doc_id % 10 AS DOUBLE) / CAST(10.0 AS DOUBLE))
        UNION ALL
        -- weighted_sample_k (Gumbel-top-k) replay: key = logw +
        -- -ln(-ln(u)) with u = (first-32-sha-bits + 1) / (2^32 + 2),
        -- top 500 by (key DESC, id ASC) — every u term is exactly
        -- representable, so both engines feed libm the same doubles
        SELECT 'gumbel_topk', doc_id
        FROM (
            SELECT doc_id,
                   CAST(doc_id % 7 AS DOUBLE) / CAST(2.0 AS DOUBLE)
                   + -ln(-ln(
                       (CAST(('0x' || substr(
                            sha256('gk' || CAST(doc_id AS VARCHAR)), 1, 8
                        )) AS BIGINT) + CAST(1.0 AS DOUBLE))
                       / (CAST(4294967296.0 AS DOUBLE)
                          + CAST(2.0 AS DOUBLE))
                   )) AS gk
            FROM documents
            ORDER BY gk DESC, doc_id ASC
            LIMIT 500
        )
        UNION ALL
        -- sample-store replay (r12): the store's fragment merge +
        -- compaction + read must equal the plain k-smallest-salted-
        -- hashes query over the whole corpus
        SELECT 'store_sample', doc_id
        FROM (
            SELECT doc_id
            FROM documents
            ORDER BY substr(sha256('sgate' || CAST(doc_id AS VARCHAR)), 1, 8),
                     doc_id
            LIMIT 120
        )
        UNION ALL
        -- global_sample_k replay: k smallest salted hashes (hex order
        -- == numeric order), id tiebreak — no floats anywhere
        SELECT 'global_k', doc_id
        FROM (
            SELECT doc_id
            FROM documents
            ORDER BY substr(sha256('glk' || CAST(doc_id AS VARCHAR)), 1, 8),
                     doc_id
            LIMIT 400
        )
        UNION ALL
        -- per_group_sample replay: rank within group by the same
        -- salted hash, first 40 survive
        SELECT 'pergroup:' || lang, doc_id
        FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY substr(
                           sha256('pgs' || CAST(doc_id AS VARCHAR)), 1, 8
                       ), doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 40
        UNION ALL
        -- dsir_score + quality_classifier_score replay under fixed
        -- 32-bucket models sharing ONE featurizer computation: the
        -- full featurizer in SQL — lowercase, \\s+ word split, word
        -- 1..2-grams, zlib crc32 (recursive-CTE byte loop over the
        -- reflected 0xEDB88320 table; ASCII docs, so unicode(char) IS
        -- the byte) mod 32 — summed against each model's constant
        -- weight list; gram-less docs score 0, exactly as the engine
        SELECT method, doc_id
        FROM (
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
            dsir_docs AS (
                SELECT doc_id, lower(text) AS t FROM documents
                WHERE doc_id < 40 AND text IS NOT NULL
                  AND regexp_matches(text, '^[ -~]*$')
            ),
            words AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(t, '\\s+'), w -> w <> ''
                       ) AS ws
                FROM dsir_docs
            ),
            gram_rows AS (
                SELECT doc_id, g
                FROM (
                    SELECT doc_id, unnest(
                        ws || [ws[i] || ' ' || ws[i + 1]
                               for i in generate_series(1, len(ws) - 1)]
                    ) AS g
                    FROM words WHERE len(ws) > 0
                )
            ),
            crc_iter(doc_id, i, n, g, c) AS (
                SELECT doc_id, 0, length(g), g, CAST(4294967295 AS BIGINT)
                FROM gram_rows
                UNION ALL
                SELECT ci.doc_id, ci.i + 1, ci.n, ci.g, xor(t.c, ci.c >> 8)
                FROM crc_iter ci
                JOIN tbl t
                  ON t.n = xor(
                         ci.c & 255, unicode(substr(ci.g, ci.i + 1, 1))
                     )
                WHERE ci.i < ci.n
            ),
            bkt AS (
                SELECT doc_id,
                       CAST(xor(c, 4294967295) % 32 AS BIGINT) AS b
                FROM crc_iter WHERE i = n
            ),
            ratio(b, v) AS (SELECT * FROM (VALUES {ratio_vals})),
            qw(b, w) AS (SELECT * FROM (VALUES {qcls_vals})),
            scores AS (
                SELECT doc_id, CAST(SUM(v) AS BIGINT) AS logw_e6
                FROM bkt JOIN ratio USING (b) GROUP BY doc_id
            ),
            qscores AS (
                SELECT doc_id, CAST(SUM(w) AS BIGINT) AS qdot_e6,
                       CAST(COUNT(*) AS BIGINT) AS n_grams
                FROM bkt JOIN qw USING (b) GROUP BY doc_id
            )
            SELECT 'dsir:' || CAST(
                       CAST(COALESCE(s.logw_e6, 0) AS BIGINT) AS VARCHAR
                   ) AS method,
                   d.doc_id
            FROM dsir_docs d LEFT JOIN scores s USING (doc_id)
            UNION ALL
            SELECT 'qcls:' || CAST(
                       CAST(COALESCE(qs.qdot_e6, 0) AS BIGINT) AS VARCHAR
                   ) || ':' || CAST(
                       CAST(COALESCE(qs.n_grams, 0) AS BIGINT) AS VARCHAR
                   ),
                   d.doc_id
            FROM dsir_docs d LEFT JOIN qscores qs USING (doc_id)
        )
    """


def _q_stats_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-statistics contracts in one frame: HLL approx-distinct
    bounds per order priority (D6 scale twin) with the engine-exact
    Pearson correlation appended as constant columns (one row x five
    groups — a driver-trivial cross join)."""
    prio = _q_approx_unique_customers(spark, sf_dir)
    corr = _q_qty_price_corr(spark, sf_dir).withColumnRenamed(
        "n", "n_lineitems"
    )
    return prio.crossJoin(corr)


_STATS_CONTRACT_ORACLE = f"""
    SELECT a.*, c.n AS n_lineitems, c.corr_qty_price_e6
    FROM ({_APPROX_UNIQUE_ORACLE}) a
    CROSS JOIN ({_QTY_PRICE_CORR_ORACLE}) c
"""


def _q_events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type statistics: exact interpolated percentiles joined
    with the skew-safe salted aggregate (count/min/max/decimal-sum) —
    the salt only reshapes the shuffle, so the plain GROUP BY oracle
    must match bit-for-bit."""
    return _q_value_percentiles(spark, sf_dir).join(
        _q_skew_salted_agg(spark, sf_dir), "event_type"
    )


_EVENTS_TYPE_STATS_ORACLE = f"""
    SELECT * FROM ({_VALUE_PERCENTILES_ORACLE}) p
    JOIN ({_SKEW_SALTED_AGG_ORACLE}) s USING (event_type)
"""


def _q_event_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consolidated event-analytics gate entry — three operators
    (`operators/temporal.py`), each cross-engine hash-checked, unioned
    into one (kind, k1, k2, n) frame:

    - ``funnel_user``: per-user furthest step reached in the
      view → click → purchase funnel (first-touch semantics), plus
      ``funnel_step`` conversion counts;
    - ``retention``: weekly signup-cohort retention triangle
      (cohort date, period offset, retained users);
    - ``transition``: the per-user consecutive-event transition matrix
      (event_id tiebreak pins a total order under equal timestamps).
    """
    from etl_workflow_spark.operators import temporal as TP

    ev = table(spark, sf_dir, "events")
    fun = TP.funnel(ev, ["view", "click", "purchase"])
    per_user = fun.select(
        F.lit("funnel_user").alias("kind"),
        F.col("user_id").cast("string").alias("k1"),
        F.lit("").alias("k2"),
        F.col("reached").cast("long").alias("n"),
    )
    steps = TP.funnel_counts(fun, 3).selectExpr(
        "stack(3, 'step_1', step_1_users, 'step_2', step_2_users,"
        " 'step_3', step_3_users) AS (k1, n)"
    ).select(
        F.lit("funnel_step").alias("kind"),
        "k1",
        F.lit("").alias("k2"),
        F.col("n").cast("long").alias("n"),
    )
    ret = TP.retention_cohorts(ev, cohort_event="signup", grain="week").select(
        F.lit("retention").alias("kind"),
        F.date_format("cohort", "yyyy-MM-dd").alias("k1"),
        F.col("period_offset").cast("string").alias("k2"),
        F.col("n_users").cast("long").alias("n"),
    )
    tr = TP.event_transitions(ev, tiebreak_col="event_id").select(
        F.lit("transition").alias("kind"),
        F.col("from_type").alias("k1"),
        F.col("to_type").alias("k2"),
        F.col("n_transitions").cast("long").alias("n"),
    )
    return per_user.unionByName(steps).unionByName(ret).unionByName(tr)


_EVENT_ANALYTICS_ORACLE = """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT s1.user_id, MIN(e.ts) AS t2
        FROM s1 JOIN events e
          ON e.user_id = s1.user_id
         AND e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY 1
    ),
    s3 AS (
        SELECT s2.user_id, MIN(e.ts) AS t3
        FROM s2 JOIN events e
          ON e.user_id = s2.user_id
         AND e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY 1
    ),
    fun AS (
        SELECT s1.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS reached
        FROM s1
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    ),
    coh AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS period
        FROM events
    ),
    ret AS (
        SELECT cohort,
               (date_diff('day', cohort, period) // 7) AS period_offset,
               COUNT(DISTINCT user_id) AS n_users
        FROM act JOIN coh USING (user_id)
        WHERE period >= cohort
        GROUP BY 1, 2
    ),
    seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    )
    SELECT 'funnel_user' AS kind, CAST(user_id AS VARCHAR) AS k1,
           '' AS k2, CAST(reached AS BIGINT) AS n
    FROM fun
    UNION ALL
    SELECT 'funnel_step', 'step_1', '', CAST(COUNT(*) AS BIGINT) FROM fun
    UNION ALL
    SELECT 'funnel_step', 'step_2', '',
           CAST(SUM(CASE WHEN reached >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    FROM fun
    UNION ALL
    SELECT 'funnel_step', 'step_3', '',
           CAST(SUM(CASE WHEN reached >= 3 THEN 1 ELSE 0 END) AS BIGINT)
    FROM fun
    UNION ALL
    SELECT 'retention', STRFTIME(cohort, '%Y-%m-%d'),
           CAST(period_offset AS VARCHAR), CAST(n_users AS BIGINT)
    FROM ret
    UNION ALL
    SELECT 'transition', from_type, to_type, CAST(COUNT(*) AS BIGINT)
    FROM seq WHERE to_type IS NOT NULL GROUP BY 2, 3
"""


def _q_revenue_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every windowed-analytics operator over the daily revenue series
    in one frame: trailing 7-day RANGE sum/avg, running cumulative, and
    lag()-based day-over-day delta/percent change.

    Every money column is emitted as BIGINT integer cents and every
    lag-derived NULL (the first row has no predecessor) is coalesced
    to 0: the r5 driver hash-fail was engine-default DECIMAL widths
    (Spark decimal(28,2) -> object Decimal vs DuckDB DECIMAL(38,2) ->
    float64) plus NaN-vs-typed-NULL in the normalizer, not values.
    """
    rolling = _q_rolling_revenue(spark, sf_dir)
    dod = _q_revenue_dod(spark, sf_dir).select("date", "delta", "pct_change_e4")
    joined = rolling.join(dod, "date")
    return joined.select(
        "date",
        F.expr("CAST(revenue * 100 AS BIGINT)").alias("revenue_c"),
        F.expr("CAST(revenue_7d_sum * 100 AS BIGINT)").alias(
            "revenue_7d_sum_c"
        ),
        "revenue_7d_avg_e4",
        F.expr("CAST(revenue_cumulative * 100 AS BIGINT)").alias(
            "revenue_cum_c"
        ),
        F.expr("COALESCE(CAST(delta * 100 AS BIGINT), 0)").alias("delta_c"),
        F.expr("CAST(COALESCE(pct_change_e4, 0) AS BIGINT)").alias(
            "pct_change_e4"
        ),
    )


_REVENUE_WINDOWS_ORACLE = f"""
    SELECT date,
           CAST(r.revenue * 100 AS BIGINT) AS revenue_c,
           CAST(r.revenue_7d_sum * 100 AS BIGINT) AS revenue_7d_sum_c,
           r.revenue_7d_avg_e4,
           CAST(r.revenue_cumulative * 100 AS BIGINT) AS revenue_cum_c,
           COALESCE(CAST(d.delta * 100 AS BIGINT), 0) AS delta_c,
           CAST(COALESCE(d.pct_change_e4, 0) AS BIGINT) AS pct_change_e4
    FROM ({_ROLLING_REVENUE_ORACLE}) r
    JOIN (SELECT date, delta, pct_change_e4 FROM ({_REVENUE_DOD_ORACLE})) d
      USING (date)
"""


# Fixed unigram-LM gate model (r10): tiny, hand-written, shared
# VERBATIM by the Spark encoder and the DuckDB oracle — the Viterbi DP
# is replicated in SQL (list lambdas; _unigram_gate_oracle_ids), so
# `unigram_encode(ids=True)` gets a full cross-engine hash check, not
# just a pytest oracle. ASCII pieces only (the testdata generator
# emits ASCII text, verified; lower() then agrees byte-for-byte across
# engines); distinct logprobs; common-English pieces so real document
# words exercise multi-char segmentation, with unknown chars hitting
# the reserved-id fallback on both sides.
_UNIGRAM_GATE_MODEL = {
    "format": "spark-graft-unigram/v1",
    "pieces": [
        "e", "t", "a", "o", "i", "n", "s", "r", "h", "l", "d", "c",
        "u", "m", "th", "he", "in", "er", "an", "re", "the", "ing",
        "ion", "and", "ed", "es",
    ],
    "logprobs_e6": [
        -2_000_000, -2_050_000, -2_100_000, -2_150_000, -2_200_000,
        -2_250_000, -2_300_000, -2_350_000, -2_400_000, -2_450_000,
        -2_500_000, -2_550_000, -2_600_000, -2_650_000, -3_100_000,
        -3_150_000, -3_200_000, -3_250_000, -3_300_000, -3_350_000,
        -3_900_000, -3_950_000, -4_000_000, -4_050_000, -3_400_000,
        -3_450_000,
    ],
    "lowercase": True,
    "max_piece_len": 3,
}


def _unigram_gate_oracle_ctes() -> str:
    """DuckDB twin of ``unigram_encode(ids=True)`` under the fixed gate
    model, as a chain of CTEs ending in ``uni(doc_id, chunk_text,
    n_tokens)``: ASCII-whitespace split (the segmenter's re.ASCII
    class), per-DISTINCT-word Viterbi DP as a RECURSIVE CTE carrying
    the (best, backptr) arrays — one recursion step per character —
    then a backward-walk recursion to pieces, the piece→id map with
    the reserved-unknown fallback, and per-doc reassembly in word
    order. Every float is derived e6/1e6 and summed in the same order
    as the Python DP, and the argmax tie-breaks to the first (lowest
    start) candidate on both engines, so the id streams hash equal.

    Why recursion and not list_reduce lambdas: DuckDB 1.0's nested
    list_reduce + lambda-capture path returns UNINITIALIZED memory at
    batch scale (reproduced: the same word segments differently via
    unnest, VALUES, a prepared param, and a table scan) — the
    recursive-CTE formulation stays on the well-tested path and
    verified exact on all 500 sf0.01 docs against the Python DP."""
    m = _UNIGRAM_GATE_MODEL
    pieces, lps = m["pieces"], m["logprobs_e6"]

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    logp_map = "MAP {" + ", ".join(
        f"{_q(p)}: CAST({lp} AS DOUBLE)/1e6" for p, lp in zip(pieces, lps)
    ) + "}"
    id_map = "MAP {" + ", ".join(
        f"{_q(p)}: {i}" for i, p in enumerate(pieces)
    ) + "}"
    L = int(m["max_piece_len"])
    oov = len(pieces)
    unk = repr(min(lp / 1e6 for lp in lps) - 10.0)
    return f"""
    uw0 AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                  '[ \\t\\n\\x0B\\f\\r]+'), w -> w != '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    uw1 AS (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wp
        FROM uw0
    ),
    uwordpos AS (
        SELECT doc_id, CAST(wp AS INT) AS wp, ws[wp] AS w FROM uw1
    ),
    uuw AS (SELECT DISTINCT w FROM uwordpos),
    udp(w, i, b, k) AS (
        SELECT w, 0, [CAST(0 AS DOUBLE)], [CAST(0 AS INT)] FROM uuw
        UNION ALL
        SELECT w, i, list_append(b, mx),
               list_append(k, CAST(lo + list_position(vals, mx) - 1
                                   AS INT))
        FROM (
            SELECT w, i, b, k, lo, vals,
                   list_aggregate(vals, 'max') AS mx
            FROM (
                SELECT w, i + 1 AS i, b, k,
                       greatest(0, i + 1 - {L}) AS lo,
                       list_transform(range(greatest(0, i + 1 - {L}),
                                            i + 1),
                         j -> b[j + 1] + CASE WHEN i + 1 - j = 1
                              THEN coalesce(
                                  ({logp_map}[w[j + 1 : i + 1]])[1],
                                  {unk})
                              ELSE ({logp_map}[w[j + 1 : i + 1]])[1]
                              END) AS vals
                FROM udp WHERE i < length(w)
            ) s1
        ) s2
    ),
    ufin AS (SELECT w, k FROM udp WHERE i = length(w)),
    uwalk(w, k, pos, ids) AS (
        SELECT w, k, CAST(length(w) AS INT), CAST([] AS INT[]) FROM ufin
        UNION ALL
        SELECT w, k, k[pos + 1],
               list_prepend(CAST(coalesce(
                   ({id_map}[w[k[pos + 1] + 1 : pos]])[1], {oov})
                   AS INT), ids)
        FROM uwalk WHERE pos > 0
    ),
    useg AS (SELECT w, ids FROM uwalk WHERE pos = 0),
    udocids AS (
        SELECT uwordpos.doc_id,
               flatten(list(useg.ids ORDER BY uwordpos.wp)) AS uids
        FROM uwordpos JOIN useg ON uwordpos.w = useg.w
        GROUP BY uwordpos.doc_id
    ),
    uni AS (
        SELECT uw0.doc_id, CAST(0 AS INT) AS chunk_idx,
               coalesce(array_to_string(udocids.uids, ','), '')
                   AS chunk_text,
               CAST(coalesce(len(udocids.uids), 0) AS INT) AS n_tokens,
               'unigram' AS tier
        FROM uw0 LEFT JOIN udocids ON uw0.doc_id = udocids.doc_id
    )"""


# Fixed WordPiece gate model (r11): the _UNIGRAM_GATE_MODEL pattern —
# tiny, hand-written, shared VERBATIM by the Spark encoder and the
# DuckDB oracle, so `wordpiece_encode(ids=True)` gets a full
# cross-engine hash check. All 26 singles in both position classes
# keep every ASCII word representable (the [UNK] path is pytest-
# covered); the multi-char pieces hit real testdata vocabulary
# ("hash", "window", "query", …) so greedy longest-match-first is
# exercised, not just char fallback.
_WORDPIECE_GATE_MODEL = {
    "format": "spark-graft-wordpiece/v1",
    "vocab": (
        ["[UNK]"]
        + list("abcdefghijklmnopqrstuvwxyz")
        + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
        + [
            "ha", "##sh", "jo", "##in", "qu", "##ery", "wind", "##ow",
            "##dow", "str", "##eam", "ta", "##ble", "th", "##he",
            "sc", "##an",
        ]
    ),
    "lowercase": True,
    "unk": "[UNK]",
    "max_input_chars_per_word": 100,
}


def _wordpiece_gate_oracle_ctes() -> str:
    """DuckDB twin of ``wordpiece_encode(ids=True)`` under the fixed
    gate model, ending in ``wp(doc_id, chunk_idx, chunk_text,
    n_tokens, tier)``: ASCII-whitespace split, then per-DISTINCT-word
    greedy longest-match-first (MaxMatch, the BERT rule) as a
    RECURSIVE CTE — each step probes candidate lengths DESCENDING
    against the piece→id map (continuations carry ``##``) and
    consumes the longest hit; a position with no hit (or a word over
    the 100-char bound, seeded directly) collapses the whole word to
    [UNK] id 0, exactly like the Python encoder. Greedy consumption
    is integer-only, so cross-engine agreement is structural — no
    float anywhere."""
    m = _WORDPIECE_GATE_MODEL

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    id_map = "MAP {" + ", ".join(
        f"{_q(p)}: {i}" for i, p in enumerate(m["vocab"])
    ) + "}"
    L = max(
        len(p[2:] if p.startswith("##") else p)
        for p in m["vocab"]
        if p != m["unk"]
    )
    maxw = int(m["max_input_chars_per_word"])
    return f"""
    ww0 AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                  '[ \\t\\n\\x0B\\f\\r]+'), w -> w != '') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    ww1 AS (
        SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wp
        FROM ww0
    ),
    wwordpos AS (
        SELECT doc_id, CAST(wp AS INT) AS wp, ws[wp] AS w FROM ww1
    ),
    wuw AS (SELECT DISTINCT w FROM wwordpos),
    wpdp(w, pos, ids) AS (
        SELECT w,
               CASE WHEN length(w) > {maxw}
                    THEN CAST(length(w) AS INT) ELSE 0 END,
               CASE WHEN length(w) > {maxw}
                    THEN [CAST(0 AS INT)] ELSE CAST([] AS INT[]) END
        FROM wuw
        UNION ALL
        SELECT w,
               CASE WHEN bl IS NULL THEN CAST(length(w) AS INT)
                    ELSE pos + CAST(bl AS INT) END,
               CASE WHEN bl IS NULL THEN [CAST(0 AS INT)]
                    ELSE list_append(ids, CAST(({id_map}[
                        (CASE WHEN pos > 0 THEN '##' ELSE '' END)
                        || w[pos + 1 : pos + CAST(bl AS INT)]])[1]
                        AS INT)) END
        FROM (
            SELECT w, pos, ids,
                   (list_filter(
                        range(least({L}, length(w) - pos), 0, -1),
                        l -> len({id_map}[
                            (CASE WHEN pos > 0 THEN '##' ELSE '' END)
                            || w[pos + 1 : pos + l]]) > 0))[1] AS bl
            FROM wpdp WHERE pos < length(w)
        ) s1
    ),
    wseg AS (SELECT w, ids FROM wpdp WHERE pos = length(w)),
    wdocids AS (
        SELECT wwordpos.doc_id,
               flatten(list(wseg.ids ORDER BY wwordpos.wp)) AS wids
        FROM wwordpos JOIN wseg ON wwordpos.w = wseg.w
        GROUP BY wwordpos.doc_id
    ),
    wp AS (
        SELECT ww0.doc_id, CAST(0 AS INT) AS chunk_idx,
               coalesce(array_to_string(wdocids.wids, ','), '')
                   AS chunk_text,
               CAST(coalesce(len(wdocids.wids), 0) AS INT) AS n_tokens,
               'wordpiece' AS tier
        FROM ww0 LEFT JOIN wdocids ON ww0.doc_id = wdocids.doc_id
    )"""


def _q_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunking (row-level oracle) + sequence-packing invariants in one
    frame, FOUR hash-checked tiers: tier='text' is whitespace chunking
    (`chunk_documents`), tier='ids' is the r9 exact tokenizer-id
    chunking (`chunk_token_ids`, chunk=8/overlap=3 so the stride path
    is exercised) over a synthetic id array both engines derive
    identically (sequence 0..n_chars%37) — id chunks serialize to CSV
    strings so the tiers share one schema — and tier='unigram' (r10)
    is the REAL `unigram_encode(ids=True)` under the fixed
    `_UNIGRAM_GATE_MODEL`, hash-checked against a full Viterbi DP
    replicated in DuckDB SQL; tier='wordpiece' (r11) is the REAL
    `wordpiece_encode(ids=True)` under the fixed
    `_WORDPIECE_GATE_MODEL`, hash-checked against a greedy MaxMatch
    recursion replicated in DuckDB SQL. The packing contract (token
    conservation, budget ceiling, fill floor) is appended as constant
    columns; pack ids depend on the shard hash, so only the contract
    is checkable."""
    docs = table(spark, sf_dir, "documents")
    chunks = CH.chunk_documents(docs, chunk_tokens=32)
    packed = CH.pack_sequences(chunks, budget_tokens=256, num_shards=16)
    fills = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill"))
    inv = fills.agg(
        F.sum("fill").cast("long").alias("total_tokens"),
        (F.max("fill") <= F.lit(256)).alias("packs_within_budget"),
        (F.avg("fill") >= F.lit(128.0)).alias("fill_floor_ok"),
    ).collect()[0]
    text_tier = chunks.select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens",
        F.lit("text").alias("tier"),
    )
    ids_df = docs.select(
        "doc_id",
        F.sequence(
            F.lit(0), (F.coalesce(F.col("n_chars"), F.lit(0)) % 37).cast("int")
        ).alias("tok_ids"),
    )
    ids_tier = CH.chunk_token_ids(
        ids_df, ids_col="tok_ids", chunk_tokens=8, overlap=3
    ).select(
        "doc_id", "chunk_idx",
        F.array_join("ids", ",").alias("chunk_text"), "n_tokens",
        F.lit("ids").alias("tier"),
    )
    uni_tier = T.unigram_encode(
        docs.where(F.col("text").isNotNull()).select("doc_id", "text"),
        _UNIGRAM_GATE_MODEL, ids=True,
    ).select(
        "doc_id",
        F.lit(0).alias("chunk_idx"),
        F.array_join(
            F.col("unigram_tokens").cast("array<string>"), ","
        ).alias("chunk_text"),
        F.size("unigram_tokens").alias("n_tokens"),
        F.lit("unigram").alias("tier"),
    )
    wp_tier = T.wordpiece_encode(
        docs.where(F.col("text").isNotNull()).select("doc_id", "text"),
        _WORDPIECE_GATE_MODEL, ids=True,
    ).select(
        "doc_id",
        F.lit(0).alias("chunk_idx"),
        F.array_join(
            F.col("wp_tokens").cast("array<string>"), ","
        ).alias("chunk_text"),
        F.size("wp_tokens").alias("n_tokens"),
        F.lit("wordpiece").alias("tier"),
    )
    return (
        text_tier.unionByName(ids_tier).unionByName(uni_tier)
        .unionByName(wp_tier)
        .withColumn(
            "total_tokens", F.lit(inv["total_tokens"]).cast("long")
        )
        .withColumn(
            "packs_within_budget", F.lit(bool(inv["packs_within_budget"]))
        )
        .withColumn("fill_floor_ok", F.lit(bool(inv["fill_floor_ok"])))
    )


_CHUNK_PACK_ORACLE = f"""
    WITH RECURSIVE ch0 AS ({_CHUNK_DOCUMENTS_ORACLE}),
    ch AS (
        SELECT doc_id, chunk_idx, chunk_text, n_tokens,
               'text' AS tier
        FROM ch0
    ),
    tid0 AS (
        SELECT doc_id,
               range(0, (COALESCE(n_chars, 0) % 37) + 1) AS ids
        FROM documents
    ),
    tid1 AS (
        SELECT doc_id, ids, len(ids) AS n,
               unnest(generate_series(0,
                   GREATEST(CAST(CEIL((len(ids) - 3) / 5.0) AS INT),
                            1) - 1)) AS ci
        FROM tid0
    ),
    tid AS (
        SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
               array_to_string(
                   list_slice(ids, ci * 5 + 1, ci * 5 + 8), ',')
                   AS chunk_text,
               CAST(LEAST(8, n - ci * 5) AS INT) AS n_tokens,
               'ids' AS tier
        FROM tid1
    ),
    {_unigram_gate_oracle_ctes()},
    {_wordpiece_gate_oracle_ctes()},
    both_tiers AS (
        SELECT * FROM ch UNION ALL SELECT * FROM tid
        UNION ALL SELECT * FROM uni
        UNION ALL SELECT * FROM wp
    ),
    inv AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               TRUE AS packs_within_budget, TRUE AS fill_floor_ok
        FROM ch0
    )
    SELECT both_tiers.*, inv.* FROM both_tiers CROSS JOIN inv
"""


# pg_trgm analog (reference: database-schema.sql:5,64 — trigram GIN
# index on products.name). Fixed typo query: "smal ring" is a
# misspelling of the testdata product name "small ring".
_FUZZY_QUERY = "smal ring"


def _q_fuzzy_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant product-name lookup via trigram Jaccard — the
    Spark analog of the reference's pg_trgm index on products.name."""
    return T.fuzzy_name_search(
        table(spark, sf_dir, "part"), _FUZZY_QUERY, k=20, min_sim_e4=500
    )


_FUZZY_NAME_SEARCH_ORACLE = T.fuzzy_name_search_oracle(
    _FUZZY_QUERY, k=20, min_sim_e4=500
)


def _q_streaming_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tier under the driver's gate: run the windowed
    event aggregation as an ACTUAL Structured Streaming query
    (file source → watermark → tumbling window → complete-mode
    foreachBatch) and hash-compare its final state against a plain SQL
    oracle. pytest checks stream-vs-batch parity; this entry makes the
    driver — not just CI — guard that the streaming engine produces
    the same numbers as batch SQL.

    The staged source is a single file so the run is one deterministic
    micro-batch (no cross-batch watermark ordering effects); the
    multi-batch path is covered by tests/test_streaming.py.
    """
    import shutil
    import tempfile

    from etl_workflow_spark.catalog import events_table
    from etl_workflow_spark.streaming import incremental as inc

    tmp = tempfile.mkdtemp(prefix="stream_gate_")
    try:
        src = os.path.join(tmp, "events_in")
        events_table(spark, sf_dir).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        static = spark.read.parquet(src)

        stream = inc.file_stream_events(spark, src, static.schema)
        agg = inc.windowed_event_counts(stream)
        final: list = []

        def keep_last(df: DataFrame, _bid: int) -> None:
            final[:] = df.collect()

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(keep_last)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        # a False return means the query is still mid-batch: `final`
        # would be empty/partial and the gate would report a spurious
        # hash mismatch instead of the real problem — fail loudly
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "streaming_parity query did not finish within 300s"
            )
        return spark.createDataFrame(final, schema=agg.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_STREAMING_PARITY_ORACLE = """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
"""


def _q_lang_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix dashboard: the per-language corpus funnel — docs,
    quality-pass count, pass rate, and token budget per predicted
    language, over the FUSED one-scan ``text_profile`` (lang-id +
    quality + token count in a single projection: one corpus pass,
    zero joins, where three separate operators would scan three times).
    The pass rate is integer fixed-point (1e-4) so the cross-engine
    hash has no float edge.
    """
    docs = table(spark, sf_dir, "documents")
    agg = (
        T.text_profile(docs)
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("passes_quality"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    return agg.select(
        "lang_pred",
        "n_docs",
        "n_pass",
        "total_tokens",
        F.expr("CAST((n_pass * 10000) DIV n_docs AS BIGINT)").alias(
            "pass_rate_e4"
        ),
    )


_LANG_QUALITY_ROLLUP_ORACLE = f"""
    WITH lang AS ({T.lang_id_oracle()}),
         q AS ({T.text_quality_oracle()}),
         c AS ({T.token_count_oracle()}),
         agg AS (
             SELECT lang.lang_pred,
                    COUNT(*) AS n_docs,
                    CAST(SUM(CASE WHEN q.passes_quality THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_pass,
                    CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens
             FROM lang JOIN q USING (doc_id) JOIN c USING (doc_id)
             GROUP BY 1
         )
    SELECT lang_pred, n_docs, n_pass, total_tokens,
           CAST((n_pass * 10000) // n_docs AS BIGINT) AS pass_rate_e4
    FROM agg
"""


# --------------------------------------------------------------------------
# Contract functions
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1) on sf0.001: topSellingProductsByCategory."""
    return Q.top_selling_by_category(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # 50 entries — the driver's correctness harness checks the first
    # 50, so EVERY entry sits inside the verified window (enforced by
    # the assert below; to add an operator, CONSOLIDATE related ones
    # into a merged entry instead of growing the dict). Each merged
    # entry's docstring names the operators it covers.
    out = {
        # -- reference analytics queries (app.py) --------------------------
        "product_sales": lambda s, d: Q.product_sales(s, d),
        "top_selling": _q_top_selling,
        "customer_purchase_history": lambda s, d: Q.customer_purchase_history(
            s, d, customer_id=1, offset=2, limit=10
        ),
        "sales_trends": _q_sales_trends_all,
        # C10 point lookup (app.py:212): dim row fetch after the mutation
        "category_lookup": lambda s, d: table(s, d, "part")
        .where(F.col("p_partkey") == 42)
        .select(
            F.col("p_partkey").alias("product_id"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("category_name"),
        ),
        # -- ETL transforms & derived relations (workflow.py / schema.sql) -
        "order_items_transform": _q_order_items_transform,
        "daily_sales_aggregation": _q_daily_sales_agg,
        "lifetime_value": _q_lifetime_value,
        "customer_purchase_summary": _q_customer_purchase_summary,
        "product_sales_summary": _q_product_sales_summary,
        "dim_time": lambda s, d: dim_time_frame(s, "1995-01-01", "1996-12-31"),
        "update_product": _q_update_product,
        "orders_semijoin": _q_orders_semijoin,
        "pipeline_e2e": _q_pipeline_e2e,
        "incremental_slice": _q_incremental_slice,
        # -- LLM-pipeline operators (north-star extensions) ----------------
        "text_metrics": _q_text_metrics,
        "text_identity": _q_text_identity,
        "text_safety": _q_text_safety,
        "term_stats": _q_term_stats,
        "embedding_centroids": lambda s, d: S.group_centroids(
            table(s, d, "embeddings")
        ),
        "sampling_splits": _q_sampling_splits,
        # consolidated: exact_dedup + dedup_paragraphs (value-level)
        "dedup_recipes": _q_dedup_recipes,
        "dedup_ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_minhash": _q_dedup_minhash,
        "simhash_neardup": _q_simhash_neardup,
        "quality_filtered_stats": _q_quality_filtered_stats,
        "ann_topk": _q_ann_topk,
        "embedding_neardup": _q_embedding_neardup_all,
        "multimodal": _q_multimodal,
        "chunk_pack": _q_chunk_pack,
        # -- events / temporal / windowed analytics ------------------------
        "events_windowed": _q_events_windowed,
        "sessionize": _q_sessionize,
        "asof_attribution": _q_asof_attribution,
        "interval_join_sessions": _q_interval_join,
        "events_type_stats": _q_events_type_stats,
        "events_pivot": _q_events_pivot,
        # consolidated: funnel (+step counts), retention, transitions
        "event_analytics": _q_event_analytics,
        "revenue_windows": _q_revenue_windows,
        "revenue_rollup": _q_revenue_rollup,
        "top_per_brand": _q_top_per_brand,
        "customer_quartiles": _q_customer_quartiles,
        # -- SQL surface / data quality / misc contracts -------------------
        "sql_interface": _q_sql_interface,
        "profile_orders": _q_profile_orders,
        # constraint_checks also carries the lapsed-customer anti-join
        # (formerly customers_without_orders) and the order-value
        # histogram (formerly order_value_histogram)
        "constraint_checks": _q_constraint_checks,
        # consolidated txn surface: create/append/merge/delete under
        # the DuckDB oracle (final-snapshot equality)
        "txn_mutations": _q_txn_mutations,
        "stats_contract": _q_stats_contract,
        # -- round-5 additions: pg_trgm analog + driver-gated streaming ----
        "fuzzy_name_search": _q_fuzzy_name_search,
        "streaming_parity": _q_streaming_parity,
        "lang_quality_rollup": _q_lang_quality_rollup,
    }
    assert len(out) <= 50, (
        f"{len(out)} gate entries exceed the driver's 50-entry verified "
        "window — consolidate related operators instead of appending"
    )
    return out


def oracle_sql() -> dict[str, str]:
    return {
        "product_sales": Q.product_sales_oracle(),
        "top_selling": _TOP_SELLING_ORACLE,
        "customer_purchase_history": Q.customer_purchase_history_oracle(
            customer_id=1, offset=2, limit=10
        ),
        "sales_trends": _SALES_TRENDS_ALL_ORACLE,
        "category_lookup": """
            SELECT p_partkey AS product_id, p_name AS name,
                   p_brand AS category_name
            FROM part WHERE p_partkey = 42
        """,
        "order_items_transform": _ORDER_ITEMS_TRANSFORM_ORACLE,
        "daily_sales_aggregation": _DAILY_SALES_ORACLE,
        "lifetime_value": _LIFETIME_VALUE_ORACLE,
        "customer_purchase_summary": _CUSTOMER_SUMMARY_ORACLE,
        "product_sales_summary": _PRODUCT_SUMMARY_ORACLE,
        "dim_time": dim_time_oracle("1995-01-01", "1996-12-31"),
        "update_product": _UPDATE_PRODUCT_ORACLE,
        "orders_semijoin": _ORDERS_SEMIJOIN_ORACLE,
        "pipeline_e2e": _PIPELINE_E2E_ORACLE,
        "incremental_slice": _INCREMENTAL_SLICE_ORACLE,
        "text_metrics": _TEXT_METRICS_ORACLE,
        "text_identity": _TEXT_IDENTITY_ORACLE,
        "text_safety": _TEXT_SAFETY_ORACLE,
        "term_stats": _TERM_STATS_ORACLE,
        "embedding_centroids": S.group_centroids_oracle(),
        "sampling_splits": _sampling_splits_oracle(),
        "dedup_recipes": _DEDUP_RECIPES_ORACLE,
        "dedup_ngram_jaccard": D.ngram_jaccard_oracle(threshold=0.5),
        "dedup_clusters": _DEDUP_CLUSTERS_ORACLE,
        "dedup_minhash": _DEDUP_MINHASH_ORACLE,
        "simhash_neardup": _SIMHASH_NEARDUP_ORACLE,
        "quality_filtered_stats": f"""
            WITH q AS ({T.text_quality_oracle()}),
                 c AS ({T.token_count_oracle()}),
                 t AS (
                     SELECT doc_id,
                            (CAST(len(list_filter({T._sql_tokens('text')},
                                 w -> lower(w) IN ({_STOP_LIST_SQL})))
                                  AS BIGINT)
                             * 1000000)
                            // len({T._sql_tokens('text')}) AS ssr_e6
                     FROM documents
                 ),
                 s AS (
                     -- Explicit BIGINT: DuckDB's uncast SUM yields
                     -- HUGEINT which pandas widens to float64 while
                     -- Spark emits int64 — the r5 driver hash-fail.
                     SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                            CAST(SUM(c.n_tokens) AS BIGINT)
                                AS total_tokens,
                            CAST(SUM(t.ssr_e6) AS BIGINT) AS ssr_e6
                     FROM q JOIN c USING (doc_id) JOIN t USING (doc_id)
                     WHERE q.passes_quality
                 )
            SELECT n_docs, total_tokens,
                   CAST((total_tokens * 10000) // n_docs AS BIGINT)
                       AS avg_tokens_e4,
                   CAST(ssr_e6 AS BIGINT) AS sum_stopword_ratio_e6
            FROM s
        """,
        "ann_topk": _ANN_TOPK_ORACLE,
        "embedding_neardup": _EMBEDDING_NEARDUP_ORACLE,
        "multimodal": _MULTIMODAL_ORACLE,
        "chunk_pack": _CHUNK_PACK_ORACLE,
        "events_windowed": _EVENTS_WINDOWED_ORACLE,
        "sessionize": _SESSIONIZE_ORACLE,
        "asof_attribution": _ASOF_ATTRIBUTION_ORACLE,
        "interval_join_sessions": _INTERVAL_JOIN_ORACLE,
        "events_type_stats": _EVENTS_TYPE_STATS_ORACLE,
        "events_pivot": _EVENTS_PIVOT_ORACLE,
        "event_analytics": _EVENT_ANALYTICS_ORACLE,
        "revenue_windows": _REVENUE_WINDOWS_ORACLE,
        "revenue_rollup": _REVENUE_ROLLUP_ORACLE,
        "top_per_brand": _TOP_PER_BRAND_ORACLE,
        "customer_quartiles": _CUSTOMER_QUARTILES_ORACLE,
        "sql_interface": _SQL_REVENUE_BY_PRIORITY,
        "profile_orders": _PROFILE_ORDERS_ORACLE,
        "constraint_checks": _CONSTRAINT_CHECKS_ORACLE,
        "txn_mutations": _TXN_MUTATIONS_ORACLE,
        "stats_contract": _STATS_CONTRACT_ORACLE,
        "fuzzy_name_search": _FUZZY_NAME_SEARCH_ORACLE,
        "streaming_parity": _STREAMING_PARITY_ORACLE,
        "lang_quality_rollup": _LANG_QUALITY_ROLLUP_ORACLE,
    }
