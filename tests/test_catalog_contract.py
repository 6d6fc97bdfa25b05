"""Testdata schema contract — the early-warning tripwire for
environment drift.

Round 4 lost a gate entry, three tests, and the whole benchmark to ONE
silent physical-type shift (events.ts arrived as TIMESTAMP_NTZ where
the nanos-as-long bigint shape was expected). This test asserts the
POST-NORMALIZATION contract every operator relies on, so the next
driver-side testdata regeneration that changes physical types fails
here, by name, instead of cascading into operator AnalysisExceptions.

Assertions are deliberately tolerant: they pin what operators need
(temporal-ness, numeric-ness, the LTZ guarantee on events.ts), not the
exact physical type, which may legitimately vary by writer version.
"""

from __future__ import annotations

from etl_workflow_spark.catalog import load_tables

TEMPORAL = {"timestamp", "timestamp_ntz", "date"}
INTEGRAL = {"int", "bigint", "smallint"}
NUMERIC = INTEGRAL | {"double", "float"} | set()


def _is_numeric(dt: str) -> bool:
    return dt in NUMERIC or dt.startswith("decimal")


def test_testdata_schema_contract(spark, sf_dir):
    t = {name: dict(df.dtypes) for name, df in load_tables(spark, sf_dir).items()}

    # the round-4 lesson: events.ts must come out of the catalog as
    # TIMESTAMP_LTZ — withWatermark/unix_micros/window reject NTZ
    assert t["events"]["ts"] == "timestamp"
    assert t["events"]["event_id"] in INTEGRAL
    assert t["events"]["user_id"] in INTEGRAL
    assert _is_numeric(t["events"]["value"])
    assert t["events"]["props"] == "string"

    # date-bearing fact columns must be temporal (to_date/date_trunc
    # accept any of these; a string or epoch-int here breaks queries)
    assert t["orders"]["o_orderdate"] in TEMPORAL
    assert t["lineitem"]["l_shipdate"] in TEMPORAL

    # money/measure columns numeric (queries cast to DECIMAL on top)
    for tbl, col in (
        ("orders", "o_totalprice"),
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_quantity"),
        ("part", "p_retailprice"),
        ("customer", "c_acctbal"),
    ):
        assert _is_numeric(t[tbl][col]), (tbl, col, t[tbl][col])

    # join keys integral on both sides
    for tbl, col in (
        ("orders", "o_orderkey"),
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
    ):
        assert t[tbl][col] in INTEGRAL, (tbl, col, t[tbl][col])

    # LLM-pipeline tables
    assert t["documents"]["doc_id"] in INTEGRAL
    assert t["documents"]["text"] == "string"
    assert t["embeddings"]["vec_id"] in INTEGRAL
    assert t["embeddings"]["embedding"] in {"array<float>", "array<double>"}


def test_register_txn_table_pins_snapshot_for_sql(spark, tmp_path):
    from etl_workflow_spark.catalog import register_txn_table
    from etl_workflow_spark.sources import txn

    path = str(tmp_path / "t")
    txn.txn_create(
        spark, path, spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    )
    register_txn_table(spark, "txn_sql_t", path)
    assert spark.sql(
        "SELECT sum(v) AS s FROM txn_sql_t"
    ).collect()[0].s == 30
    # a later commit must NOT leak into the registered view
    txn.txn_merge_into(
        spark, path, spark.createDataFrame([(3, 70)], ["id", "v"]), ["id"]
    )
    assert spark.sql(
        "SELECT sum(v) AS s FROM txn_sql_t"
    ).collect()[0].s == 30
    # re-register moves forward; version= pins time travel
    register_txn_table(spark, "txn_sql_t", path)
    assert spark.sql(
        "SELECT sum(v) AS s FROM txn_sql_t"
    ).collect()[0].s == 100
    register_txn_table(spark, "txn_sql_t_v1", path, version=1)
    assert spark.sql(
        "SELECT count(*) AS c FROM txn_sql_t_v1"
    ).collect()[0].c == 2
