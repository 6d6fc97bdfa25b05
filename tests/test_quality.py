from etl_workflow_spark.operators.quality import (
    expect_non_null,
    expect_subset,
    expect_unique,
    profile_table,
    run_checks,
)


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (2, None, 30.0)],
        ["k", "s", "v"],
    )
    got = {r["col_name"]: r for r in profile_table(df).collect()}
    assert got["k"]["n"] == 3 and got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["s"]["n_null"] == 1
    assert got["s"]["min_num"] is None  # non-numeric: no range
    assert got["v"]["n_null"] == 1 and got["v"]["max_num"] == 30.0


def test_constraint_checks_count_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 99), (3, None)], ["id", "fk"]
    )
    parent = spark.createDataFrame([(10,), (20,)], ["pk"])
    report = {
        r["check_name"]: r["n_violations"]
        for r in run_checks(
            expect_unique(child, ["id"], "child_pk_unique"),
            expect_subset(child, "fk", parent, "pk", "child_fk_parent"),
            expect_non_null(child, "fk", "fk_not_null"),
        ).collect()
    }
    # one duplicated id; one orphan (99) — null fk is NOT an orphan;
    # one null fk for the non-null check
    assert report == {
        "child_pk_unique": 1,
        "child_fk_parent": 1,
        "fk_not_null": 1,
    }
