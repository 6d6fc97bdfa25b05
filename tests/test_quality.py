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


# ------------------------------------------------------- web-corpus prep


def test_strip_html_blocks_tags_entities(spark):
    from etl_workflow_spark.operators.text import strip_html

    docs = spark.createDataFrame(
        [
            (1, "<html><head><style>p {color:red}</style>"
                "<script type='x'>var a=1;\nalert(a)</script></head>"
                "<body><p>Hello <b>world</b>!</p>"
                "<!-- hidden\ncomment --><div>Tom &amp; Jerry "
                "&lt;3&gt; &quot;quoted&quot;&nbsp;end</div></body></html>"),
            (2, "plain text stays"),
            (3, "broken <tag never closes"),
            (4, "&amp;lt; stays escaped-once"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.text for r in strip_html(docs).collect()}
    assert got[1] == 'Hello world ! Tom & Jerry <3> "quoted" end'
    assert got[2] == "plain text stays"
    assert got[3] == "broken <tag never closes" or got[3] == "broken"
    # double-escaped input unescapes exactly one level
    assert got[4] == "&lt; stays escaped-once"


def test_filter_by_domain_subdomains_and_exact(spark):
    from etl_workflow_spark.operators.text import filter_by_domain

    docs = spark.createDataFrame(
        [
            (1, "https://www.spam.example/page"),
            (2, "http://cdn.spam.example/x?y=1"),
            (3, "https://good.example/ok"),
            (4, "https://spamexample.net/ok"),  # not a suffix match
            (5, "https://sub.deep.good.example/ok"),
        ],
        ["doc_id", "url"],
    )
    block = spark.createDataFrame([("spam.example",)], ["domain"])

    kept = sorted(
        r.doc_id for r in filter_by_domain(docs, block).collect()
    )
    assert kept == [3, 4, 5]

    kept_exact = sorted(
        r.doc_id
        for r in filter_by_domain(
            docs, block, include_subdomains=False
        ).collect()
    )
    # www. strips, so doc 1 is exact-blocked; cdn. is not
    assert kept_exact == [2, 3, 4, 5]


def test_filter_by_domain_requires_explicit_id(spark):
    """The subdomain path anti-joins on id_col — a missing id column
    raises instead of guessing by position (a url-first schema would
    silently over-delete)."""
    import pytest

    from etl_workflow_spark.operators.text import filter_by_domain

    block = spark.createDataFrame([("spam.example",)], ["domain"])
    no_id = spark.createDataFrame(
        [("https://spam.example/a", "x")], ["url", "payload"]
    )
    with pytest.raises(ValueError, match="doc_id"):
        filter_by_domain(no_id, block)

    # url-first column order with an explicit id_col: only the blocked
    # row drops, even though another row shares its first-column value
    docs = spark.createDataFrame(
        [
            ("https://spam.example/a", 1),
            ("https://spam.example/a".replace("spam", "good"), 2),
        ],
        ["url", "my_id"],
    )
    kept = filter_by_domain(docs, block, id_col="my_id").collect()
    assert [r.my_id for r in kept] == [2]
