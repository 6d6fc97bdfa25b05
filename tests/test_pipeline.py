"""End-to-end pipeline + writer semantics tests (tiny synthetic CSVs —
unit fixtures only; the oracle gate runs on the driver's testdata)."""

from __future__ import annotations

import os

import pytest

from etl_workflow_spark import pipeline as P
from etl_workflow_spark.sources import writers


CSV_DATA = {
    "product_categories": (
        "category_id,name,description,parent_id,created_at\n"
        "1,Electronics,Desc,,2021-01-01 00:00:00\n"
        "2,Phones,Desc,1,2021-01-01 00:00:00\n"
    ),
    "products": (
        "product_id,name,description,price,cost,category_id,sku,"
        "inventory_count,weight,created_at,is_active\n"
        "1,Widget,Desc,10.00,5.00,1,SKU-1,5,1.0,2021-01-01 00:00:00,true\n"
        "2,Gadget,Desc,20.00,8.00,2,SKU-2,3,2.0,2021-01-01 00:00:00,true\n"
    ),
    "customers": (
        "customer_id,email,first_name,last_name,street_address,city,state,"
        "zip_code,country,phone,registration_date,last_login\n"
        "1,a@x.com,Ann,Lee,1 St,Town,TX,111,US,555,2021-01-01 00:00:00,"
        "2021-06-01 00:00:00\n"
        "2,b@x.com,Bob,Day,2 St,Town,TX,222,US,556,2021-02-01 00:00:00,\n"
    ),
    "orders": (
        "order_id,customer_id,order_date,status,payment_method,"
        "shipping_address,shipping_city,shipping_state,shipping_zip,"
        "shipping_country,processing_date,shipping_date,delivery_date,"
        "total_amount\n"
        "1,1,2021-03-01 10:00:00,Delivered,PayPal,1 St,Town,TX,111,US,,,,"
        "19.00\n"
        "2,1,2021-03-05 11:00:00,Cancelled,PayPal,1 St,Town,TX,111,US,,,,"
        "20.00\n"
    ),
    "order_items": (
        "order_item_id,order_id,product_id,quantity,price,discount,total\n"
        "1,1,1,2,10.00,1.00,0.00\n"
        "2,2,2,1,20.00,0.00,20.00\n"
    ),
}


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    input_dir = tmp_path_factory.mktemp("raw")
    warehouse = tmp_path_factory.mktemp("warehouse")
    for name, content in CSV_DATA.items():
        (input_dir / f"{name}.csv").write_text(content)
    return str(input_dir), str(warehouse)


def test_pipeline_end_to_end(spark, pipeline_dirs):
    input_dir, warehouse = pipeline_dirs
    res = P.run_pipeline(spark, input_dir, warehouse)
    assert res.rows_loaded == {
        "product_categories": 2,
        "products": 2,
        "customers": 2,
        "orders": 2,
        "order_items": 2,
    }
    # quirk Q6: item 1 total recomputed 2*10-1=19, item 2 stays 20.
    items = spark.read.parquet(os.path.join(warehouse, "order_items"))
    totals = {r["order_item_id"]: float(r["total"]) for r in items.collect()}
    assert totals == {1: 19.0, 2: 20.0}
    # quirk Q7: LV includes the cancelled order (19+20=39 for cust 1, 0 for 2).
    cust = spark.read.parquet(os.path.join(warehouse, "customers"))
    lv = {r["customer_id"]: float(r["lifetime_value"]) for r in cust.collect()}
    assert lv == {1: 39.0, 2: 0.0}
    # dim_time regenerated at reference cardinality.
    assert spark.read.parquet(os.path.join(warehouse, "dim_time")).count() == 1826
    # daily agg partitioned by date; cancelled order still counted
    # (the ETL-side daily agg has no status filter, workflow.py:151-184).
    daily = spark.read.parquet(os.path.join(warehouse, "daily_sales_aggregation"))
    assert daily.count() == 2
    # matview exists with the status exclusion applied (only order 1).
    summary = spark.read.parquet(os.path.join(warehouse, "product_sales_summary"))
    rows = summary.collect()
    assert len(rows) == 1 and rows[0]["product_id"] == 1


def test_pipeline_rerun_is_idempotent(spark, pipeline_dirs):
    input_dir, warehouse = pipeline_dirs
    res2 = P.run_pipeline(spark, input_dir, warehouse)
    # ON CONFLICT DO NOTHING parity: second run appends nothing.
    assert res2.rows_loaded["products"] == 0
    assert res2.rows_loaded["customers"] == 0
    assert res2.rows_loaded["order_items"] == 0
    items = spark.read.parquet(os.path.join(warehouse, "order_items"))
    assert items.count() == 2


def test_idempotent_append_existing_wins(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "original"), (2, "two")], ["id", "v"])
    assert writers.idempotent_append(spark, df1, path, ["id"]) == 2
    df2 = spark.createDataFrame([(1, "changed"), (3, "three")], ["id", "v"])
    assert writers.idempotent_append(spark, df2, path, ["id"]) == 1
    out = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert out == {1: "original", 2: "two", 3: "three"}  # existing wins


def test_update_rows_semantics(spark, tmp_path):
    path = str(tmp_path / "u")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], ["id", "name", "price"]
    ).write.parquet(path)
    with pytest.raises(ValueError):
        writers.update_rows(spark, path, "id", 1, {})
    assert writers.update_rows(spark, path, "id", 99, {"name": "x"}) == 0
    assert writers.update_rows(spark, path, "id", 1, {"name": "x"}) == 1
    out = {r["id"]: r for r in spark.read.parquet(path).collect()}
    assert out[1]["name"] == "x" and out[1]["updated_at"] is not None
    assert out[2]["name"] == "b" and out[2]["updated_at"] is None


def test_update_rows_swap_cleans_up_and_tolerates_stale_old(spark, tmp_path):
    """The rename-swap must clear a stale ._old left by a prior crash and
    leave neither ._old nor ._staged behind on success."""
    import os

    path = str(tmp_path / "u2")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(path)
    # simulate debris from a crashed previous swap
    stale = path + "._old"
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as fh:
        fh.write("x")
    assert writers.update_rows(spark, path, "id", 1, {"name": "z"}) == 1
    assert not os.path.exists(path + "._old")
    assert not os.path.exists(path + "._staged")
    out = spark.read.parquet(path).collect()
    assert out[0]["name"] == "z"


def test_overwrite_partitions_only_touches_incoming(spark, tmp_path):
    path = str(tmp_path / "p")
    import datetime

    d1, d2 = datetime.date(2023, 1, 1), datetime.date(2023, 1, 2)
    spark.createDataFrame(
        [(d1, 1, 10.0), (d2, 2, 20.0)], ["date", "k", "v"]
    ).write.partitionBy("date").parquet(path)
    # Overwrite only d2's slice with new content (J2 semantics).
    newer = spark.createDataFrame([(d2, 9, 99.0)], ["date", "k", "v"])
    writers.overwrite_partitions(spark, newer, path)
    out = sorted(
        (r["date"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert out == [(d1, 1, 10.0), (d2, 9, 99.0)]

def test_update_rows_partitioned_touches_only_affected_partition(spark, tmp_path):
    """J1 at scale: the key's partition is rewritten, other partitions'
    files are left physically untouched."""
    import datetime as dt
    import glob

    from etl_workflow_spark.sources import writers

    path = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [
            (1, dt.date(2023, 1, 1), "a"),
            (2, dt.date(2023, 1, 1), "b"),
            (3, dt.date(2023, 1, 2), "c"),
        ],
        ["id", "date", "name"],
    )
    writers.write_partitioned(df, path, "date")
    untouched = sorted(glob.glob(f"{path}/date=2023-01-02/*.parquet"))

    assert (
        writers.update_rows_partitioned(spark, path, "date", "id", 2, {"name": "B"})
        == 1
    )
    assert writers.update_rows_partitioned(
        spark, path, "date", "id", 99, {"name": "x"}
    ) == 0

    got = {r["id"]: r["name"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # other partition: same physical files (never read-modified-written)
    assert sorted(glob.glob(f"{path}/date=2023-01-02/*.parquet")) == untouched


def test_merge_into_unpartitioned_upsert(spark, tmp_path):
    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["id", "name", "v"]
    ).write.parquet(path)

    src = spark.createDataFrame(
        [(2, "b2", 99), (3, "c", 30)], ["id", "name", "v"]
    )
    updated, inserted = writers.merge_into(spark, path, src, ["id"])
    assert (updated, inserted) == (1, 1)
    got = {r["id"]: (r["name"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30)}


def test_merge_into_creates_missing_target(spark, tmp_path):
    path = str(tmp_path / "fresh")
    src = spark.createDataFrame([(1, "a")], ["id", "name"])
    assert writers.merge_into(spark, path, src, ["id"]) == (0, 1)
    assert spark.read.parquet(path).count() == 1


def test_merge_into_partitioned_rewrites_only_affected(spark, tmp_path):
    import glob

    path = str(tmp_path / "fact")
    target = spark.createDataFrame(
        [(1, "2024-01", 10), (2, "2024-01", 20), (3, "2024-02", 30),
         (4, "2024-03", 40)],
        ["id", "month", "v"],
    )
    target.write.partitionBy("month").parquet(path)
    before = set(glob.glob(os.path.join(path, "month=2024-03", "*.parquet")))

    # update id=2 in place, insert id=5 into 2024-02; 2024-03 untouched
    src = spark.createDataFrame(
        [(2, "2024-01", 99), (5, "2024-02", 50)], ["id", "month", "v"]
    )
    updated, inserted = writers.merge_into(
        spark, path, src, ["id"], partition_col="month"
    )
    assert (updated, inserted) == (1, 1)
    got = {r["id"]: (r["month"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {1: ("2024-01", 10), 2: ("2024-01", 99),
                   3: ("2024-02", 30), 4: ("2024-03", 40),
                   5: ("2024-02", 50)}
    # dynamic overwrite must not have touched the 2024-03 files
    after = set(glob.glob(os.path.join(path, "month=2024-03", "*.parquet")))
    assert after == before


def test_merge_into_moves_row_across_partitions(spark, tmp_path):
    path = str(tmp_path / "move")
    spark.createDataFrame(
        [(1, "2024-01", 10), (2, "2024-02", 20)], ["id", "month", "v"]
    ).write.partitionBy("month").parquet(path)

    # id=1 moves from 2024-01 to 2024-02: old partition loses it,
    # new partition gains it — no duplicate left behind
    src = spark.createDataFrame([(1, "2024-02", 11)], ["id", "month", "v"])
    updated, inserted = writers.merge_into(
        spark, path, src, ["id"], partition_col="month"
    )
    assert (updated, inserted) == (1, 0)
    got = sorted((r["id"], r["month"], r["v"])
                 for r in spark.read.parquet(path).collect())
    assert got == [(1, "2024-02", 11), (2, "2024-02", 20)]


def test_swap_recovers_stale_old(spark, tmp_path):
    """A crash after a committed swap leaves a stale `._old` dir; the
    next mutation must clear it and commit normally (the crash-safety
    contract in SCALE.md 9b)."""
    path = str(tmp_path / "t")
    spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"]).write.parquet(path)
    # simulate the leftover of a crash-after-commit
    stale = path + "._old"
    os.makedirs(stale)
    with open(os.path.join(stale, "junk.parquet"), "w") as f:
        f.write("not parquet")

    src = spark.createDataFrame([(2, 21), (3, 30)], ["id", "v"])
    assert writers.merge_into(spark, path, src, ["id"]) == (1, 1)
    got = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [(1, 10), (2, 21), (3, 30)]
    assert not os.path.exists(stale)
    assert not os.path.exists(path + "._staged")


def test_merge_into_clears_emptied_partition_with_escaped_name(
    spark, tmp_path
):
    """Partition values with characters Spark escapes in dir names
    (space, =, %) must still be cleaned up when a key move empties
    them — the cleanup lists and unescapes real dirs instead of
    formatting f"{col}={str(v)}"."""
    path = str(tmp_path / "esc")
    spark.createDataFrame(
        [(1, "a b=c%d", 10), (2, "plain", 20)], ["id", "grp", "v"]
    ).write.partitionBy("grp").parquet(path)

    # id=1 moves out of the escaped partition, emptying it
    src = spark.createDataFrame([(1, "plain", 11)], ["id", "grp", "v"])
    updated, inserted = writers.merge_into(
        spark, path, src, ["id"], partition_col="grp"
    )
    assert (updated, inserted) == (1, 0)
    got = sorted((r["id"], r["grp"], r["v"])
                 for r in spark.read.parquet(path).collect())
    assert got == [(1, "plain", 11), (2, "plain", 20)]
    # the escaped dir itself must be gone, not just empty of rows
    leftovers = [d for d in os.listdir(path) if d.startswith("grp=")
                 and "plain" not in d]
    assert leftovers == []


def test_incremental_summary_refresh_matches_full_recompute(spark, tmp_path):
    """A7 incremental: after a delta of new orders AND a cancellation
    that strips a product's only qualifying order, the incrementally
    refreshed matview must equal a from-scratch recompute (including
    dropping the now-unqualified product's row)."""
    from etl_workflow_spark.operators.etl import (
        product_sales_summary,
        refresh_product_summary_incremental,
    )
    from etl_workflow_spark.sources.writers import overwrite

    cats = spark.createDataFrame([(1, "cat-a")], ["category_id", "category_name"])
    prods = spark.createDataFrame(
        [(1, 1, "p1"), (2, 1, "p2"), (3, 1, "p3")],
        ["product_id", "category_id", "name"],
    )
    base_orders = spark.createDataFrame(
        [
            (1, 10, "2024-01-01", "Delivered"),
            (2, 11, "2024-01-02", "Delivered"),
            (3, 10, "2024-01-03", "Delivered"),
        ],
        ["order_id", "customer_id", "order_date", "status"],
    )
    items = spark.createDataFrame(
        [
            (1, 1, 1, 2, 20.0),   # order 1: product 1
            (2, 2, 2, 1, 15.0),   # order 2: product 2 (its ONLY order)
            (3, 3, 1, 1, 10.0),   # order 3: product 1 again
            (4, 4, 3, 4, 40.0),   # order 4 (delta): product 3
            (5, 5, 1, 1, 5.0),    # order 5 (delta): product 1
        ],
        ["order_item_id", "order_id", "product_id", "quantity", "total"],
    )

    path = str(tmp_path / "summary")
    overwrite(product_sales_summary(prods, cats, items, base_orders), path)

    # the delta: two new orders + order 2 flips to Cancelled, which
    # must REMOVE product 2 from the view entirely
    delta = spark.createDataFrame(
        [
            (2, 11, "2024-01-02", "Cancelled"),
            (4, 12, "2024-01-04", "Delivered"),
            (5, 10, "2024-01-05", "Delivered"),
        ],
        ["order_id", "customer_id", "order_date", "status"],
    )
    orders_now = base_orders.where("order_id <> 2").unionByName(delta)

    n = refresh_product_summary_incremental(
        spark, path, prods, cats, items, orders_now, delta
    )
    assert n == 3  # products 1, 2, 3 all touched by the delta

    want = sorted(
        tuple(r)
        for r in product_sales_summary(prods, cats, items, orders_now).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == want
    assert not any(r[0] == 2 for r in got)  # product 2 dropped


def test_incremental_summary_refresh_untouched_products_not_rewritten(
    spark, tmp_path
):
    """A delta touching one product must leave other products' rows
    byte-identical (they are carried over, not recomputed)."""
    from etl_workflow_spark.operators.etl import (
        product_sales_summary,
        refresh_product_summary_incremental,
    )
    from etl_workflow_spark.sources.writers import overwrite

    cats = spark.createDataFrame([(1, "c")], ["category_id", "category_name"])
    prods = spark.createDataFrame(
        [(1, 1, "p1"), (2, 1, "p2")], ["product_id", "category_id", "name"]
    )
    orders = spark.createDataFrame(
        [(1, 10, "2024-01-01", "Delivered"), (2, 11, "2024-01-02", "Delivered")],
        ["order_id", "customer_id", "order_date", "status"],
    )
    items = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0), (2, 2, 2, 1, 20.0), (3, 3, 2, 1, 30.0)],
        ["order_item_id", "order_id", "product_id", "quantity", "total"],
    )
    path = str(tmp_path / "summary")
    overwrite(product_sales_summary(prods, cats, items, orders), path)
    before = {
        r["product_id"]: tuple(r)
        for r in spark.read.parquet(path).collect()
    }

    delta = spark.createDataFrame(
        [(3, 12, "2024-01-03", "Delivered")],
        ["order_id", "customer_id", "order_date", "status"],
    )
    orders_now = orders.unionByName(delta)
    assert refresh_product_summary_incremental(
        spark, path, prods, cats, items, orders_now, delta
    ) == 1
    after = {
        r["product_id"]: tuple(r)
        for r in spark.read.parquet(path).collect()
    }
    assert after[1] == before[1]          # untouched product carried over
    assert after[2] != before[2]          # refreshed product changed


def test_compact_partitions_reduces_files_keeps_rows(spark, tmp_path):
    import glob

    path = str(tmp_path / "frag")
    # fragment: 8 writer tasks per partition
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", i) for i in range(64)],
        ["id", "grp", "v"],
    )
    df.repartition(8).write.partitionBy("grp").parquet(path)
    frag_files = glob.glob(f"{path}/grp=*/*.parquet")
    assert len(frag_files) > 4
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "grp", "v").collect()
    )

    n = writers.compact_partitions(spark, path, partition_col="grp")
    assert n == 2  # one file per partition
    after = sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "grp", "v").collect()
    )
    assert after == before


def test_write_sorted_produces_disjoint_file_ranges(spark, tmp_path):
    """Row-group min/max stats across the sorted files must be disjoint
    ranges — the physical property parquet data skipping relies on
    (checked directly via pyarrow file metadata, not inferred)."""
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "sorted")
    df = spark.createDataFrame([(i % 97, i) for i in range(10_000)], ["k", "v"])
    writers.write_sorted(df, path, ["k"], num_files=4)

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (or touching) ranges => skipping works
    # and the data round-trips
    assert spark.read.parquet(path).count() == 10_000


def test_cdf_driven_summary_refresh(spark, tmp_path):
    """Orders in a transactional table; the change feed between two
    versions drives the incremental summary refresh — result equals a
    full recompute at the newer version, and an empty window is a
    no-op."""
    from etl_workflow_spark.operators.etl import (
        product_sales_summary,
        refresh_product_summary_from_changes,
    )
    from etl_workflow_spark.sources import txn
    from etl_workflow_spark.sources.writers import overwrite

    cats = spark.createDataFrame([(1, "c")], ["category_id", "category_name"])
    prods = spark.createDataFrame(
        [(1, 1, "p1"), (2, 1, "p2")], ["product_id", "category_id", "name"]
    )
    items = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0), (2, 2, 2, 2, 20.0), (3, 3, 2, 1, 30.0)],
        ["order_item_id", "order_id", "product_id", "quantity", "total"],
    )
    orders_v1 = spark.createDataFrame(
        [(1, 10, "2024-01-01", "Delivered"), (2, 11, "2024-01-02", "Delivered")],
        ["order_id", "customer_id", "order_date", "status"],
    )
    orders_path = str(tmp_path / "orders_txn")
    txn.txn_create(spark, orders_path, orders_v1)
    summary_path = str(tmp_path / "summary")
    overwrite(product_sales_summary(prods, cats, items, orders_v1),
              summary_path)

    # v2: cancel order 2, insert order 3 (both touch product 2 only)
    txn.txn_merge_into(
        spark,
        orders_path,
        spark.createDataFrame(
            [(2, 11, "2024-01-02", "Cancelled"),
             (3, 12, "2024-01-03", "Delivered")],
            orders_v1.schema,
        ),
        ["order_id"],
    )
    n = refresh_product_summary_from_changes(
        spark, orders_path, summary_path, prods, cats, items, from_version=1
    )
    assert n == 1  # only product 2 touched

    want = sorted(
        tuple(r)
        for r in product_sales_summary(
            prods, cats, items, txn.txn_read(spark, orders_path)
        ).collect()
    )
    got = sorted(tuple(r) for r in spark.read.parquet(summary_path).collect())
    assert got == want
    # closed window: nothing to do
    assert refresh_product_summary_from_changes(
        spark, orders_path, summary_path, prods, cats, items, from_version=2
    ) == 0


def test_write_zordered_skips_on_both_dimensions(spark, tmp_path):
    """Point queries on EITHER z-column must be able to skip most
    files by min/max stats — the property a linear sort only gives its
    leading column. Measured directly on pyarrow file metadata."""
    import glob
    import random

    import pyarrow.parquet as pq

    rnd = random.Random(7)
    rows = [(rnd.randrange(1000), rnd.randrange(1000)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, ["x", "y"])

    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    writers.write_zordered(df, zpath, ["x", "y"], num_files=16)
    writers.write_sorted(df, lpath, ["x"], num_files=16)

    def file_ranges(path, col_idx):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    def hit_fraction(ranges, probes):
        hits = sum(
            1 for p in probes for lo, hi in ranges if lo <= p <= hi
        ) / (len(probes) * len(ranges))
        return hits

    probes = [rnd.randrange(1000) for _ in range(50)]
    zx = hit_fraction(file_ranges(zpath, 0), probes)
    zy = hit_fraction(file_ranges(zpath, 1), probes)
    ly = hit_fraction(file_ranges(lpath, 1), probes)

    # z-order: a point predicate on either column touches well under
    # half the files (16 files × 2×6-bit z ⇒ ~1/4 of each dim's range
    # per file); linear sort leaves the trailing column unskippable.
    assert zx < 0.5, f"x-skipping ineffective: {zx:.2f}"
    assert zy < 0.5, f"y-skipping ineffective: {zy:.2f}"
    assert ly > 0.9, f"expected no y-skipping under linear sort: {ly:.2f}"
    # round-trip: same rows, z helper columns dropped
    got = spark.read.parquet(zpath)
    assert got.columns == ["x", "y"]
    assert got.count() == 40_000


def test_write_zordered_rejects_too_many_bits(spark, tmp_path):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], ["x", "y"])
    with _pytest.raises(ValueError):
        writers.write_zordered(df, str(tmp_path / "z"), ["x", "y"],
                               bits_per_col=40)


def test_write_zordered_survives_zipfian_skew(spark, tmp_path):
    """Rank-based buckets must spread a zipfian key across files —
    equal-width bucketing would collapse most rows into one z-cell."""
    import glob
    import random

    import pyarrow.parquet as pq

    rnd = random.Random(13)
    # 90% of mass in the bottom 1% of the key range
    rows = [
        (rnd.randrange(10) if rnd.random() < 0.9 else rnd.randrange(1_000_000),
         rnd.randrange(1000))
        for _ in range(20_000)
    ]
    df = spark.createDataFrame(rows, ["hot", "uniform"])
    path = str(tmp_path / "skewz")
    writers.write_zordered(df, path, ["hot", "uniform"], num_files=8)

    files = glob.glob(f"{path}/*.parquet")
    counts = sorted(pq.ParquetFile(f).metadata.num_rows for f in files)
    # range partitioning on the z-value keeps files balanced even
    # though the hot key dominates: no file may hold the majority
    assert counts[-1] < 0.5 * 20_000, counts
    assert spark.read.parquet(path).count() == 20_000
