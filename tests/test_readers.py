"""CSV reader: schema-declared roundtrip parity with the parquet
original, and malformed rows degrade to nulls (PERMISSIVE), not
failures — the reference's tolerant pandas-read semantics."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from etl_workflow_spark.sources.readers import read_csv


def test_csv_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    orig = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "customer_csv")
    orig.write.option("header", True).mode("overwrite").csv(path)
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_acctbal", DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    assert back.schema == schema
    a = sorted(map(tuple, orig.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_malformed_rows_become_nulls(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,qty\n1,2\nnot_an_int,xyz\n3,4\n")
    schema = StructType(
        [StructField("id", LongType()), StructField("qty", LongType())]
    )
    rows = sorted(
        map(tuple, read_csv(spark, str(p), schema=schema).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert (1, 2) in rows and (3, 4) in rows
    assert (None, None) in rows  # malformed -> nulls, cleaned by B2


def test_write_csv_sink_roundtrip(spark, sf_dir, tmp_path):
    """A8: the CSV export sink (ref data-generator.py:307-311) must
    roundtrip through the schema-declared reader, single- and
    multi-file."""
    from etl_workflow_spark.sources.writers import write_csv

    orig = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_acctbal", DoubleType()),
        ]
    )
    expected = sorted(map(tuple, orig.collect()))
    for single in (False, True):
        path = str(tmp_path / f"export_{single}")
        write_csv(orig, path, single_file=single)
        back = read_csv(spark, path, schema=schema)
        assert sorted(map(tuple, back.collect())) == expected
        import glob

        n_parts = len(glob.glob(f"{path}/part-*.csv"))
        assert n_parts == 1 if single else n_parts >= 1


def test_jsonl_roundtrip_with_schema(spark, tmp_path):
    from etl_workflow_spark.sources.readers import read_jsonl
    from etl_workflow_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None)], ["id", "s", "v"]
    )
    path = str(tmp_path / "out.jsonl")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # inference path (exploration only) sees the same rows
    inferred = read_jsonl(spark, path)
    assert inferred.count() == 2
