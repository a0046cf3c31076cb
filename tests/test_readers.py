"""CSV/JSONL source round-trips with pinned schemas; malformed-row
behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from g1_etl_spark.sources import readers as R

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
])

ROWS = [(1, "alpha", 0.5), (2, "beta", 1.25), (3, None, -3.0)]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", "true").csv(path)
    back = R.read_csv(spark, path, SCHEMA)
    assert back.schema == SCHEMA
    assert sorted((r["id"], r["name"], r["score"]) for r in back.collect()) \
        == sorted(ROWS)


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "jsonl")
    df.write.mode("overwrite").json(path)
    back = R.read_jsonl(spark, path, SCHEMA)
    assert back.schema == SCHEMA
    assert back.count() == len(ROWS)


def test_csv_failfast_on_malformed(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.csv").write_text("id,name,score\n1,ok,1.0\nnot_a_long,x,y\n")
    with pytest.raises(Exception):
        R.read_csv(spark, str(bad), SCHEMA).collect()


def test_jdbc_reader_builds_partitioned_scan(spark):
    """No JDBC driver in this environment: building the reader must
    succeed (options validated lazily), and the pushed predicate lands
    in dbtable."""
    with pytest.raises(Exception) as exc:
        R.read_jdbc_partitioned(
            spark, "jdbc:mysql://example/db", "customers",
            partition_col="id", lower=0, upper=1000, num_partitions=8,
            predicate="dispensary_id = 1")
    # fails at driver resolution, not option validation
    assert "driver" in str(exc.value).lower() or "No suitable" in str(exc.value)
