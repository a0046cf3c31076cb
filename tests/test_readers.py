"""CSV/JSONL source round-trips with pinned schemas; malformed-row
behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from g1_etl_spark.sources import readers as R
from tests.conftest import SF_SMOKE

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


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from g1_etl_spark.sources.readers import read_orc, write_orc

    src = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert back.schema == src.schema

    # predicate + projection reach the ORC scan like they do on parquet
    q = back.filter(F.col("o_custkey") == 7).select("o_orderkey")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" \
        in plan
    assert "o_orderdate" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_orc_partitioned_layout_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from g1_etl_spark.sources.readers import read_orc, write_orc

    src = (spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
           .withColumn("o_year", F.year("o_orderdate")))
    path = str(tmp_path / "orders_orc_part")
    write_orc(src, path, partition_by=("o_year",))
    back = read_orc(spark, path)
    one_year = back.filter(F.col("o_year") == 1995)
    want = src.filter(F.col("o_year") == 1995).count()
    assert one_year.count() == want
    plan = one_year._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PartitionFilters" in plan


def test_avro_reader_fails_with_clear_message(spark, tmp_path):
    import pytest as _pytest

    from g1_etl_spark.sources.readers import read_avro

    with _pytest.raises(Exception) as ei:
        read_avro(spark, str(tmp_path / "nope.avro")).count()
    msg = str(ei.value)
    assert "avro" in msg.lower()


def test_jsonl_quarantine_routes_bad_lines(spark, tmp_path):
    from g1_etl_spark.sources.readers import read_jsonl_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text('\n'.join([
        '{"id": 1, "name": "alpha", "score": 0.5}',
        '{"id": 2, "name": "beta", "score": ',          # truncated
        'not json at all',
        '{"id": 4, "name": "delta", "score": -3.0}',
    ]))
    good, bad = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert good.columns == ["id", "name", "score"]
    bads = bad.collect()
    assert len(bads) == 2
    # the raw line is preserved for triage
    assert any("not json" in r["_corrupt_record"] for r in bads)
