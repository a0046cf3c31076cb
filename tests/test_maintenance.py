"""Tests for sources/maintenance: partition pruning actually happens,
file-size bounds hold, compaction reduces file counts losslessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from g1_etl_spark.sources import maintenance as M
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / "by_lang")
    M.write_partitioned(docs, out, ["lang"])

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_max_records_per_file_bounds(spark, tmp_path):
    df = spark.range(0, 10_000).coalesce(1)
    out = str(tmp_path / "bounded")
    M.write_partitioned(df.withColumn("p", F.lit("a")), out, ["p"],
                        max_records_per_file=1000)
    stats = M.parquet_file_stats(out)
    assert stats["n_files"] >= 10  # 10k rows / 1k-per-file


def test_compaction_reduces_files_losslessly(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    frag = str(tmp_path / "fragmented")
    docs.repartition(20).write.parquet(frag)
    assert M.parquet_file_stats(frag)["n_files"] == 20

    compacted = str(tmp_path / "compacted")
    after = M.compact_parquet(spark, frag, compacted,
                              target_file_bytes=64 * 1024 * 1024)
    assert after["n_files"] < 20
    a = sorted(r["doc_id"] for r in spark.read.parquet(frag).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(compacted).collect())
    assert a == b
