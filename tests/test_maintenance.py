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


def _file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Mean per-file (max-min) span of each column, normalized by the
    global span, from parquet footer metadata only."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/*.parquet"))
    spans = {c: [] for c in cols}
    glo = {c: [float("inf"), float("-inf")] for c in cols}
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.schema.to_arrow_schema().__len__())}
        for c in cols:
            lo, hi = float("inf"), float("-inf")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                lo, hi = min(lo, st.min), max(hi, st.max)
            spans[c].append(hi - lo)
            glo[c][0] = min(glo[c][0], lo)
            glo[c][1] = max(glo[c][1], hi)
    return {c: (sum(v) / len(v)) / ((glo[c][1] - glo[c][0]) or 1.0)
            for c, v in spans.items()}


def test_zorder_write_clusters_all_dimensions(spark, tmp_path):
    ev = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
          .select("event_id", "user_id", "value"))
    n = ev.count()

    zpath = str(tmp_path / "zorder")
    M.write_zordered(ev, zpath, ["user_id", "value"], num_files=8)
    assert spark.read.parquet(zpath).count() == n  # lossless

    # single-column sort baseline: perfect on user_id, useless on value
    spath = str(tmp_path / "sorted")
    (ev.repartitionByRange(8, F.col("user_id"))
     .sortWithinPartitions("user_id")
     .write.mode("overwrite").parquet(spath))

    z = _file_spans(zpath, ["user_id", "value"])
    s = _file_spans(spath, ["user_id", "value"])
    # sorted layout: tight on the sort key, wide on the other dim;
    # z-order: BOTH dimensions substantially tighter than the full
    # range -> min/max row-group pruning works on either.
    # (measured here: sorted ~0.06/0.77, z-order ~0.38/0.35)
    assert s["value"] > 0.6
    assert z["user_id"] < 0.5
    assert z["value"] < 0.5
    assert z["value"] < s["value"] / 1.5
