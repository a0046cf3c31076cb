"""S6/K4 analogs: partition-side fetch over file:// URLs and fixed-size
chunk batching."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from g1_etl_spark.sources import fetch as FE


def _blob_files(tmp_path, n=6):
    urls = []
    for i in range(n):
        p = tmp_path / f"blob{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        urls.append((i, p.as_uri()))
    return urls


def test_fetch_to_column_file_urls(spark, tmp_path):
    rows = _blob_files(tmp_path)
    df = spark.createDataFrame(rows, "id long, url string").repartition(3)
    out = {r["id"]: r for r in FE.fetch_to_column(df).collect()}
    assert len(out) == len(rows)
    for i, _ in rows:
        assert out[i]["content_error"] is None
        assert bytes(out[i]["content"]) == bytes([i]) * (100 + i)


def test_fetch_errors_are_per_row(spark, tmp_path):
    rows = _blob_files(tmp_path, 2)
    rows.append((99, (tmp_path / "missing.bin").as_uri()))
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["id"]: r for r in FE.fetch_to_column(df).collect()}
    assert out[0]["content_error"] is None
    assert out[99]["content"] is None
    assert "Error" in out[99]["content_error"]


def test_download_to_files(spark, tmp_path):
    rows = _blob_files(tmp_path)
    dest = tmp_path / "downloaded"
    df = spark.createDataFrame(
        [(u, f"{i}.jpg") for i, u in rows], "url string, name string")
    FE.download_to_files(df, "url", "name", str(dest))
    got = sorted(os.listdir(dest))
    assert got == sorted(f"{i}.jpg" for i, _ in rows)
    assert (dest / "3.jpg").read_bytes() == bytes([3]) * 103


def test_chunks_reference_semantics():
    data = list(range(10))
    assert FE.chunks(data, 4) == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert FE.chunks([], 4) == []
    assert list(FE.iter_chunks(iter(data), 3)) == [
        [0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]


def test_foreach_chunks_bounds_batch_size(spark, tmp_path):
    sink = tmp_path / "batches"
    sink.mkdir()
    df = spark.range(100).repartition(4).select(F.col("id"))

    def send(batch):
        assert 0 < len(batch) <= 7
        path = sink / f"{uuid.uuid4().hex}.txt"
        path.write_text(",".join(str(r["id"]) for r in batch))

    FE.foreach_chunks(df, 7, send)
    seen = set()
    for f in sink.iterdir():
        ids = [int(x) for x in f.read_text().split(",")]
        assert len(ids) <= 7
        seen.update(ids)
    assert seen == set(range(100))
