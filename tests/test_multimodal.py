"""Multimodal plumbing tests: schema contract, mapInPandas batch shapes,
determinism, 1->N frame fan-out, stubbed decode behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from g1_etl_spark.operators import multimodal as M
from tests.conftest import SF_SMOKE


def _media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return M.media_from_documents(docs)


def test_media_schema_contract(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    assert "struct" in dict(m.dtypes)["meta"]
    row = m.filter(F.col("media_id") == 0).collect()[0]
    assert row["meta"]["n_bytes"] == len(row["content"])
    assert row["kind"] in ("image", "audio", "video")


def test_feature_extraction_deterministic(spark):
    m = _media(spark).limit(50)
    a = {r["media_id"]: r["features"]
         for r in M.extract_features(m).collect()}
    b = {r["media_id"]: r["features"]
         for r in M.extract_features(m).collect()}
    assert a == b
    for mid, feats in a.items():
        assert len(feats) == M.FEATURE_DIM
        assert abs(sum(feats) - 1.0) < 1e-9  # L1-normalized


def test_feature_matches_local_numpy(spark):
    m = _media(spark).filter(F.col("media_id") == 1)
    row = m.collect()[0]
    spark_feats = M.extract_features(m).collect()[0]["features"]
    local = M.byte_histogram(bytes(row["content"]))
    assert np.allclose(spark_feats, local)


def test_frame_sampling_fanout(spark):
    m = _media(spark)
    frames = M.sample_frames(m, frame_size=64, every_k=4)
    out = frames.collect()
    assert out, "expected at least one sampled frame"
    vids = {r["media_id"] for r in m.filter(
        F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in out} <= vids
    for r in out:
        assert r["frame_index"] % 4 == 0
        assert len(r["frame_bytes"]) == 64


def test_resize_stub_passthrough(spark):
    m = _media(spark).limit(10)
    out = M.resize_stub(m, 224, 224)
    rows = out.collect()
    orig = {r["media_id"]: bytes(r["content"]) for r in m.collect()}
    for r in rows:
        assert r["width"] == 224 and r["height"] == 224
        assert bytes(r["content"]) == orig[r["media_id"]]


def test_decode_image_is_stubbed():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG\r\n")


def test_fake_decode_meta_deterministic():
    a = M.fake_decode_meta(b"x" * 1000)
    assert a == M.fake_decode_meta(b"y" * 1000)
    assert a["n_bytes"] == 1000
