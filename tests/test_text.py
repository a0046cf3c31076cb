

"""Engineered-corpus properties of the text/graph operators (the
oracle-parity gate covers real data; these pin closed-form fixed
points)."""

from __future__ import annotations


def test_textrank_uniform_on_complete_graph(spark):
    """Identical documents make the co-occurrence graph complete with
    equal weights — the damped fixed point is uniform, so every token
    must carry the SAME score (bitwise) and scores must sum to ~1."""
    import math
    import os
    import shutil
    import tempfile

    docs = [(i, "alpha beta gamma delta", "src") for i in range(30)]
    df = spark.createDataFrame(
        docs, "doc_id LONG, text STRING, source STRING")
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet"))
        from g1_etl_spark.plans import REGISTRY
        rows = REGISTRY["text_textrank_keywords"].fn(spark, tmp).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert sorted(r.token for r in rows) == ["alpha", "beta", "delta",
                                             "gamma"]
    scores = {r.textrank for r in rows}
    assert len(scores) == 1  # exactly equal, not just close
    assert math.isclose(sum(r.textrank for r in rows), 1.0, rel_tol=1e-6)


def test_feature_hashing_matches_hashlib_reference(spark):
    """One document's signed bucket counts recomputed with hashlib.md5
    in plain Python must equal the engine's rows exactly — pins the
    md5-slice bucket/sign definitions as the portable contract."""
    import hashlib

    from pyspark.sql import functions as F

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.plans.text_plans import text_feature_hashing
    from tests.conftest import SF_SMOKE

    doc = (load_table(spark, SF_SMOKE, "documents")
           .orderBy("doc_id").limit(1).collect()[0])
    want = {}
    for w in doc.text.split(" "):
        hx = hashlib.md5(w.encode()).hexdigest()
        bucket = int(hx[:8], 16) % 64
        sgn = 1 if int(hx[8], 16) % 2 == 0 else -1
        want[bucket] = want.get(bucket, 0) + sgn
    got = {r.bucket: r.value for r in
           text_feature_hashing(spark, SF_SMOKE)
           .filter(F.col("doc_id") == doc.doc_id).collect()}
    assert got == want
