

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
