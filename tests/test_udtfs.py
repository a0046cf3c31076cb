"""Python UDTF: sentence fan-out via SQL LATERAL join."""

from __future__ import annotations

from g1_etl_spark.functions.udtfs import SplitSentences, register_udtfs


def test_split_sentences_direct(spark):
    from pyspark.sql import functions as F

    out = SplitSentences(
        F.lit("One two. Three! Four five six?")).collect()
    rows = [(r["sent_idx"], r["sentence"], r["n_words"]) for r in out]
    assert rows == [(0, "One two.", 2), (1, "Three!", 1),
                    (2, "Four five six?", 3)]


def test_split_sentences_lateral_sql(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "Alpha beta. Gamma."), (2, ""), (3, "No terminator here")],
        "doc_id long, text string").createOrReplaceTempView("t_docs")
    rows = spark.sql("""
        SELECT doc_id, s.sent_idx, s.sentence, s.n_words
        FROM t_docs, LATERAL split_sentences(text) AS s
        ORDER BY doc_id, sent_idx
    """).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows]
    assert got == [(1, 0, "Alpha beta."), (1, 1, "Gamma."),
                   (3, 0, "No terminator here")]
