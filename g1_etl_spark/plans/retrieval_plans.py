"""Driver-facing lexical-retrieval queries (vocabulary + BM25) with
exact DuckDB oracles.

Determinism contract: every double that feeds a SUM is quantized to a
scaled long first (see operators/retrieval docstring); float literals
are embedded in the oracle SQL via ``repr()`` of the SAME Python floats
the Spark plan uses, so both engines parse bit-identical constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators import retrieval as R
from g1_etl_spark.plans.registry import register

_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
         "t -> t <> '')")
_MIN_COUNT = 2
_K = 10
_K1, _B = 1.2, 0.75
# the exact doubles the Spark plan computes in Python, round-tripped
_K1P1 = repr(_K1 + 1.0)          # tf * (k1+1)
_ONE_MINUS_B = repr(1.0 - _B)

# (q_id, term) — fixed query set over the synthetic corpus vocabulary
_QUERIES = [
    (1, "window"), (1, "sort"), (1, "merge"),
    (2, "hash"), (2, "join"),
    (3, "query"), (3, "plan"), (3, "scan"),
]
_QUERY_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _QUERIES)


@register(
    "text_vocab",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS term FROM documents),
    counts AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
      HAVING COUNT(*) >= {_MIN_COUNT})
    SELECT term, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS term_id
    FROM counts
    """,
    description="frequency-ordered vocabulary with contiguous ids via "
                "distributed total-order rank (no single-partition window)",
    tags=("retrieval", "text"),
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.build_vocab(docs, min_count=_MIN_COUNT)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS d, unnest({_TOKS}) AS term FROM documents),
    postings AS (SELECT d, term, COUNT(*) AS tf FROM toks GROUP BY d, term),
    dl AS (SELECT d, COUNT(*) AS dl FROM toks GROUP BY d),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
    dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
    q(q_id, term) AS (VALUES {_QUERY_VALUES}),
    per AS (
      SELECT q.q_id, p.d AS neighbor_id,
             CAST(round(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                        * 1000000) AS BIGINT)
             * CAST(round((p.tf * {_K1P1})
                          / (p.tf + {_K1!r} * ({_ONE_MINUS_B}
                             + ({_B!r} * l.dl)
                               / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))
                          * 1000000) AS BIGINT) AS sc
      FROM postings p
      JOIN q ON p.term = q.term
      JOIN dft f ON p.term = f.term
      JOIN dl l ON p.d = l.d
      CROSS JOIN stats s),
    scored AS (
      SELECT q_id, neighbor_id,
             CAST(SUM(sc) AS DOUBLE) / 1000000000000.0 AS score
      FROM per GROUP BY q_id, neighbor_id),
    ranked AS (
      SELECT q_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)
    SELECT CAST(q_id AS BIGINT) AS q_id, neighbor_id, score, rank
    FROM ranked WHERE rank <= {_K}
    """,
    description="BM25 top-10 docs for 3 term queries: broadcast query "
                "terms, one corpus scan, quantized-exact score sums, "
                "skew-free two-stage top-k",
    tags=("retrieval", "text"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(_QUERIES, ["q_id", "term"])
    return R.bm25_topk(docs, q, k=_K, k1=_K1, b=_B)


@register(
    "text_tokenize_ids",
    oracle=f"""
    WITH arrs AS (
      SELECT doc_id, {_TOKS} AS arr FROM documents),
    toks AS (
      SELECT doc_id, i AS pos, arr[i] AS term
      FROM arrs, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)),
    counts AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
      HAVING COUNT(*) >= {_MIN_COUNT}),
    vocab AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS term_id
      FROM counts),
    j AS (
      SELECT t.doc_id, t.pos, v.term_id
      FROM toks t LEFT JOIN vocab v ON t.term = v.term)
    SELECT doc_id,
           coalesce(array_to_string(
             list(term_id ORDER BY pos) FILTER (term_id IS NOT NULL),
             ' '), '') AS ids,
           COUNT(*) AS n_tokens,
           COUNT(*) FILTER (term_id IS NULL) AS n_oov
    FROM j GROUP BY doc_id
    """,
    description="corpus tokenization to in-order vocab-id sequences "
                "(broadcast vocab, OOV counted) — the input to sequence "
                "packing (operators/retrieval.py:tokenize_to_ids). The "
                "registered projection serializes the sequence to a "
                "space-joined string (driver canonicalizer cannot hash "
                "list cells, round-3 red row); the operator keeps the "
                "array form.",
    tags=("retrieval", "text"),
)
def text_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = R.build_vocab(docs, min_count=_MIN_COUNT)
    out = R.tokenize_to_ids(docs, vocab)
    return out.withColumn(
        "ids", F.concat_ws(" ", F.col("ids").cast("array<string>")))


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS d, unnest({_TOKS}) AS term FROM documents),
    postings AS (
      SELECT d, term, COUNT(*) AS tf FROM toks GROUP BY d, term),
    dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT d, term, tf,
             tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1000000)
                       AS BIGINT) AS s
      FROM postings JOIN dft USING (term) CROSS JOIN nd),
    ranked AS (
      SELECT d, term, tf, s,
             ROW_NUMBER() OVER (PARTITION BY d ORDER BY s DESC, term)
               AS rank
      FROM scored)
    SELECT d AS doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(s AS DOUBLE) / 1000000 AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    description="TF-IDF keyword extraction: top-3 characteristic terms "
                "per doc, idf quantized at 1e6 for engine exactness",
    tags=("retrieval", "text"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.tfidf_topk_terms(docs, k=3)


# ---- RAG index prep composite: chunk -> BM25 over chunks ----
# The oracle is the registered BM25 oracle re-pointed at a chunk CTE
# (same chunking SQL as text_chunk_windows), so the two stay in sync
# by construction. Chunk key packs (doc_id, chunk_id) into one sortable
# long: doc_id * 1000 + chunk_id (chunk counts are far below 1000).
_CHUNK_CTES = r"""
    WITH s0 AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents),
    c0 AS (
      SELECT doc_id, w, len(w) AS nw,
             CASE WHEN len(w) <= 64 THEN 0
                  ELSE (len(w) - 64 + 47) // 48 END AS last
      FROM s0),
    e0 AS (
      SELECT doc_id, w, unnest(generate_series(0, last)) AS i FROM c0),
    chunks AS (
      SELECT doc_id * 1000 + i AS doc_id,
             array_to_string(w[(i * 48 + 1):(i * 48 + 64)], ' ') AS text
      FROM e0),"""

_RAG_FINAL = ("SELECT CAST(q_id AS BIGINT) AS q_id, neighbor_id,\n"
              "           neighbor_id // 1000 AS doc_id,\n"
              "           neighbor_id % 1000 AS chunk_id, score, rank\n"
              "    FROM ranked")


def _rag_oracle() -> str:
    from g1_etl_spark.plans.registry import REGISTRY

    base = REGISTRY["text_bm25_topk"].oracle
    # repoint the corpus at the chunk CTE BEFORE splicing the chunk
    # CTEs in (they legitimately read FROM documents themselves)
    out = base.replace("FROM documents", "FROM chunks")
    out = out.replace("WITH toks AS (", _CHUNK_CTES + "\n    toks AS (", 1)
    out = out.replace(
        "SELECT CAST(q_id AS BIGINT) AS q_id, neighbor_id, score, rank\n"
        "    FROM ranked", _RAG_FINAL)
    assert "neighbor_id // 1000" in out, "final-select splice failed"
    return out


@register(
    "pipeline_rag_index",
    oracle=_rag_oracle(),
    description="RAG index prep composite: token-window chunking "
                "(64/48) -> BM25 top-10 CHUNKS per query, packed "
                "(doc, chunk) keys — chunk store + lexical index in "
                "one plan",
    tags=("retrieval", "curation", "pipeline"),
)
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.curation import chunk_token_windows

    docs = load_table(spark, sf_dir, "documents")
    ch = chunk_token_windows(docs, size=64, stride=48)
    chunk_docs = ch.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"))
    q = spark.createDataFrame(_QUERIES, ["q_id", "term"])
    out = R.bm25_topk(chunk_docs, q, k=_K, k1=_K1, b=_B)
    return out.select(
        "q_id", "neighbor_id",
        F.expr("neighbor_id div 1000").alias("doc_id"),
        (F.col("neighbor_id") % 1000).alias("chunk_id"),
        "score", "rank")


_HYBRID_CAND_K = 20
_HYBRID_K = 5

# the ONE engine-exact cosine definition (strict left-to-right list
# fold, proven by sim_brute_force_topk's parity) — imported, not
# duplicated, so the two plans cannot drift
from g1_etl_spark.plans.similarity_plans import (  # noqa: E402
    _DOT as _HDOT, _NORM_C as _HNORM_C, _NORM_Q as _HNORM_Q)

# derived from _QUERIES so adding a query updates BOTH stages and the
# rerank in lockstep
_HYBRID_QIDS = sorted({q for q, _ in _QUERIES})
_HYBRID_QIDS_SQL = ", ".join(str(q) for q in _HYBRID_QIDS)

_HYBRID_TAIL = f"""
    qe AS (SELECT vec_id AS eq_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN ({_HYBRID_QIDS_SQL})),
    rer AS (
      SELECT c.q_id, c.neighbor_id, c.score AS bm25_score,
             c.rank AS bm25_rank,
             {_HDOT} / ({_HNORM_Q} * {_HNORM_C}) AS cos_score
      FROM cand c
      JOIN qe ON qe.eq_id = c.q_id
      JOIN embeddings e ON e.vec_id = c.neighbor_id),
    refinal AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY cos_score DESC,
                                            neighbor_id) AS final_rank
      FROM rer)
    SELECT q_id, neighbor_id, bm25_score, bm25_rank, cos_score,
           final_rank
    FROM refinal WHERE final_rank <= {_HYBRID_K}
"""


def _hybrid_oracle() -> str:
    from g1_etl_spark.plans.registry import REGISTRY

    base = REGISTRY["text_bm25_topk"].oracle
    out = base.replace(f"WHERE rank <= {_K}",
                       f"WHERE rank <= {_HYBRID_CAND_K}")
    marker = "SELECT CAST(q_id AS BIGINT) AS q_id, neighbor_id, score, rank"
    head, tail = out.rsplit(marker, 1)
    out = (head + ",\n    cand AS (" + marker + tail.rstrip().rstrip(",")
           + "),\n" + _HYBRID_TAIL)
    assert "cand AS (" in out and "final_rank" in out, "splice failed"
    return out


@register(
    "pipeline_hybrid_search",
    oracle=_hybrid_oracle(),
    description="hybrid retrieval composite (the modern RAG shape): "
                "BM25 generates top-20 lexical candidates per query, "
                "exact cosine against the query embedding reranks to "
                "top-5 — candidate generation touches the inverted "
                "index only, the expensive semantic score touches 20 "
                "rows per query; oracle spliced from the BM25 oracle "
                "so the stages cannot drift",
    tags=("retrieval", "similarity", "pipeline"),
)
def pipeline_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = spark.createDataFrame(_QUERIES, ["q_id", "term"])
    cand = (R.bm25_topk(docs, q, k=_HYBRID_CAND_K, k1=_K1, b=_B)
            .select("q_id", "neighbor_id",
                    F.col("score").alias("bm25_score"),
                    F.col("rank").alias("bm25_rank")))
    qe = (emb.filter(F.col("vec_id").isin(*_HYBRID_QIDS))
          .select(F.col("vec_id").alias("eq_id"),
                  F.col("embedding").alias("q_vec")))
    rer = (cand.join(F.broadcast(qe), cand.q_id == F.col("eq_id"))
           .join(emb.select("vec_id", "embedding"),
                 cand.neighbor_id == F.col("vec_id"))
           .select("q_id", "neighbor_id", "bm25_score", "bm25_rank",
                   (S.dot(F.col("q_vec"), F.col("embedding"))
                    / (S.l2_norm(F.col("q_vec"))
                       * S.l2_norm(F.col("embedding"))))
                   .alias("cos_score")))
    from pyspark.sql import Window as W
    w = W.partitionBy("q_id").orderBy(F.desc("cos_score"), "neighbor_id")
    return (rer.withColumn("final_rank", F.row_number().over(w))
            .filter(F.col("final_rank") <= _HYBRID_K))


_RRF_K0 = 60          # the standard RRF constant
_RRF_K = 5

_RRF_TAIL = f"""
    qe AS (SELECT vec_id AS eq_id, embedding AS q_vec FROM embeddings
           WHERE vec_id IN ({_HYBRID_QIDS_SQL})),
    cos_scored AS (
      SELECT qe.eq_id AS q_id, e.vec_id AS neighbor_id,
             {_HDOT} / ({_HNORM_Q} * {_HNORM_C}) AS cos_score
      FROM embeddings e, qe WHERE e.vec_id <> qe.eq_id),
    cosk AS (
      SELECT * FROM (
        SELECT q_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_score DESC,
                                           neighbor_id) AS cos_rank
        FROM cos_scored)
      WHERE cos_rank <= {_HYBRID_CAND_K}),
    fused AS (
      SELECT COALESCE(b.q_id, c.q_id) AS q_id,
             COALESCE(b.neighbor_id, c.neighbor_id) AS neighbor_id,
             CAST(b.rank AS BIGINT) AS bm25_rank,
             CAST(c.cos_rank AS BIGINT) AS cos_rank,
             COALESCE(1.0 / ({_RRF_K0}.0 + b.rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K0}.0 + c.cos_rank), 0.0)
               AS rrf_score
      FROM cand b FULL OUTER JOIN cosk c
        ON b.q_id = c.q_id AND b.neighbor_id = c.neighbor_id),
    rrf_final AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY rrf_score DESC,
                                            neighbor_id) AS rrf_rank
      FROM fused)
    SELECT q_id, neighbor_id, bm25_rank, cos_rank, rrf_score,
           CAST(rrf_rank AS BIGINT) AS rrf_rank
    FROM rrf_final WHERE rrf_rank <= {_RRF_K}
"""


def _rrf_oracle() -> str:
    from g1_etl_spark.plans.registry import REGISTRY

    base = REGISTRY["text_bm25_topk"].oracle
    out = base.replace(f"WHERE rank <= {_K}",
                       f"WHERE rank <= {_HYBRID_CAND_K}")
    marker = "SELECT CAST(q_id AS BIGINT) AS q_id, neighbor_id, score, rank"
    head, tail = out.rsplit(marker, 1)
    out = (head + ",\n    cand AS (" + marker + tail.rstrip().rstrip(",")
           + "),\n" + _RRF_TAIL)
    assert "cand AS (" in out and "rrf_rank" in out, "splice failed"
    return out


@register(
    "pipeline_rrf_fusion",
    oracle=_rrf_oracle(),
    description="reciprocal-rank-fusion hybrid retrieval: BM25 top-20 "
                "and exact-cosine top-20 fused by 1/(60+rank) sums "
                "(the score-free fusion that needs no cross-modality "
                "calibration, unlike the hybrid rerank's raw cosine) — "
                "full outer join on the two candidate lists, so a doc "
                "surfaced by only one modality still scores; ranks are "
                "integers and each RRF term is a single IEEE divide, "
                "so fusion is engine-exact; oracle spliced from the "
                "BM25 oracle + the proven cosine fold",
    tags=("retrieval", "similarity", "pipeline"),
)
def pipeline_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from g1_etl_spark.operators import similarity as S

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    q = spark.createDataFrame(_QUERIES, ["q_id", "term"])
    cand = (R.bm25_topk(docs, q, k=_HYBRID_CAND_K, k1=_K1, b=_B)
            .select("q_id", "neighbor_id",
                    F.col("rank").cast("long").alias("bm25_rank")))
    qe = (emb.filter(F.col("vec_id").isin(*_HYBRID_QIDS))
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    scored = (emb.crossJoin(F.broadcast(qe))
              .filter(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("neighbor_id"),
                      (S.dot(F.col("q_vec"), F.col("embedding"))
                       / (S.l2_norm(F.col("q_vec"))
                          * S.l2_norm(F.col("embedding"))))
                      .alias("cos_score")))
    wc = W.partitionBy("q_id").orderBy(F.desc("cos_score"), "neighbor_id")
    cosk = (scored.withColumn("cos_rank",
                              F.row_number().over(wc).cast("long"))
            .filter(F.col("cos_rank") <= _HYBRID_CAND_K)
            .select("q_id", "neighbor_id", "cos_rank"))
    fused = (cand.join(cosk, ["q_id", "neighbor_id"], "full_outer")
             .select("q_id", "neighbor_id", "bm25_rank", "cos_rank",
                     (F.coalesce(F.lit(1.0)
                                 / (F.lit(float(_RRF_K0))
                                    + F.col("bm25_rank")), F.lit(0.0))
                      + F.coalesce(F.lit(1.0)
                                   / (F.lit(float(_RRF_K0))
                                      + F.col("cos_rank")), F.lit(0.0)))
                     .alias("rrf_score")))
    wf = W.partitionBy("q_id").orderBy(F.desc("rrf_score"), "neighbor_id")
    return (fused.withColumn("rrf_rank",
                             F.row_number().over(wf).cast("long"))
            .filter(F.col("rrf_rank") <= _RRF_K))
