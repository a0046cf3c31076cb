"""Driver-facing text-analysis queries on the documents table, each with
an exact DuckDB oracle (all integer/regex/md5 arithmetic is
engine-identical; double divisions operate on identical operands)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators import textops as T
from g1_etl_spark.operators.folded import (bind, bounded_graph_row,
                                           in_adjacency, iterate)
from g1_etl_spark.plans.registry import register

_MARKER_SQL = {
    lang: "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    for lang, markers in T.LANG_MARKERS.items()
}


@register(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS bpe_tokens
    FROM documents
    """,
    description="token counting: whitespace + BPE-ish regex lexer",
    tags=("text",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        T.regex_token_count(F.col("text")).alias("bpe_tokens"),
    )


@register(
    "text_quality_stats",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit,
             length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS punct,
             length(regexp_replace(text, '[^\s]', '', 'g')) AS space,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           alpha / n AS alpha_ratio,
           digit / n AS digit_ratio,
           punct / n AS punct_ratio,
           CAST(len(words) AS BIGINT) AS n_words,
           (n - space) / len(words) AS avg_word_len,
           CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
             AS distinct_word_ratio,
           (CASE WHEN n >= 50 AND n <= 10000 THEN 1.0 ELSE 0.5 END) * 0.2
             + (alpha / n) * 0.4
             + (CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.4
             AS quality
    FROM s
    """,
    description="quality scoring: char-class ratios, vocabulary "
                "diversity, composite score",
    tags=("text",),
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = T.char_stats(F.col("text"))
    stats = d.select(
        "doc_id",
        s["n_chars"].alias("n_chars"),
        s["alpha_ratio"].alias("alpha_ratio"),
        s["digit_ratio"].alias("digit_ratio"),
        s["punct_ratio"].alias("punct_ratio"),
        s["n_words"].alias("n_words"),
        s["avg_word_len"].alias("avg_word_len"),
        s["distinct_word_ratio"].alias("distinct_word_ratio"),
    )
    # quality as arithmetic over the aliased stat columns: each regex
    # pass runs once (the aliases are multi-referenced and non-cheap, so
    # CollapseProject keeps the projections separate)
    return stats.withColumn(
        "quality",
        T.quality_from_stats(F.col("n_chars"), F.col("alpha_ratio"),
                             F.col("distinct_word_ratio")))


@register(
    "text_lang_id",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang AS labeled_lang,
             list_distinct(string_split(
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '))
               AS words
      FROM documents),
    scores AS (
      SELECT doc_id, labeled_lang,
             len(list_intersect(words, {_MARKER_SQL['de']})) AS s_de,
             len(list_intersect(words, {_MARKER_SQL['en']})) AS s_en,
             len(list_intersect(words, {_MARKER_SQL['es']})) AS s_es,
             len(list_intersect(words, {_MARKER_SQL['fr']})) AS s_fr
      FROM w)
    SELECT doc_id, labeled_lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS detected_lang
    FROM scores
    """,
    description="language ID: distinct marker-word voting with "
                "deterministic tie-break",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_id(F.col("text")).alias("detected_lang"),
    )


@register(
    "text_fingerprints",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    g AS (
      SELECT doc_id, norm,
             list_sort(list_distinct([
               w[i] || ' ' || w[i+1] || ' ' || w[i+2]
               FOR i IN range(1, len(w) - 1)])) AS grams
      FROM (SELECT doc_id, norm, string_split(norm, ' ') AS w FROM n)
      WHERE len(w) >= 3)
    SELECT doc_id,
           md5(norm) AS content_fp,
           md5(array_to_string(grams, '')) AS shingle_fp
    FROM g
    """,
    description="document fingerprints: md5 of normalized content + "
                "order-insensitive shingle-set md5",
    tags=("text",),
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.content_fingerprint(F.col("text")).alias("content_fp"),
        T.shingle_fingerprint(F.col("text")).alias("shingle_fp"),
    )


@register(
    "sample_split_assign",
    oracle="""
    SELECT doc_id,
           CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS bucket,
           CASE WHEN CAST(concat('0x',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(concat('0x',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
    """,
    description="deterministic train/valid/test assignment: md5-hash "
                "bucket of the key — identical membership on any "
                "engine, partitioning, or rerun (reproducible held-out "
                "sets)",
    tags=("text", "sampling"),
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sampling import hash_bucket, split_assign

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        hash_bucket(F.col("doc_id")).alias("bucket"),
        split_assign(F.col("doc_id")).alias("split"))


@register(
    "text_repetition",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    tok AS (SELECT doc_id, len(ws) AS nw, unnest(ws) AS t FROM w),
    t1 AS (SELECT doc_id, nw, MAX(c) AS m1
           FROM (SELECT doc_id, nw, t, COUNT(*) AS c
                 FROM tok GROUP BY 1, 2, 3)
           GROUP BY 1, 2),
    bg AS (SELECT doc_id, len(ws) - 1 AS nb,
                  unnest([ws[i] || ' ' || ws[i+1]
                          FOR i IN range(1, len(ws))]) AS b
           FROM w WHERE len(ws) >= 2),
    t2 AS (SELECT doc_id, nb, MAX(c) AS m2
           FROM (SELECT doc_id, nb, b, COUNT(*) AS c
                 FROM bg GROUP BY 1, 2, 3)
           GROUP BY 1, 2)
    SELECT t1.doc_id,
           CAST(m1 AS DOUBLE) / nw AS top_word_frac,
           CAST(m2 AS DOUBLE) / nb AS top_bigram_frac
    FROM t1 LEFT JOIN t2 USING (doc_id)
    """,
    description="repetition quality signals (Gopher-style): fraction of "
                "tokens taken by the most frequent word / bigram",
    tags=("text",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (load_table(spark, sf_dir, "documents")
         .select("doc_id", F.split("text", " ").alias("ws")))
    tok = d.select("doc_id", F.size("ws").alias("nw"),
                   F.explode("ws").alias("t"))
    t1 = (tok.groupBy("doc_id", "nw", "t").count()
          .groupBy("doc_id", "nw").agg(F.max("count").alias("m1")))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("ws") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("ws", (i + 1).cast("int")),
            F.element_at("ws", (i + 2).cast("int"))))
    bg = (d.filter(F.size("ws") >= 2)
          .select("doc_id", (F.size("ws") - 1).alias("nb"),
                  F.explode(bigrams).alias("b")))
    t2 = (bg.groupBy("doc_id", "nb", "b").count()
          .groupBy("doc_id", "nb").agg(F.max("count").alias("m2")))
    return (t1.join(t2, "doc_id", "left")
            .select("doc_id",
                    (F.col("m1").cast("double") / F.col("nw"))
                    .alias("top_word_frac"),
                    (F.col("m2").cast("double") / F.col("nb"))
                    .alias("top_bigram_frac")))


@register(
    "pipeline_clean_corpus",
    oracle=rf"""
    WITH q AS (
      SELECT doc_id,
             (CASE WHEN length(text) >= 50 AND length(text) <= 10000
                   THEN 1.0 ELSE 0.5 END) * 0.2
             + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     AS DOUBLE) / length(text)) * 0.4
             + (CAST(len(list_distinct(
                    regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
                / len(regexp_split_to_array(trim(text), '\s+'))) * 0.4
               AS quality
      FROM documents),
    l AS (
      SELECT doc_id,
             CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS detected_lang
      FROM (SELECT doc_id,
                   len(list_intersect(words, {_MARKER_SQL['de']})) AS s_de,
                   len(list_intersect(words, {_MARKER_SQL['en']})) AS s_en,
                   len(list_intersect(words, {_MARKER_SQL['es']})) AS s_es,
                   len(list_intersect(words, {_MARKER_SQL['fr']})) AS s_fr
            FROM (SELECT doc_id, list_distinct(string_split(
                    regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
                    AS words FROM documents))),
    k AS (
      SELECT doc_id,
             MIN(doc_id) OVER (
               PARTITION BY regexp_replace(trim(lower(text)), '\s+', ' ',
                                           'g')) AS canonical_id
      FROM documents)
    SELECT d.doc_id, l.detected_lang AS lang, q.quality,
           CAST(CASE WHEN trim(d.text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END
                AS BIGINT) AS ws_tokens
    FROM documents d
    JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN k USING (doc_id)
    WHERE q.quality >= 0.55
      AND l.detected_lang <> 'und'
      AND k.canonical_id = d.doc_id
    """,
    description="flagship LLM-pipeline composite: quality filter -> "
                "language filter -> keep only dedup-canonical docs -> "
                "token counts; the whole cleaning flow as one "
                "declarative plan (each stage shares one corpus scan)",
    tags=("text", "dedup", "pipeline"),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    w = F.min("doc_id").over(W.partitionBy(normalize_text(F.col("text"))))
    return (d.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("quality"),
        T.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        w.alias("_canon"))
        .filter((F.col("quality") >= 0.55)
                & (F.col("lang") != "und")
                & (F.col("_canon") == F.col("doc_id")))
        .drop("_canon"))


@register(
    "corpus_budget_fill",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
                  AS BIGINT) AS tokens,
             CAST(length(text) AS DOUBLE) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents
      -- empty/whitespace-only docs excluded in BOTH engines: they
      -- tokenize to 0 (Spark) vs 1 (DuckDB split) and their quality
      -- divides by zero differently (NULL vs NaN) — out of scope for
      -- a budget fill either way
      WHERE trim(text) <> ''),
    q AS (
      SELECT doc_id, tokens,
             (CASE WHEN n >= 50 AND n <= 10000 THEN 1.0 ELSE 0.5 END)
               * 0.2
               + (alpha / n) * 0.4
               + (CAST(len(list_distinct(words)) AS DOUBLE) / len(words))
                 * 0.4 AS quality
      FROM s),
    c AS (
      SELECT doc_id, quality, tokens,
             CAST(SUM(tokens) OVER (ORDER BY quality DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_tokens
      FROM q)
    SELECT doc_id, quality, tokens, cum_tokens
    FROM c WHERE cum_tokens <= 12000
    """,
    description="quality-ranked token-budget fill: take the best docs "
                "until 12k tokens — the data-recipe selection step, "
                "built as a distributed prefix sum (range partition + "
                "per-partition running sum + driver-held offsets), "
                "never a single-task global window",
    tags=("text", "curation"),
)
def corpus_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.curation import budget_fill

    d = (load_table(spark, sf_dir, "documents")
         .filter(F.trim(F.col("text")) != ""))
    prep = (d.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).alias("tok"),
        T.quality_score(F.col("text")).alias("quality"))
        .withColumn("_nq", -F.col("quality")))
    out = budget_fill(prep, ["_nq", "doc_id"], F.col("tok"),
                      budget=12_000, keep_cols=("quality",))
    return out.select("doc_id", "quality", "tokens", "cum_tokens")


@register(
    "text_gopher_rules",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w,
             length(regexp_replace(text, '\s', '', 'g')) AS nsp,
             length(text)
               - length(replace(text, '#', ''))
               + len(regexp_extract_all(text, '\.\.\.')) AS sym
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(nsp AS DOUBLE) / len(w) AS mean_word_len,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / len(w) AS alpha_word_ratio,
             CAST(sym AS DOUBLE) / len(w) AS symbol_ratio,
             CAST(len(list_intersect(
                    list_distinct(list_transform(w, x -> lower(x))),
                    ['the','be','to','of','and','that','have','with']))
                  AS BIGINT) AS n_stop_hits
      FROM s)
    SELECT doc_id, n_words, mean_word_len, alpha_word_ratio,
           symbol_ratio, n_stop_hits,
           n_words BETWEEN 50 AND 100000 AS rule_word_count,
           mean_word_len BETWEEN 3.0 AND 10.0 AS rule_word_length,
           symbol_ratio < 0.1 AS rule_symbol_ratio,
           alpha_word_ratio > 0.8 AS rule_alpha_words,
           n_stop_hits >= 2 AS rule_stopwords,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_ratio < 0.1 AND alpha_word_ratio > 0.8
             AND n_stop_hits >= 2 AS gopher_pass
    FROM m
    """,
    description="Gopher corpus-quality rules (Rae et al. 2021 A1.1): "
                "word count / mean word length / symbol ratio / "
                "alphabetic-word fraction / stopword-presence booleans "
                "plus the conjunction — the canonical pre-training "
                "filter, per-rule auditable",
    tags=("text", "curation"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = T.gopher_stats(F.col("text"))
    stats = d.select("doc_id", *[v.alias(k) for k, v in s.items()])
    r = T.gopher_rules({k: F.col(k) for k in s})
    return stats.select("*", *[v.alias(k) for k, v in r.items()])


@register(
    "text_bpe_pair_counts",
    oracle=r"""
    WITH words AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
                   FROM documents),
    pairs AS (SELECT substr(w, i, 2) AS pair
              FROM words, LATERAL unnest(range(1, length(w))) t(i)
              WHERE length(w) >= 2)
    SELECT pair, COUNT(*) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 50
    """,
    description="BPE-trainer counting kernel: corpus-wide frequency of "
                "adjacent character pairs inside tokens (the argmax of "
                "round 1 of byte-pair-encoding training), top-50 with "
                "deterministic tie-break — map-side explode, one count "
                "shuffle, distributed top-k",
    tags=("text", "tokenizer"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = (d.select(F.explode(F.split(F.col("text"), r"\s+")).alias("w"))
             .filter(F.length("w") >= 2))
    pairs = words.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), "pair").limit(50))


@register(
    "corpus_shuffle_shards",
    oracle="""
    WITH s AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
               FROM documents)
    SELECT doc_id,
           CAST(concat('0x', substr(hx, 1, 8)) AS BIGINT) % 16 AS shard,
           CAST(ROW_NUMBER() OVER (
                  PARTITION BY CAST(concat('0x', substr(hx, 1, 8))
                               AS BIGINT) % 16
                  ORDER BY hx, doc_id) AS BIGINT) AS pos
    FROM s
    """,
    description="deterministic global shuffle for training writes: "
                "md5-permutation -> (shard, intra-shard pos); "
                "engine-portable random order with per-shard windows, "
                "never a global sort",
    tags=("text", "sampling"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sampling import shuffle_shard_assign

    return shuffle_shard_assign(load_table(spark, sf_dir, "documents"),
                                key_col="doc_id", n_shards=16)


@register(
    "text_stopword_ratio",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             string_split(
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')
               AS words
      FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(words,
                    x -> list_contains({_MARKER_SQL['en']}, x)))
                AS DOUBLE) / len(words) AS en_stopword_ratio
    FROM w
    """,
    description="stopword-ratio quality signal (en marker set)",
    tags=("text",),
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.stopword_ratio(F.col("text"), "en").alias("en_stopword_ratio"),
    )


@register(
    "pipeline_train_prep",
    oracle=rf"""
    WITH q AS (
      SELECT doc_id,
             (CASE WHEN length(text) >= 50 AND length(text) <= 10000
                   THEN 1.0 ELSE 0.5 END) * 0.2
             + (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     AS DOUBLE) / length(text)) * 0.4
             + (CAST(len(list_distinct(
                    regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
                / len(regexp_split_to_array(trim(text), '\s+'))) * 0.4
               AS quality
      FROM documents),
    l AS (
      SELECT doc_id,
             CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS detected_lang
      FROM (SELECT doc_id,
                   len(list_intersect(words, {_MARKER_SQL['de']})) AS s_de,
                   len(list_intersect(words, {_MARKER_SQL['en']})) AS s_en,
                   len(list_intersect(words, {_MARKER_SQL['es']})) AS s_es,
                   len(list_intersect(words, {_MARKER_SQL['fr']})) AS s_fr
            FROM (SELECT doc_id, list_distinct(string_split(
                    regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
                    AS words FROM documents))),
    k AS (
      SELECT doc_id,
             MIN(doc_id) OVER (
               PARTITION BY regexp_replace(trim(lower(text)), '\s+', ' ',
                                           'g')) AS canonical_id
      FROM documents),
    survivors AS (
      SELECT d.doc_id, d.source, l.detected_lang AS lang, q.quality,
             CAST(CASE WHEN trim(d.text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END
                  AS BIGINT) AS tokens
      FROM documents d
      JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN k USING (doc_id)
      WHERE q.quality >= 0.55
        AND l.detected_lang <> 'und'
        AND k.canonical_id = d.doc_id),
    packed AS (
      SELECT *, sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
      FROM survivors)
    SELECT doc_id, source, lang, quality, tokens,
           CAST((cum - tokens) // 2048 AS BIGINT) AS seq_id,
           CASE WHEN CAST(concat('0x',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 80 THEN 'train'
                WHEN CAST(concat('0x',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM packed
    """,
    description="end-to-end training-data prep in ONE declarative plan: "
                "quality gate -> language filter -> dedup-canonical -> "
                "greedy sequence packing per source shard -> "
                "deterministic train/valid/test split; composes "
                "textops + dedup + curation.pack_sequences + "
                "sampling.split_assign",
    tags=("text", "curation", "pipeline"),
)
def pipeline_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.curation import pack_sequences
    from g1_etl_spark.operators.dedup import normalize_text
    from g1_etl_spark.operators.sampling import split_assign

    d = load_table(spark, sf_dir, "documents")
    w = F.min("doc_id").over(W.partitionBy(normalize_text(F.col("text"))))
    clean = (d.select(
        "doc_id", "source",
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("quality"),
        T.whitespace_token_count(F.col("text")).alias("tokens"),
        w.alias("_canon"))
        .filter((F.col("quality") >= 0.55)
                & (F.col("lang") != "und")
                & (F.col("_canon") == F.col("doc_id"))))
    packed = pack_sequences(clean, budget=2048,
                            tokens_col=F.col("tokens"),
                            shard_col="source",
                            keep_cols=("lang", "quality"))
    return (packed.withColumn("split", split_assign(F.col("doc_id")))
            .select("doc_id", "source", "lang", "quality", "tokens",
                    "seq_id", "split"))


@register(
    "sample_stratified_exact",
    oracle="""
    WITH h AS (
      SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM documents),
    r AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hh, doc_id)
               AS sample_rank
      FROM h)
    SELECT lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 50
    """,
    description="exact-k-per-stratum sample (50 docs per language) by "
                "portable md5 order; skew-free two-stage top-k",
    tags=("sampling", "text"),
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sampling import stratified_exact_k

    docs = load_table(spark, sf_dir, "documents")
    return stratified_exact_k(docs, "lang", "doc_id", k=50)


@register(
    "sample_weighted_k",
    oracle="""
    WITH u AS (
      SELECT doc_id, n_chars,
             (CAST(concat('0x',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                   AS BIGINT) + 1) / 4503599627370496.0 AS u
      FROM documents),
    r AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (
               ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id)
               AS sample_rank
      FROM u)
    SELECT doc_id, n_chars, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 200
    """,
    description="weighted order sampling (Efraimidis-Spirakis A-ES): "
                "top-200 docs by u^(1/n_chars) with deterministic md5 "
                "uniforms — length-weighted without-replacement draw, "
                "reproducible on any engine/partitioning",
    tags=("sampling", "text"),
)
def sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sampling import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample_k(docs, "doc_id", "n_chars", k=200)


@register(
    "corpus_composition",
    oracle=r"""
    WITH t AS (
      SELECT source, lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS toks
      FROM documents),
    g AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             SUM(toks) AS n_tokens
      FROM t GROUP BY source, lang)
    SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens AS DOUBLE)
             / SUM(n_tokens) OVER () AS token_share
    FROM g
    """,
    description="training-mix composition report: docs/tokens per "
                "(source, language) with corpus-wide token share — "
                "the what-is-my-mix audit behind upsampling decisions",
    tags=("text", "curation"),
)
def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from g1_etl_spark.operators import textops as T

    d = load_table(spark, sf_dir, "documents")
    g = (d.select("source", "lang",
                  T.whitespace_token_count(F.col("text")).alias("toks"))
         .groupBy("source", "lang")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("toks").alias("n_tokens")))
    return g.select(
        "source", "lang", "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("n_tokens").cast("double")
         / F.sum("n_tokens").over(W.partitionBy())).alias("token_share"))


@register(
    "text_rarity_score",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(1000000000 // f.freq) AS BIGINT) AS rarity_sum,
           CAST(SUM(1000000000 // f.freq) // COUNT(*) AS BIGINT)
             AS rarity_score
    FROM toks t JOIN freq f USING (tok)
    GROUP BY t.doc_id
    """,
    description="corpus-relative rarity score: integer IDF proxy "
                "(1e9 div corpus token frequency, integer mean per "
                "doc) — engine-exact quality gating without floats; "
                "vocabulary-sized count join, AQE-chosen strategy",
    tags=("text", "curation"),
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.textops import token_rarity_scores

    return token_rarity_scores(load_table(spark, sf_dir, "documents"))


@register(
    "text_bigram_lm_nll",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(lower(text)), '\s+', ' ',
                                         'g'), ' ') AS w
      FROM documents),
    big AS (
      SELECT doc_id, z[1] AS w1, z[2] AS w2
      FROM (SELECT doc_id,
                   unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS z
            FROM toks WHERE len(w) >= 2)),
    c12 AS (SELECT w1, w2, COUNT(*) AS f12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS f1 FROM big GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab
          FROM (SELECT unnest(w) AS tok FROM toks)),
    lp AS (
      SELECT b.doc_id,
             CAST(round(ln((f1 + 0.5 * vocab) / (f12 + 0.5)) * 1000000)
                  AS BIGINT) AS nll
      FROM big b JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll) AS BIGINT) AS nll_sum,
           CAST(SUM(nll) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM lp GROUP BY doc_id
    """,
    description="CCNet-style LM quality gate: self-trained add-k bigram "
                "model, per-doc mean negative log-likelihood as a "
                "scaled integer (round(ln·1e6) — the BM25 ln-"
                "portability trick); vocabulary-sized count joins, "
                "AQE-chosen strategy, scalar V crossed in",
    tags=("text", "curation"),
)
def text_bigram_lm_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.textops import bigram_lm_scores

    return bigram_lm_scores(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_curriculum_order",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             regexp_split_to_array(trim(text), '\s+') AS words
      FROM documents),
    q AS (
      SELECT doc_id,
             (CASE WHEN n >= 50 AND n <= 10000 THEN 1.0 ELSE 0.5 END)
               * 0.2
               + (alpha / n) * 0.4
               + (CAST(len(list_distinct(words)) AS DOUBLE)
                  / len(words)) * 0.4 AS quality
      FROM s),
    r AS (
      SELECT doc_id, quality,
             ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rank,
             COUNT(*) OVER () AS total
      FROM q),
    b AS (
      SELECT doc_id,
             CAST(FLOOR((rank - 1) * 10 / total) + 1 AS INT) AS decile
      FROM r)
    SELECT doc_id, decile,
           CAST(ROW_NUMBER() OVER (
             ORDER BY decile DESC, md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS position
    FROM b
    """,
    description="curriculum data ordering: quality deciles (equi-depth "
                "via distributed global rank), best decile first, "
                "deterministic md5 shuffle WITHIN each decile, global "
                "training position — the data-recipe ordering step; "
                "both ranks use the range-partition + offset idiom, "
                "never a single-partition window",
    tags=("text", "curation", "sampling"),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.features import equidepth_bins
    from g1_etl_spark.operators.retrieval import global_rank
    from g1_etl_spark.operators.textops import quality_score

    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", quality_score(F.col("text")).alias("q"))
    binned = equidepth_bins(scored, "q", ["doc_id"], n_bins=10,
                            out_col="decile")
    ranked = global_rank(
        binned.select("doc_id", "decile",
                      F.md5(F.col("doc_id").cast("string")).alias("_h")),
        [F.desc("decile"), F.asc("_h"), F.asc("doc_id")],
        rank_col="position")
    return ranked.select("doc_id", "decile",
                         F.col("position").cast("long").alias("position"))


_BPE_STEPS = 8


def _bpe_round_ctes(k: int) -> str:
    """One BPE merge round as chained CTEs: pair counts -> argmax ->
    greedy non-overlap application via match islands + odd-parity."""
    return f"""
    n{k} AS (SELECT w, freq, pos, sym,
                    LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
             FROM t{k}),
    b{k} AS (SELECT sym AS lhs, nxt AS rhs,
                    CAST(SUM(freq) AS BIGINT) AS pair_count
             FROM n{k} WHERE nxt IS NOT NULL GROUP BY 1, 2
             ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    m{k} AS (SELECT n.w, n.freq, n.pos, n.sym, b.lhs, b.rhs,
                    COALESCE(n.sym = b.lhs AND n.nxt = b.rhs,
                             FALSE) AS m
             FROM n{k} n LEFT JOIN b{k} b ON TRUE),
    i{k} AS (SELECT *, pos - ROW_NUMBER() OVER (PARTITION BY w, m
                                                ORDER BY pos) AS isl
             FROM m{k}),
    a{k} AS (SELECT *, m AND (ROW_NUMBER() OVER (
                   PARTITION BY w, m, isl ORDER BY pos) % 2 = 1) AS ap
             FROM i{k}),
    k{k} AS (SELECT w, freq, pos,
                    CASE WHEN ap THEN lhs || rhs ELSE sym END AS sym,
                    COALESCE(LAG(ap) OVER (PARTITION BY w
                                           ORDER BY pos), FALSE) AS dr
             FROM a{k}),
    t{k + 1} AS (SELECT w, freq,
                        ROW_NUMBER() OVER (PARTITION BY w
                                           ORDER BY pos) AS pos, sym
                 FROM k{k} WHERE NOT dr)
"""


_BPE_CTES = (r"""
    WITH vocab AS (
      SELECT w, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
            FROM documents)
      WHERE length(w) > 0 GROUP BY w),
    t1 AS (SELECT w, freq, i AS pos, substr(w, i, 1) AS sym
           FROM vocab, LATERAL unnest(range(1, length(w) + 1)) t(i)),
"""
             + ",".join(_bpe_round_ctes(k)
                        for k in range(1, _BPE_STEPS + 1)))

_BPE_SQL = (_BPE_CTES
            + "".join(f"""
    SELECT CAST({k} AS INTEGER) AS merge_step, lhs, rhs, pair_count
    FROM b{k}{' UNION ALL' if k < _BPE_STEPS else ''}"""
                      for k in range(1, _BPE_STEPS + 1)))


@register(
    "text_bpe_train",
    oracle=_BPE_SQL,
    description="iterative BPE tokenizer training (Sennrich et al.): 8 "
                "greedy merge rounds over the frequency-weighted word "
                "vocabulary — pair count, lexicographic-tiebreak "
                "argmax, left-to-right non-overlap application "
                "expressed as match islands + odd parity (pure window "
                "algebra, no per-row fold); oracle unrolls the rounds "
                "as chained CTEs like PageRank, so the whole iterative "
                "algorithm is hash-checked",
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bpe_train_merges(load_table(spark, sf_dir, "documents"),
                              steps=_BPE_STEPS)


@register(
    "text_bpe_subwords",
    oracle=_BPE_CTES + f"""
    SELECT sym AS subword, CAST(SUM(freq) AS BIGINT) AS n_occurrences
    FROM t{_BPE_STEPS + 1} GROUP BY sym
    ORDER BY n_occurrences DESC, subword
    """,
    description="BPE encode stage: corpus subword frequencies after "
                "applying the 8 learned merges — what the trained "
                "tokenizer emits over this corpus; shares the "
                "engine-exact merge machinery (and unrolled oracle) "
                "with text_bpe_train",
    tags=("text", "tokenizer", "iterative"),
)
def text_bpe_subwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (T.bpe_subword_counts(load_table(spark, sf_dir, "documents"),
                                 steps=_BPE_STEPS)
            .orderBy(F.desc("n_occurrences"), "subword"))


@register(
    "text_char_entropy",
    oracle="""
    WITH pos AS (
      SELECT doc_id, length(text) AS n,
             substr(text, CAST(i AS INTEGER), 1) AS ch
      FROM documents, LATERAL unnest(range(1, length(text) + 1)) t(i)
      WHERE length(text) > 0),
    cnt AS (SELECT doc_id, n, ch, COUNT(*) AS c
            FROM pos GROUP BY 1, 2, 3),
    term AS (
      SELECT doc_id, n, c,
             c * CAST(round(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                            * 1000000) AS BIGINT) AS v
      FROM cnt)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           CAST(SUM(v) AS BIGINT) AS entropy_scaled,
           CAST(SUM(v) AS DOUBLE) / CAST(n AS DOUBLE) / 1000000
             AS entropy_nats
    FROM term GROUP BY doc_id, n
    """,
    description="per-document Shannon character entropy — the classic "
                "gibberish / compression-quality gate (0 for repeated "
                "filler, ln(alphabet) for uniform noise); char counts "
                "via one posexplode + map-side-combinable aggregate, "
                "log terms pinned to scaled integers (the ln-"
                "portability trick; n >= c keeps every term "
                "non-negative) so the doc sum is exact integer "
                "arithmetic (operators/textops.char_entropy)",
    tags=("text", "curation"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.textops import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_kl_sources",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
               ' ')) AS tok
      FROM documents),
    st AS (SELECT source, tok, COUNT(*) AS c_st
           FROM toks GROUP BY 1, 2),
    s AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
          FROM st GROUP BY 1),
    t AS (SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t
          FROM st GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st),
    term AS (
      SELECT st.source,
             st.c_st
               * CAST(round(ln(CAST(st.c_st AS DOUBLE)
                               * CAST(tot.n AS DOUBLE)
                               / (CAST(s.n_s AS DOUBLE)
                                  * CAST(t.c_t AS DOUBLE)))
                            * 1000000) AS BIGINT) AS v,
             s.n_s
      FROM st JOIN s USING (source) JOIN t USING (tok), tot)
    SELECT source, n_s AS n_tokens,
           CAST(SUM(v) AS BIGINT) AS kl_scaled,
           CAST(SUM(v) AS DOUBLE) / CAST(n_s AS DOUBLE) / 1000000
             AS kl_nats
    FROM term GROUP BY source, n_s
    """,
    description="per-source KL divergence vs the corpus token blend — "
                "the domain-shift / mixture-skew measure for multi-"
                "source training corpora; (source, token) counts and "
                "token marginals are both vocabulary-sized aggregates "
                "joined on the token key (AQE-chosen strategy), corpus "
                "total crossed in as a broadcast scalar; log-ratio "
                "terms pinned to scaled integers, Gibbs' inequality "
                "keeps the true value >= 0 (property-tested) "
                "(operators/textops.kl_divergence_by_source)",
    tags=("text", "curation", "stats"),
)
def corpus_kl_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.textops import kl_divergence_by_source

    return kl_divergence_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "text_readability",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             GREATEST(1, length(regexp_replace(text, '[^.!?]', '',
                                               'g'))) AS n_sentences,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
                  AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s', '', 'g'))
                  AS BIGINT) AS n_chars
      FROM documents)
    SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
           n_words, n_chars,
           0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             + 11.8 * (CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                       / 3.0)
             - 15.59 AS fk_grade
    FROM s
    """,
    description="Flesch-Kincaid-style readability grade per doc (chars-"
                "per-word / 3 as the syllable proxy; sentence count by "
                "terminator-character census, floor 1): a pure per-row "
                "projection — counting via regexp_replace length, no "
                "tokenizer UDF, no shuffle at all; ratios are single "
                "IEEE divides so both engines agree bit-for-bit",
    tags=("text", "curation"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_sent = F.greatest(F.lit(1),
                        F.length(F.regexp_replace(t, r"[^.!?]", "")))
    n_words = F.size(F.split(F.trim(t), r"\s+")).cast("long")
    n_chars = F.length(F.regexp_replace(t, r"\s", "")).cast("long")
    base = d.select("doc_id", n_sent.cast("long").alias("n_sentences"),
                    n_words.alias("n_words"), n_chars.alias("n_chars"))
    grade = (F.lit(0.39) * (F.col("n_words").cast("double")
                            / F.col("n_sentences").cast("double"))
             + F.lit(11.8) * (F.col("n_chars").cast("double")
                              / F.col("n_words").cast("double") / 3.0)
             - F.lit(15.59))
    return base.select("doc_id", "n_sentences", "n_words", "n_chars",
                       grade.alias("fk_grade"))


_PMI_TOP = 50


@register(
    "text_pmi_pairs",
    oracle=rf"""
    WITH pres AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split(
                 regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                 ' ')) AS tok
        FROM documents)),
    freq AS (SELECT tok, COUNT(*) AS df FROM pres GROUP BY tok),
    top AS (SELECT tok FROM freq
            ORDER BY df DESC, tok LIMIT {_PMI_TOP}),
    p AS (SELECT pres.doc_id, pres.tok FROM pres
          JOIN top USING (tok)),
    d AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM pres),
    pair AS (
      SELECT a.tok AS t1, b.tok AS t2,
             CAST(COUNT(*) AS BIGINT) AS c12
      FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2),
    m AS (SELECT tok, CAST(df AS BIGINT) AS df FROM freq
          WHERE tok IN (SELECT tok FROM top))
    SELECT pair.t1, pair.t2, pair.c12,
           m1.df AS df1, m2.df AS df2,
           CAST(round(ln(CAST(pair.c12 AS DOUBLE)
                         * CAST(d.n_docs AS DOUBLE)
                         / (CAST(m1.df AS DOUBLE)
                            * CAST(m2.df AS DOUBLE))) * 1000000)
                AS BIGINT) AS pmi_scaled
    FROM pair JOIN m m1 ON pair.t1 = m1.tok
              JOIN m m2 ON pair.t2 = m2.tok, d
    """,
    description="pointwise mutual information of token co-occurrence "
                "(document-level presence) over the top-50 corpus "
                "tokens — the collocation / association-mining "
                "primitive; the alphabet cap bounds the pair space at "
                "a CONSTANT (50*49/2) at any corpus scale, so the "
                "per-doc self-join fan-out is basket-bounded exactly "
                "like the market-basket miners; PMI pinned to scaled "
                "integers via the ln-portability trick",
    tags=("text", "stats"),
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    pres = (d.repartition(spread, "doc_id")
            .select("doc_id",
                    F.explode(F.split(normalize_text(F.col("text")),
                                      " ")).alias("tok"))
            .distinct())
    pres = pres.localCheckpoint(eager=True)  # 3 consumers below
    freq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = freq.orderBy(F.desc("df"), "tok").limit(_PMI_TOP)
    p = pres.join(F.broadcast(top.select("tok")), "tok")
    n_docs = pres.agg(
        F.countDistinct("doc_id").alias("n_docs"))
    a = p.select(F.col("doc_id"), F.col("tok").alias("t1"))
    b = p.select(F.col("doc_id"), F.col("tok").alias("t2"))
    pair = (a.join(b, "doc_id")
            .filter(F.col("t1") < F.col("t2"))
            .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12")))
    m = top.select("tok", F.col("df").cast("long").alias("df"))
    pmi = (F.round(F.ln(F.col("c12").cast("double")
                        * F.col("n_docs").cast("double")
                        / (F.col("df1").cast("double")
                           * F.col("df2").cast("double"))) * 1000000)
           .cast("long"))
    return (pair
            .join(F.broadcast(m.select(F.col("tok").alias("t1"),
                                       F.col("df").alias("df1"))), "t1")
            .join(F.broadcast(m.select(F.col("tok").alias("t2"),
                                       F.col("df").alias("df2"))), "t2")
            .crossJoin(F.broadcast(n_docs))
            .select("t1", "t2", "c12", "df1", "df2",
                    pmi.alias("pmi_scaled")))


_ZIPF_TOP = 500
_SORTSUM_SQL = "list_sum(list_sort(list({expr})))"


@register(
    "text_zipf_fit",
    oracle=rf"""
    WITH toks AS (
      SELECT unnest(string_split(
        regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS f FROM toks GROUP BY tok),
    ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS r
      FROM freq),
    fit AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)
               / 1000000.0 AS x,
             CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)
               / 1000000.0 AS y
      FROM ranked WHERE r <= {_ZIPF_TOP}),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {_SORTSUM_SQL.format(expr='x')} AS sx,
             {_SORTSUM_SQL.format(expr='x * x')} AS sxx,
             {_SORTSUM_SQL.format(expr='y')} AS sy,
             {_SORTSUM_SQL.format(expr='y * y')} AS syy,
             {_SORTSUM_SQL.format(expr='x * y')} AS sxy
      FROM fit)
    SELECT CAST(n AS BIGINT) AS n_ranks,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept,
           (n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM m
    """,
    description="Zipf's-law exponent fit: OLS of ln(freq) on ln(rank) "
                "over the top-500 token ranks — the classic corpus "
                "health check (natural text slopes near -1; synthetic "
                "or deduplicated corpora drift); composes the "
                "distributed total-order rank (no single-partition "
                "window on the Spark side; the oracle's ROW_NUMBER is "
                "that single-task form) with the one-pass OLS moment "
                "machinery; each ln is pinned to a scaled integer "
                "before the sorted-sequential moment sums, so the fit "
                "is engine-exact; the fit region is a CONSTANT 500 "
                "rows at any corpus scale",
    tags=("text", "stats", "scale"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text
    from g1_etl_spark.operators.features import ols_per_group
    from g1_etl_spark.operators.retrieval import global_rank

    d = load_table(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    toks = (d.repartition(spread, "doc_id")
            .select(F.explode(F.split(normalize_text(F.col("text")),
                                      " ")).alias("tok")))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    ranked = global_rank(freq, [F.desc("f"), F.asc("tok")],
                         rank_col="r")

    def pin_ln(c):
        return (F.round(F.ln(c.cast("double")) * 1000000).cast("long")
                / F.lit(1000000.0))

    fit = (ranked.filter(F.col("r") <= _ZIPF_TOP)
           .select(pin_ln(F.col("r")).alias("x"),
                   pin_ln(F.col("f")).alias("y"),
                   F.lit(1).alias("g")))
    out = ols_per_group(fit, "x", "y", ["g"])
    return out.select(F.col("n").cast("long").alias("n_ranks"),
                      F.col("slope").alias("zipf_slope"),
                      "intercept", "r2")


@register(
    "text_heaps_fit",
    oracle=rf"""
    WITH toks AS (
      SELECT source, unnest(string_split(
        regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS tok
      FROM documents),
    m AS (SELECT source, COUNT(*) AS n_tok, COUNT(DISTINCT tok) AS v
          FROM toks GROUP BY source),
    fit AS (
      SELECT CAST(round(ln(CAST(n_tok AS DOUBLE)) * 1000000) AS BIGINT)
               / 1000000.0 AS x,
             CAST(round(ln(CAST(v AS DOUBLE)) * 1000000) AS BIGINT)
               / 1000000.0 AS y
      FROM m),
    mm AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {_SORTSUM_SQL.format(expr='x')} AS sx,
             {_SORTSUM_SQL.format(expr='x * x')} AS sxx,
             {_SORTSUM_SQL.format(expr='y')} AS sy,
             {_SORTSUM_SQL.format(expr='y * y')} AS syy,
             {_SORTSUM_SQL.format(expr='x * y')} AS sxy
      FROM fit)
    SELECT CAST(n AS BIGINT) AS n_sources,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS heaps_beta,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept,
           (n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM mm
    """,
    description="Heaps'-law fit: OLS of ln(vocabulary size) on "
                "ln(token count) across sources — vocabulary-growth "
                "exponent beta (natural text ~0.4-0.6; template/"
                "boilerplate corpora collapse toward 0, random noise "
                "toward 1), the companion corpus health check to "
                "text_zipf_fit and corpus_kl_sources. Per-source "
                "(N, V) is one tokenize + groupBy pass; the fit frame "
                "is |sources| rows (constant); same pinned-ln + "
                "sorted-moment OLS machinery as the Zipf fit",
    tags=("text", "stats"),
)
def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text
    from g1_etl_spark.operators.features import ols_per_group

    d = load_table(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    toks = (d.repartition(spread, "doc_id")
            .select("source",
                    F.explode(F.split(normalize_text(F.col("text")),
                                      " ")).alias("tok")))
    m = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("tok").alias("v"))

    def pin_ln(c):
        return (F.round(F.ln(c.cast("double")) * 1000000).cast("long")
                / F.lit(1000000.0))

    fit = m.select(pin_ln(F.col("n_tok")).alias("x"),
                   pin_ln(F.col("v")).alias("y"),
                   F.lit(1).alias("g"))
    out = ols_per_group(fit, "x", "y", ["g"])
    return out.select(F.col("n").cast("long").alias("n_sources"),
                      F.col("slope").alias("heaps_beta"),
                      "intercept", "r2")


_TR_ITERS = 10
_TR_SCALE = 1_000_000_000_000


def _tr_iter_cte(k: int) -> str:
    return f"""
    d{k} AS (
      SELECT t.state,
             0.15 / CAST(cnt.c AS DOUBLE)
               + 0.85 * COALESCE(s.v, 0.0) AS dp
      FROM nodes t CROSS JOIN cnt LEFT JOIN (
        SELECT m.j AS state,
               CAST(SUM(CAST(round(d.dp * m.p * {_TR_SCALE})
                             AS BIGINT)) AS DOUBLE) / {_TR_SCALE} AS v
        FROM d{k - 1} d JOIN mat m ON d.state = m.i
        GROUP BY m.j) s USING (state))
"""


_TEXTRANK_SQL = (rf"""
    WITH pres AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split(
                 regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                 ' ')) AS tok
        FROM documents)),
    freq AS (SELECT tok, COUNT(*) AS df FROM pres GROUP BY tok),
    top AS (SELECT tok FROM freq
            ORDER BY df DESC, tok LIMIT {_PMI_TOP}),
    p AS (SELECT pres.doc_id, pres.tok FROM pres JOIN top USING (tok)),
    pairs AS (
      SELECT a.tok AS i, b.tok AS j, CAST(COUNT(*) AS BIGINT) AS c
      FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.tok <> b.tok
      GROUP BY 1, 2),
    deg AS (SELECT i, SUM(c) AS w FROM pairs GROUP BY i),
    mat AS (SELECT pairs.i, pairs.j,
                   CAST(c AS DOUBLE) / CAST(w AS DOUBLE) AS p
            FROM pairs JOIN deg USING (i)),
    nodes AS (SELECT tok AS state FROM top),
    cnt AS (SELECT COUNT(*) AS c FROM nodes),
    d0 AS (SELECT state, CAST(1.0 AS DOUBLE) / cnt.c AS dp
           FROM nodes CROSS JOIN cnt)
""" + ","
                 + ",".join(_tr_iter_cte(k)
                            for k in range(1, _TR_ITERS + 1))
                 + f"""
    SELECT state AS token, dp AS textrank
    FROM d{_TR_ITERS} ORDER BY token
""")


@register(
    "text_textrank_keywords",
    oracle=_TEXTRANK_SQL,
    description="TextRank keyword scores: damped weighted PageRank "
                "(d = 0.85, 10 iterations from uniform) over the "
                "document-level co-occurrence graph of the top-50 "
                "corpus tokens (text_pmi_pairs' alphabet and pair "
                "census, kept symmetric) — the classic unsupervised "
                "keyword-extraction primitive. Row-normalized edge "
                "weights c_ij / wdeg_i; per-iteration sums go through "
                "the pagerank scaled-long trick and the damping term "
                "is one fixed double tree, so the fixed point is "
                "engine-exact; oracle = the same 10 iterations "
                "unrolled as chained CTEs. Scale shape: one data-sized "
                "distinct-presence pass; the graph is <= 50x49 edges "
                "(CONSTANT at any corpus scale), every iteration joins "
                "broadcast-tiny frames",
    tags=("text", "graph", "iterative"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    spread = spark.sparkContext.defaultParallelism
    pres = (d.repartition(spread, "doc_id")
            .select("doc_id",
                    F.explode(F.split(normalize_text(F.col("text")),
                                      " ")).alias("tok"))
            .distinct())
    pres = pres.localCheckpoint(eager=True)  # feeds freq + pair census
    freq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = (freq.orderBy(F.desc("df"), "tok").limit(_PMI_TOP)
           .localCheckpoint(eager=True))  # feeds pair join + fold ids
    p = pres.join(F.broadcast(top.select("tok")), "tok")
    a = p.select("doc_id", F.col("tok").alias("i"))
    b = p.select("doc_id", F.col("tok").alias("j"))
    pairs = (a.join(b, "doc_id")
             .filter(F.col("i") != F.col("j"))
             .groupBy("i", "j").agg(F.count(F.lit(1)).alias("c")))
    deg = pairs.groupBy("i").agg(F.sum("c").alias("w"))
    mat = (pairs.join(deg, "i")
           .select("i", "j", (F.col("c").cast("double")
                              / F.col("w").cast("double")).alias("p")))
    # Bounded-alphabet fold (operators/folded): the token graph is
    # <= 50x49 edges at any corpus scale, so the 10 damped rounds run
    # as one expression instead of 30+ tiny scheduled stages; per-edge
    # arithmetic is the exact round(dp*p*1e12)-sum-BIGINT tree of the
    # pre-r11 loop, so the fixed point is bit-identical.
    row = bounded_graph_row(top.select("tok"), "tok", mat,
                            ["i", "j", "p"])
    ids, ed = F.col("ids"), F.col("edges")

    def build(inm):
        c = F.size(ids)

        def contrib(m, v):
            return F.aggregate(
                F.element_at(inm, v), F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.round(F.element_at(m, g["i"]) * g["p"]
                          * _TR_SCALE).cast("long"))

        def step(m, _k):
            return F.map_from_arrays(ids, F.transform(ids, lambda v:
                F.lit(0.15) / c.cast("double")
                + F.lit(0.85)
                * (contrib(m, v).cast("double") / _TR_SCALE)))

        d0 = F.map_from_arrays(ids, F.transform(
            ids, lambda v: F.lit(1.0).cast("double") / c))
        return iterate(_TR_ITERS, d0, step)

    fin = bind(in_adjacency(ids, ed, "j"), build)
    return (row.select(F.explode(fin).alias("token", "textrank"))
            .orderBy("token"))


@register(
    "text_nb_lang_confusion",
    oracle="""
    WITH tok AS (SELECT doc_id, lang,
                        unnest(string_split(text, ' ')) AS word
                 FROM documents),
    dw AS (SELECT doc_id, word, COUNT(*) AS n FROM tok GROUP BY 1, 2),
    cw AS (SELECT lang, word, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM cw GROUP BY 1),
    vv AS (SELECT COUNT(DISTINCT word) AS v FROM tok),
    langs AS (SELECT DISTINCT lang FROM documents),
    vocab AS (SELECT DISTINCT word FROM tok),
    ll AS (SELECT l.lang, w.word,
                  CAST(round(ln((COALESCE(c.c, 0) + 1)
                                / CAST(t.t + vv.v AS DOUBLE))
                             * 1000000) AS BIGINT) AS lw
           FROM langs l CROSS JOIN vocab w CROSS JOIN vv
           JOIN tl t ON t.lang = l.lang
           LEFT JOIN cw c ON c.lang = l.lang AND c.word = w.word),
    dl AS (SELECT lang, COUNT(*) AS dn FROM documents GROUP BY 1),
    tot AS (SELECT COUNT(*) AS dtot FROM documents),
    pri AS (SELECT lang, CAST(round(ln(CAST(dn AS DOUBLE) / dtot)
                                    * 1000000) AS BIGINT) AS lp
            FROM dl CROSS JOIN tot),
    sc AS (SELECT dw.doc_id, ll.lang,
                  pri.lp + CAST(SUM(dw.n * ll.lw) AS BIGINT) AS score
           FROM dw JOIN ll ON dw.word = ll.word
           JOIN pri ON pri.lang = ll.lang
           GROUP BY dw.doc_id, ll.lang, pri.lp),
    pred AS (SELECT doc_id, lang AS predicted,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, lang DESC)
                      AS rn
             FROM sc)
    SELECT d.lang AS actual_lang, p.predicted AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id AND p.rn = 1
    GROUP BY 1, 2
    """,
    description="one-pass multinomial naive-Bayes language classifier "
                "trained ON the corpus itself and self-scored into an "
                "actual x predicted confusion matrix — the "
                "train-a-quality/lang-classifier-from-the-data "
                "primitive of curation pipelines (complement of "
                "text_lang_id's fixed n-gram heuristic: here the model "
                "IS an aggregation of the data). Laplace-smoothed "
                "log-likelihoods ln((c+1)/(T_lang+V)) and log-priors "
                "are PINNED to scaled integers (the ln-grid idiom of "
                "the Zipf/Heaps fits), which makes every per-doc score "
                "an exact BIGINT dot product — order-free, so no "
                "sortsum is needed anywhere despite per-doc sums over "
                "hundreds of tokens; argmax ties break (score DESC, "
                "lang DESC) identically in both engines. Scale shape: "
                "two token-keyed groupBys (doc-term + class-term), a "
                "vocab x |langs| likelihood frame linear in vocabulary "
                "(|langs| is a small constant), one word-keyed score "
                "join sharing tf-idf's hot-token skew profile, and a "
                "per-doc (high-cardinality) argmax window",
    tags=("text", "ml", "classify"),
)
def text_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang",
                      F.explode(F.split("text", " ")).alias("word"))
    dw = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n"))
    cw = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("c"))
    tl = cw.groupBy("lang").agg(F.sum("c").cast("long").alias("t"))
    vv = tok.agg(F.countDistinct("word").alias("v"))
    langs = docs.select("lang").distinct()
    vocab = tok.select("word").distinct()
    pin = lambda c: F.round(F.log(c) * 1_000_000).cast("long")  # noqa: E731
    ll = (langs.crossJoin(vocab).crossJoin(F.broadcast(vv))
          .join(tl, "lang")
          .join(cw, ["lang", "word"], "left")
          .select("lang", "word",
                  pin((F.coalesce(F.col("c"), F.lit(0)) + 1)
                      .cast("double")
                      / (F.col("t") + F.col("v")).cast("double"))
                  .alias("lw")))
    dl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("dn"))
    tot = docs.agg(F.count(F.lit(1)).alias("dtot"))
    pri = (dl.crossJoin(F.broadcast(tot))
           .select("lang", pin(F.col("dn").cast("double")
                               / F.col("dtot")).alias("lp")))
    sc = (dw.join(ll, "word").join(F.broadcast(pri), "lang")
          .groupBy("doc_id", "lang", "lp")
          .agg(F.sum(F.col("n") * F.col("lw")).cast("long").alias("s"))
          .select("doc_id", "lang", (F.col("lp") + F.col("s"))
                  .alias("score")))
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.desc("lang"))
    pred = (sc.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", F.col("lang").alias("predicted_lang")))
    return (docs.select("doc_id", F.col("lang").alias("actual_lang"))
            .join(pred, "doc_id")
            .groupBy("actual_lang", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


_FH_DIM = 64


@register(
    "text_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents),
    h AS (SELECT doc_id,
                 CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT)
                   % {_FH_DIM} AS bucket,
                 CASE WHEN CAST(concat('0x', substr(md5(w), 9, 1))
                            AS BIGINT) % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM tok)
    SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS value
    FROM h GROUP BY 1, 2
    ORDER BY doc_id, bucket
    """,
    description=f"feature hashing (the 'hashing trick', Weinberger et "
                f"al.): every token maps to one of {_FH_DIM} buckets "
                "via md5 with a +/-1 hash sign, giving each document "
                "a fixed-width signed-count vector with NO vocabulary "
                "pass at all — the vectorizer that scales when even "
                "the vocab census is too big, and the standard input "
                "to linear classifiers at web scale (pairs with "
                "feature_plans.logistic_irls_cells). Emitted in long "
                "(doc, bucket, value) form — exact integer sums, one "
                "narrow explode + one groupBy, nothing wider than "
                "docs x dim shuffles; the md5 bucket/sign are the "
                "engine-portable shuffle-shards idiom",
    tags=("text", "features"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.explode(F.split(F.col("text"), " ")).alias("w"))
    hx = F.md5(F.col("w"))
    bucket = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
              % _FH_DIM)
    sgn = F.when(F.conv(F.substring(hx, 9, 1), 16, 10).cast("long")
                 % 2 == 0, 1).otherwise(-1)
    return (tok.select("doc_id", bucket.alias("bucket"),
                       sgn.alias("sgn"))
            .groupBy("doc_id", "bucket")
            .agg(F.sum("sgn").cast("long").alias("value"))
            .orderBy("doc_id", "bucket"))


@register(
    "text_hapax_yule",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    freq AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
             FROM toks GROUP BY 1, 2),
    spec AS (SELECT source,
                    CAST(SUM(m) AS BIGINT) AS n_tokens,
                    CAST(COUNT(*) AS BIGINT) AS vocab,
                    CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS hapax,
                    CAST(SUM(CAST(m AS HUGEINT) * m) AS BIGINT) AS smm
             FROM freq GROUP BY source)
    SELECT source, n_tokens, vocab, hapax,
           CAST(hapax AS DOUBLE) / vocab AS hapax_ratio,
           10000.0 * (CAST(smm AS DOUBLE) - n_tokens)
           / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             AS yule_k
    FROM spec ORDER BY source
    """,
    description="lexical-richness profile per source: hapax-legomenon "
                "ratio (once-only types / vocabulary — high = fresh "
                "text, low = template churn) and Yule's K "
                "(10^4 * (sum m^2 V_m - N) / N^2, the length-"
                "invariant repetitiveness characteristic) — the "
                "vocabulary-spectrum quality signals next to "
                "text_zipf_fit's slope: same spectrum, different "
                "diagnostic (K is what catches boilerplate farms "
                "whose Zipf slope still looks natural). Exact: the "
                "frequency spectrum and both moment sums are pure "
                "integers (sum m^2 through 128-bit), the two ratios "
                "one shared double tree. Scale shape: one (source, "
                "token) census exchange — the text_rarity_score "
                "class; per-source aggregates are "
                "vocabulary-bounded",
    tags=("text", "quality"),
)
def text_hapax_yule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " "))
        .alias("tok"))
    freq = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("m")))
    d38 = "decimal(38,0)"
    spec = (freq.groupBy("source")
            .agg(F.sum("m").cast("long").alias("n_tokens"),
                 F.count(F.lit(1)).cast("long").alias("vocab"),
                 F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
                 .cast("long").alias("hapax"),
                 F.sum(F.col("m").cast(d38) * F.col("m")).cast("long")
                 .alias("smm")))
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return (spec.select(
        "source", "n_tokens", "vocab", "hapax",
        (dd("hapax") / F.col("vocab")).alias("hapax_ratio"),
        (F.lit(10000.0) * (dd("smm") - F.col("n_tokens"))
         / (dd("n_tokens") * dd("n_tokens"))).alias("yule_k"))
        .orderBy("source"))


_BD_M = 20  # most-frequent-word panel size (classic Delta uses 30-150)


@register(
    "text_burrows_delta",
    oracle=rf"""
    WITH toks AS (
      SELECT source,
             unnest(string_split(
               regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))
               AS tok
      FROM documents),
    freq AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
             FROM toks GROUP BY 1, 2),
    tot AS (SELECT source, CAST(SUM(m) AS BIGINT) AS n FROM freq
            GROUP BY source),
    top AS (SELECT tok FROM (
              SELECT tok, SUM(m) AS c FROM freq GROUP BY tok
              ORDER BY c DESC, tok LIMIT {_BD_M})),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM tot),
    dense AS (SELECT t.source, w.tok,
                     CAST(COALESCE(f.m, 0) AS DOUBLE) / t.n AS fr
              FROM tot t CROSS JOIN top w
              LEFT JOIN freq f ON f.source = t.source
                              AND f.tok = w.tok),
    mu AS (SELECT tok, list_sum(list_sort(list(fr))) / ANY_VALUE(k)
                    AS mean_f
           FROM dense CROSS JOIN kk GROUP BY tok),
    sd AS (SELECT d.tok,
                  sqrt(list_sum(list_sort(list(
                      (d.fr - mu.mean_f) * (d.fr - mu.mean_f))))
                    / (ANY_VALUE(k) - 1)) AS sd_f
           FROM dense d JOIN mu USING (tok) CROSS JOIN kk
           GROUP BY d.tok),
    z AS (SELECT d.source, d.tok,
                 CASE WHEN sd.sd_f > 0
                      THEN (d.fr - mu.mean_f) / sd.sd_f
                      ELSE 0.0 END AS z
          FROM dense d JOIN mu USING (tok) JOIN sd USING (tok))
    SELECT a.source AS source_a, b.source AS source_b,
           list_sum(list_sort(list(abs(a.z - b.z)))) / {_BD_M}.0
             AS delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description=f"Burrows' Delta stylometric distance between every "
                f"source pair: relative frequencies of the corpus's "
                f"top-{_BD_M} words, z-scored per word across "
                "sources, Delta = mean |z_a - z_b| — the classic "
                "authorship-attribution measure repurposed as a "
                "PROVENANCE signal ('which data sources write "
                "alike'), the stylometric complement to "
                "corpus_kl_sources' distributional divergence. "
                "Determinism: frequencies are exact integer "
                "divisions; every cross-source reduction (per-word "
                "mean, variance, and the per-pair |z| mean) runs "
                "sorted-sequential, zero-variance words pin z to 0. "
                "Scale shape: one (source, token) census exchange "
                "(the hapax/rarity class); everything after is "
                "(sources x 20)- and (pairs x 20)-bounded codebook "
                "frames",
    tags=("text", "quality", "stats"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.dedup import normalize_text

    def sortsum(expr):
        return F.aggregate(F.array_sort(F.collect_list(expr)),
                           F.lit(0.0), lambda acc, x: acc + x)

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " "))
        .alias("tok"))
    freq = (toks.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("m")))
    tot = freq.groupBy("source").agg(F.sum("m").cast("long").alias("n"))
    top = (freq.groupBy("tok").agg(F.sum("m").alias("c"))
           .orderBy(F.col("c").desc(), "tok").limit(_BD_M)
           .select("tok"))
    kk = tot.agg(F.count(F.lit(1)).cast("long").alias("k"))
    dense = (tot.crossJoin(F.broadcast(top))
             .join(freq, ["source", "tok"], "left")
             .select("source", "tok",
                     (F.coalesce("m", F.lit(0)).cast("double")
                      / F.col("n")).alias("fr")))
    mu = (dense.crossJoin(F.broadcast(kk))
          .groupBy("tok")
          .agg((sortsum(F.col("fr")) / F.first("k")).alias("mean_f")))
    sd = (dense.join(F.broadcast(mu), "tok").crossJoin(F.broadcast(kk))
          .groupBy("tok")
          .agg(F.sqrt(sortsum((F.col("fr") - F.col("mean_f"))
                              * (F.col("fr") - F.col("mean_f")))
                      / (F.first("k") - 1)).alias("sd_f")))
    z = (dense.join(F.broadcast(mu), "tok").join(F.broadcast(sd), "tok")
         .select("source", "tok",
                 F.when(F.col("sd_f") > 0,
                        (F.col("fr") - F.col("mean_f")) / F.col("sd_f"))
                 .otherwise(F.lit(0.0)).alias("z")))
    a = z.select(F.col("source").alias("source_a"), "tok",
                 F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"),
                 F.col("tok").alias("tok2"), F.col("z").alias("zb"))
    return (a.join(b, (F.col("tok") == F.col("tok2"))
                   & (F.col("source_a") < F.col("source_b")))
            .groupBy("source_a", "source_b")
            .agg((sortsum(F.abs(F.col("za") - F.col("zb")))
                  / F.lit(float(_BD_M))).alias("delta"))
            .orderBy("source_a", "source_b"))
