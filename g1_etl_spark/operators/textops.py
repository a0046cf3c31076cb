"""Text-analysis operators for a training-data pipeline (superset scope;
no reference analog — BASELINE.json north star).

All pure Column expressions (codegen'd, zero UDFs): token counting,
quality scoring, language ID by marker-word voting, and content
fingerprints. Everything is per-row/narrow — at 100 TB these run
map-side with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from g1_etl_spark.operators.dedup import normalize_text, word_ngrams

# 'BPE-ish' lexer: runs of alphanumerics OR single non-space symbols —
# the shape subword tokenizers see before merges. Kept to character
# classes that behave identically in Java regex (Spark) and RE2 (DuckDB).
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# marker words per language for the voting heuristic (tiny fixed lists —
# the classic cheap lang-id: count language-exclusive stopwords)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht", "das", "ein", "ich"],
    "en": ["the", "and", "of", "to", "is", "that", "it", "was"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
}


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-separated tokens."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: alphanumeric runs + standalone symbols."""
    return F.regexp_count(text, F.lit(TOKEN_RE)).cast("long")


def char_stats(text: Column) -> dict[str, Column]:
    """Quality-score ingredients, each a named Column."""
    n = F.length(text).cast("double")
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    space = F.length(F.regexp_replace(text, r"[^\s]", ""))
    words = F.split(F.trim(text), r"\s+")
    nwords = F.size(words).cast("double")
    return {
        "n_chars": n.cast("long"),
        "alpha_ratio": (alpha / n).cast("double"),
        "digit_ratio": (digit / n).cast("double"),
        "punct_ratio": (punct / n).cast("double"),
        "space_ratio": (space / n).cast("double"),
        "n_words": nwords.cast("long"),
        "avg_word_len": ((n - space) / nwords).cast("double"),
        "distinct_word_ratio":
            (F.size(F.array_distinct(words)) / nwords).cast("double"),
    }


def quality_from_stats(n_chars: Column, alpha_ratio: Column,
                       distinct_word_ratio: Column) -> Column:
    """Composite quality from already-computed stat columns — pure
    arithmetic, so a plan that selects ``char_stats`` columns can derive
    quality without re-running the five regex passes (Spark does not
    reliably CSE across independent select expressions)."""
    length_ok = F.when((n_chars >= 50) & (n_chars <= 10000),
                       F.lit(1.0)).otherwise(F.lit(0.5))
    return ((length_ok * 0.2
             + alpha_ratio * 0.4
             + distinct_word_ratio * 0.4)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, low
    alpha ratio, low vocabulary diversity. Fixed weights, deterministic."""
    s = char_stats(text)
    return quality_from_stats(s["n_chars"], s["alpha_ratio"],
                              s["distinct_word_ratio"])


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_stats(text: Column) -> dict[str, Column]:
    """Gopher corpus-quality rule ingredients (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1): word count,
    mean word length, alphabetic-word fraction, #/ellipsis symbol
    ratio, and distinct-stopword hits. Each rule is a named boolean so
    filters can be composed or audited per-rule; all built-in
    expressions, no UDFs."""
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words).cast("long")
    nw_d = n_words.cast("double")
    # mean chars per word = non-whitespace chars / words
    mean_len = (F.length(F.regexp_replace(text, r"\s", "")) / nw_d) \
        .cast("double")
    alpha_words = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]")))
    symbol_hits = (F.regexp_count(text, F.lit("#"))
                   + F.regexp_count(text, F.lit(r"\.\.\.")))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))).cast("long")
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "alpha_word_ratio": (alpha_words / nw_d).cast("double"),
        "symbol_ratio": (symbol_hits / nw_d).cast("double"),
        "n_stop_hits": stop_hits,
    }


def gopher_rules(s: dict[str, Column]) -> dict[str, Column]:
    """Rule booleans over gopher_stats output, thresholds per the
    paper: 50 <= words <= 100k, 3 <= mean word length <= 10, symbol
    ratio < 0.1, alphabetic-word fraction > 0.8, >= 2 distinct
    stopwords present."""
    rules = {
        "rule_word_count": (s["n_words"] >= 50) & (s["n_words"] <= 100_000),
        "rule_word_length": (s["mean_word_len"] >= 3.0)
        & (s["mean_word_len"] <= 10.0),
        "rule_symbol_ratio": s["symbol_ratio"] < 0.1,
        "rule_alpha_words": s["alpha_word_ratio"] > 0.8,
        "rule_stopwords": s["n_stop_hits"] >= 2,
    }
    acc = F.lit(True)
    for c in rules.values():
        acc = acc & c
    rules["gopher_pass"] = acc
    return rules


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    words = F.split(normalize_text(text), " ")
    stops = F.filter(
        words, lambda w: w.isin(*LANG_MARKERS[lang]))
    return (F.size(stops) / F.size(words)).cast("double")


def lang_id(text: Column) -> Column:
    """Marker-word vote: language whose marker set has the most DISTINCT
    hits in the text; ties and zero hits -> 'und' (undetermined).
    Tie-break: language code order (deterministic)."""
    words = F.array_distinct(F.split(normalize_text(text), " "))
    scores = {
        lang: F.size(F.array_intersect(
            words, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed so earlier language codes win ties (when overwrites later)
    for lang in sorted(scores, reverse=True):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def content_fingerprint(text: Column) -> Column:
    """md5 of normalized content — exact-dup fingerprint."""
    return F.md5(normalize_text(text))


def shingle_fingerprint(text: Column, n: int = 3) -> Column:
    """md5 over the SORTED distinct word n-grams — order-insensitive
    content fingerprint (bag-of-shingles identity)."""
    grams = F.array_sort(word_ngrams(normalize_text(text), n))
    return F.md5(F.array_join(grams, ""))


def token_rarity_scores(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        scale: int = 1_000_000_000) -> DataFrame:
    """Corpus-relative rarity score per document — an IDF-flavoured
    quality proxy with NO floating point: each token contributes
    ``scale // corpus_frequency`` (integer division), and the document
    score is the integer mean over its tokens. Documents of boilerplate
    (high-frequency tokens) score near zero; documents of rare content
    score high. Integer arithmetic end-to-end, so any engine agrees
    bit-for-bit — the reason this uses 1e9//freq instead of log(N/freq)
    (ln() last-ulp behaviour is engine-specific; a quality GATE only
    needs a monotone transform, and 1/freq is as monotone as log).

    Scale shape: one pass builds corpus token counts (map-side partial
    agg, shuffle is distinct-token-sized); the per-doc pass explodes
    tokens and joins the counts. The count table is vocabulary-sized —
    Zipf makes that far smaller than the corpus, and the join needs no
    broadcast hint: AQE broadcasts while it fits, else both sides hash
    on the token, which is exactly the right fallback at 100 TB.
    Returns (id, n_tokens, rarity_sum, rarity_score).
    """
    from g1_etl_spark.operators.dedup import normalize_text

    spread = docs.sparkSession.sparkContext.defaultParallelism
    toks = (docs.repartition(spread, id_col)
            .select(F.col(id_col),
                    F.explode(F.split(normalize_text(F.col(text_col)),
                                      " ")).alias("tok")))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return (toks.join(freq, "tok")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.expr(f"{scale} div freq")).alias("rarity_sum"))
            .select(id_col, "n_tokens", "rarity_sum",
                    F.expr("rarity_sum div n_tokens").cast("long")
                    .alias("rarity_score")))


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", k_smooth: float = 0.5,
                     scale: int = 1_000_000) -> DataFrame:
    """Self-trained bigram language-model scoring — the CCNet-style
    quality gate (train an n-gram LM, keep the low-perplexity tail)
    expressed as two count aggregations and two vocabulary-sized joins.

    Model: add-k smoothing, P(w2|w1) = (c(w1,w2)+k) / (c(w1)+k·V) with
    c(w1) counted over bigram-first positions and V the corpus
    vocabulary. Each bigram contributes a POSITIVE scaled integer
    nll = round(ln((c(w1)+k·V)/(c(w1,w2)+k)) · scale)  (the ratio is
    always > 1, so no negative rounding — Spark HALF_UP and DuckDB
    round() agree on positives; same ln-portability trick as the BM25
    oracle). Per-doc output: (doc_id, n_bigrams, nll_sum, avg_nll);
    avg_nll/scale is the mean negative log-likelihood, exp() of it the
    perplexity — monotone either way, so the gate needs no float exp.
    Docs with fewer than two tokens have no bigrams and are excluded.

    Scale shape: bigram counts are a map-side-partial groupBy whose
    result is distinct-bigram-sized (Zipf keeps that far below corpus
    size); the score pass joins the exploded bigram stream against the
    two count tables on (w1,w2)/(w1) — AQE broadcasts while they fit,
    else hash-joins on the token key, the right fallback at 100 TB. V
    is a one-row aggregate crossed in (broadcast scalar, no collect).
    """
    from g1_etl_spark.operators.dedup import normalize_text

    spread = docs.sparkSession.sparkContext.defaultParallelism
    words = (docs.repartition(spread, id_col)
             .select(F.col(id_col),
                     F.split(normalize_text(F.col(text_col)), " ")
                     .alias("w")))
    big = (words.filter(F.size("w") >= 2)
           .select(F.col(id_col),
                   F.explode(F.expr(
                       "transform(sequence(1, size(w) - 1), "
                       "i -> struct(w[i-1] AS w1, w[i] AS w2))"))
                   .alias("b"))
           .select(id_col, F.col("b.w1").alias("w1"),
                   F.col("b.w2").alias("w2")))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("f12"))
    # c(w1) over bigram-first positions == sum of c(w1,·): fold the
    # (already vocabulary-sized) bigram counts instead of paying a
    # fourth corpus scan + explode + shuffle
    c1 = c12.groupBy("w1").agg(F.sum("f12").alias("f1"))
    vocab = (words.select(F.explode("w").alias("tok"))
             .agg(F.countDistinct("tok").alias("vocab")))
    scored = (big.join(c12, ["w1", "w2"]).join(c1, ["w1"])
              .join(F.broadcast(vocab))
              .select(F.col(id_col),
                      F.round(F.log(
                          (F.col("f1") + k_smooth * F.col("vocab"))
                          / (F.col("f12") + F.lit(k_smooth))) * scale)
                      .cast("long").alias("nll")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("nll").alias("nll_sum"))
            .select(id_col, "n_bigrams", "nll_sum",
                    (F.col("nll_sum").cast("double")
                     / F.col("n_bigrams")).alias("avg_nll")))


def bpe_subword_counts(df: "DataFrame", text_col: str = "text",
                       steps: int = 8) -> "DataFrame":
    """The ENCODE side of BPE: corpus subword frequencies after
    applying the `steps` learned merges — i.e. what the trained
    tokenizer actually emits over this corpus ((subword,
    n_occurrences), frequency-weighted by word counts). Shares the
    iteration machinery (and therefore the engine-exactness argument)
    with bpe_train_merges."""
    toks, _ = _bpe_iterate(df, text_col, steps)
    return (toks.groupBy(F.col("sym").alias("subword"))
            .agg(F.sum("freq").alias("n_occurrences")))


def bpe_train_merges(df: "DataFrame", text_col: str = "text",
                     steps: int = 8) -> "DataFrame":
    """Iterative BPE tokenizer training (Sennrich et al. 2016): start
    from the character sequences of the word VOCABULARY (each word
    weighted by its corpus frequency — the classic formulation, and the
    scalable one: merge rounds touch vocab-sized data, never the
    corpus), then `steps` times (1) count adjacent symbol pairs,
    (2) take the most frequent (ties broken lexicographically),
    (3) merge its occurrences greedily left-to-right. Returns the
    learned merge table (merge_step, lhs, rhs, pair_count).

    The greedy non-overlapping merge — inherently sequential per word
    in the textbook loop — is expressed relationally: matches form
    consecutive-position islands, and exactly the odd-indexed match in
    each island applies ("aaaa" under (a,a) -> "aa","aa"). That makes
    every round pure window/join algebra, identical in any engine, so
    the whole iterative algorithm stays oracle-checkable (the DuckDB
    twin unrolls rounds as chained CTEs, like PageRank).

    Scale shape: per-round cost is one lead-window over vocab symbol
    sequences plus one pair-count shuffle; the argmax is a 1-row
    broadcast, per-round localCheckpoint keeps plan depth O(1). Vocab
    for a 100 TB corpus is ~1e8 words — cluster-trivial.
    """
    _, merges = _bpe_iterate(df, text_col, steps)
    return df.sparkSession.createDataFrame(
        merges, "merge_step int, lhs string, rhs string, pair_count long")


def _bpe_iterate(df: "DataFrame", text_col: str,
                 steps: int) -> tuple["DataFrame", list]:
    """(final symbol sequences, collected per-step merge rows) — the
    shared engine of bpe_train_merges / bpe_subword_counts. The argmax
    is ONE row per round: collecting it (bounded driver state, the
    same class as PCA's direction vector) and rebinding lhs/rhs as
    literals removes a join and a checkpoint from every round, and a
    dry round (0-row argmax) just breaks the loop — identical to the
    oracle, whose dry rounds are no-ops."""
    from pyspark.sql import Window as W

    vocab = (df.select(F.explode(F.split(F.col(text_col), r"\s+"))
                       .alias("w"))
             .filter(F.length("w") > 0)
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    toks = (vocab.select(
        "w", "freq",
        F.posexplode(F.transform(F.sequence(F.lit(1), F.length("w")),
                                 lambda i: F.col("w").substr(i, F.lit(1))))
        .alias("pos", "sym"))
        .localCheckpoint(eager=True))
    wd = W.partitionBy("w").orderBy("pos")
    merges = []
    for step in range(1, steps + 1):
        withn = toks.select("w", "freq", "pos", "sym",
                            F.lead("sym").over(wd).alias("_nxt"))
        best_rows = (withn.filter(F.col("_nxt").isNotNull())
                     .groupBy(F.col("sym").alias("lhs"),
                              F.col("_nxt").alias("rhs"))
                     .agg(F.sum("freq").alias("pair_count"))
                     .orderBy(F.desc("pair_count"), "lhs", "rhs")
                     .limit(1).collect())
        if not best_rows:
            # dry: no adjacent pairs anywhere. The oracle's remaining
            # rounds are no-ops (its 0-row argmax LEFT JOINs to NULL
            # lhs/rhs), so stopping here leaves both engines with the
            # same final state and the same merge list.
            break
        lhs, rhs = best_rows[0]["lhs"], best_rows[0]["rhs"]
        merges.append((step, lhs, rhs, best_rows[0]["pair_count"]))
        fl = withn.select(
            "w", "freq", "pos", "sym",
            F.coalesce((F.col("sym") == F.lit(lhs))
                       & (F.col("_nxt") == F.lit(rhs)),
                       F.lit(False)).alias("_m"))
        isl = fl.withColumn(
            "_isl", F.col("pos") - F.row_number().over(
                W.partitionBy("w", "_m").orderBy("pos")))
        ap = isl.withColumn(
            "_ap", F.col("_m") & (F.row_number().over(
                W.partitionBy("w", "_m", "_isl").orderBy("pos"))
                % 2 == 1))
        toks = (ap.withColumn("_dr", F.coalesce(F.lag("_ap").over(wd),
                                                F.lit(False)))
                .filter(~F.col("_dr"))
                .select("w", "freq",
                        F.row_number().over(wd).alias("pos"),
                        F.when(F.col("_ap"), F.lit(lhs + rhs))
                        .otherwise(F.col("sym")).alias("sym"))
                .localCheckpoint(eager=True))
    return toks, merges


def char_entropy(docs: "DataFrame", text_col: str = "text",
                 id_col: str = "doc_id",
                 scale: int = 1_000_000) -> "DataFrame":
    """Per-document Shannon character entropy — the classic gibberish/
    compression-quality signal (near 0 for repeated filler, near
    ln(alphabet) for uniform noise). Each distinct character with count
    c in a doc of length n contributes c * ln(n/c); the log values are
    pinned to scaled integers (round(ln * scale), the BM25/bigram-LM
    ln-portability trick — n >= c keeps every term non-negative), so
    the per-doc sum is exact integer arithmetic and the final
    entropy_nats is two IEEE divides on identical operands.

    Scale shape: one posexplode of char positions (rows = total corpus
    chars, pre-spread across the cluster by a repartition on the doc
    id), one (doc, char) count aggregate — map-side combinable — and
    one per-doc rollup. No collects, no windows.
    """
    spread = docs.sparkSession.sparkContext.defaultParallelism
    base = (docs.repartition(spread, id_col)
            .select(F.col(id_col), F.col(text_col).alias("_t"),
                    F.length(text_col).cast("long").alias("n"))
            .filter(F.col("n") > 0))
    chars = base.select(
        id_col, "n",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_i"),
        F.col("_t")).select(
        id_col, "n", F.col("_t").substr(F.col("_i"), F.lit(1)).alias("ch"))
    cnt = (chars.groupBy(id_col, "n", "ch")
           .agg(F.count(F.lit(1)).alias("c")))
    term = (F.col("c")
            * F.round(F.ln(F.col("n").cast("double")
                           / F.col("c").cast("double")) * scale)
            .cast("long"))
    return (cnt.groupBy(id_col, "n")
            .agg(F.count(F.lit(1)).alias("n_distinct_chars"),
                 F.sum(term).alias("entropy_scaled"))
            .select(F.col(id_col),
                    F.col("n").alias("n_chars"),
                    "n_distinct_chars", "entropy_scaled",
                    (F.col("entropy_scaled").cast("double")
                     / F.col("n").cast("double") / scale)
                    .alias("entropy_nats")))


def kl_divergence_by_source(docs: "DataFrame", text_col: str = "text",
                            source_col: str = "source",
                            scale: int = 1_000_000) -> "DataFrame":
    """KL(source token distribution || corpus token distribution) per
    source — the standard domain-shift / mixture-skew measure when
    assembling a training corpus from many sources (a source whose
    token mix diverges from the blend gets a high score). Each (source,
    token) cell contributes c_st * ln(c_st*n / (n_s*c_t)); the ln of
    the exact-integer ratio is pinned to a scaled integer, the per-
    source sum is exact, and Gibbs' inequality keeps the true value
    >= 0 (the rounded sum can only dip ~1e-6 below; property-tested).

    Scale shape: one token explode -> (source, token) counts (map-side
    combinable, vocabulary-sized result), token marginals as a second
    vocabulary-sized aggregate joined back on the token key (AQE
    broadcasts while it fits), corpus total crossed in as a broadcast
    scalar. Never wider than the vocabulary.
    """
    spread = docs.sparkSession.sparkContext.defaultParallelism
    toks = (docs.repartition(spread, source_col, "doc_id")
            .select(F.col(source_col).alias("source"),
                    F.explode(F.split(normalize_text(F.col(text_col)),
                                      " ")).alias("tok")))
    st = (toks.groupBy("source", "tok")
          .agg(F.count(F.lit(1)).alias("c_st")))
    s = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    t = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    tot = st.agg(F.sum("c_st").alias("n"))
    term = (F.col("c_st")
            * F.round(F.ln(F.col("c_st").cast("double")
                           * F.col("n").cast("double")
                           / (F.col("n_s").cast("double")
                              * F.col("c_t").cast("double"))) * scale)
            .cast("long"))
    joined = (st.join(t, "tok")
              .join(F.broadcast(s), "source")
              .crossJoin(F.broadcast(tot)))
    return (joined.groupBy("source", "n_s")
            .agg(F.sum(term).alias("kl_scaled"))
            .select("source", F.col("n_s").alias("n_tokens"),
                    "kl_scaled",
                    (F.col("kl_scaled").cast("double")
                     / F.col("n_s").cast("double") / scale)
                    .alias("kl_nats")))
