"""Unit tests for operators/retrieval: distributed global rank, vocab,
BM25 ranking behavior. (Oracle parity for the registered queries runs in
test_oracle_parity.py automatically.)"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from g1_etl_spark.operators import retrieval as R


def test_global_rank_matches_single_window(spark):
    df = spark.range(0, 997).select(
        (F.col("id") * 37 % 101).alias("key"), F.col("id").alias("tie"))
    got = R.global_rank(df, [F.col("key").desc(), F.col("tie").asc()],
                        rank_col="r", partitions=7)
    w = W.orderBy(F.col("key").desc(), F.col("tie").asc())
    want = df.withColumn("r", F.row_number().over(w).cast("long"))
    assert (got.orderBy("r").collect()
            == want.orderBy("r").collect())
    # ranks are a contiguous 1..N permutation
    n = df.count()
    assert got.agg(F.min("r"), F.max("r"),
                   F.countDistinct("r")).first() == (1, n, n)


def test_build_vocab_ids_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b b c c c"), (2, "c b a a"), (3, "z")],
        ["doc_id", "text"])
    out = {r["term"]: (r["cnt"], r["term_id"])
           for r in R.build_vocab(docs, min_count=2).collect()}
    # counts: c=4, a=3, b=3; z dropped (min_count)
    assert out == {"c": (4, 1), "a": (3, 2), "b": (3, 3)}


def test_bm25_prefers_matching_docs(spark):
    docs = spark.createDataFrame(
        [(1, "spark shuffle join shuffle"),
         (2, "spark join"),
         (3, "broadcast join strategy"),
         (4, "unrelated text entirely"),
         (5, "the shuffle service")],
        ["doc_id", "text"])
    q = spark.createDataFrame([(1, "shuffle"), (1, "join")],
                              ["q_id", "term"])
    rows = (R.bm25_topk(docs, q, k=3).orderBy("rank").collect())
    # doc 1 matches both terms (tf 2+1) -> best; doc 4 never appears
    assert rows[0]["neighbor_id"] == 1
    assert all(r["neighbor_id"] != 4 for r in rows)
    assert [r["rank"] for r in rows] == [1, 2, 3]
    assert all(rows[i]["score"] >= rows[i + 1]["score"]
               for i in range(len(rows) - 1))


def test_bm25_idf_downweights_common_terms(spark):
    # 'the' in every doc, 'rare' in one: a doc matching only 'rare'
    # must outscore a doc matching only 'the'
    docs = spark.createDataFrame(
        [(i, "the filler words") for i in range(1, 9)]
        + [(9, "rare gem"), (10, "the common one")],
        ["doc_id", "text"])
    q = spark.createDataFrame([(1, "the"), (1, "rare")], ["q_id", "term"])
    rows = R.bm25_topk(docs, q, k=10).collect()
    scores = {r["neighbor_id"]: r["score"] for r in rows}
    assert scores[9] > max(s for d, s in scores.items() if d != 9)


def test_bm25_broadcasts_queries(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")],
                                 ["doc_id", "text"])
    q = spark.createDataFrame([(1, "b")], ["q_id", "term"])
    plan = R.bm25_topk(docs, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tokenize_to_ids_order_and_oov(spark):
    from g1_etl_spark.operators.retrieval import build_vocab, tokenize_to_ids

    docs = spark.createDataFrame(
        [(1, "b a b zz"), (2, "a b"), (3, "zz qq")], ["doc_id", "text"])
    vocab = build_vocab(docs, min_count=2)  # b:3->1, a:2->2, zz:2->3
    rows = {r["doc_id"]: r for r in tokenize_to_ids(docs, vocab).collect()}
    assert rows[1]["ids"] == [1, 2, 1, 3] and rows[1]["n_oov"] == 0
    assert rows[2]["ids"] == [2, 1]
    assert rows[3]["ids"] == [3] and rows[3]["n_oov"] == 1  # qq is OOV
    assert rows[1]["n_tokens"] == 4


def test_global_rank_and_vocab_on_empty_input(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "key int, tie int")
    assert R.global_rank(
        empty, [F.col("key").asc(), F.col("tie").asc()]).count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert R.build_vocab(docs).count() == 0


def test_tfidf_topk_terms(spark):
    from g1_etl_spark.operators.retrieval import tfidf_topk_terms

    docs = spark.createDataFrame(
        [(1, "apple apple apple common common"),
         (2, "banana common common"),
         (3, "cherry common")],
        ["doc_id", "text"])
    out = tfidf_topk_terms(docs, k=2)
    rows = sorted((r["doc_id"], r["rank"], r["term"], r["tf"])
                  for r in out.collect())
    # the corpus-wide term scores 0 (idf = ln(3/3) = 0); unique terms win
    assert rows[0] == (1, 1, "apple", 3)
    assert rows[2] == (2, 1, "banana", 1)
    assert rows[4] == (3, 1, "cherry", 1)
    # scores of rank-1 rows are tf * ln(N/df)
    import math
    s = {r["doc_id"]: r["score"] for r in out.collect() if r["rank"] == 1}
    assert abs(s[1] - 3 * round(math.log(3.0) * 1e6) / 1e6) < 1e-9


def test_rarity_score_orders_boilerplate_below_rare(spark):
    """A document made of corpus-dominant tokens must score strictly
    below one made of unique tokens."""
    from g1_etl_spark.operators.textops import token_rarity_scores

    rows = [(i, "common common common") for i in range(20)]
    rows.append((100, "zyzzyva quixotic ephemeral"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["rarity_score"]
           for r in token_rarity_scores(docs).collect()}
    assert got[100] > got[0]
    # unique tokens appear once -> exactly 1e9 each
    assert got[100] == 1_000_000_000


def test_bpe_train_merges_textbook_example(spark):
    """Hand-computed merge sequence: vocab {aaab:2, ab:1}.
    Round 1: (a,a) x4 beats (a,b) x3; greedy left-to-right turns
    aaab into [aa,a,b] (islands+parity, not [a,aa,b]).
    Round 2: (a,b) x3 beats (aa,a) x2.  Round 3: (aa,ab) x2."""
    from g1_etl_spark.operators.textops import bpe_train_merges

    docs = spark.createDataFrame([(1, "aaab aaab"), (2, "ab")],
                                 "doc_id long, text string")
    rows = sorted(bpe_train_merges(docs, steps=3).collect(),
                  key=lambda r: r["merge_step"])
    got = [(r["merge_step"], r["lhs"], r["rhs"], r["pair_count"])
           for r in rows]
    assert got == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]


def test_bpe_train_merge_application_is_greedy_nonoverlapping(spark):
    """'aaaa' (vocab freq 3) under best pair (a,a): 3 overlapping pair
    positions x freq 3 = 9 counted, but greedy application merges only
    positions 1-2 and 3-4 -> [aa, aa], so round 2's top pair is
    (aa,aa) x3 — overlap-counting in the census, non-overlap in the
    application, exactly the textbook trainer."""
    from g1_etl_spark.operators.textops import bpe_train_merges

    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")],
                                 "doc_id long, text string")
    rows = sorted(bpe_train_merges(docs, steps=2).collect(),
                  key=lambda r: r["merge_step"])
    got = [(r["merge_step"], r["lhs"], r["rhs"], r["pair_count"])
           for r in rows]
    assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


def test_bpe_dry_rounds_are_noops(spark):
    """Single-char words have no pairs at all: every round runs dry —
    merges must come back empty and the encode stage must still return
    the (unmerged) symbol counts, not an empty frame."""
    from g1_etl_spark.operators.textops import (bpe_subword_counts,
                                                bpe_train_merges)

    docs = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    assert bpe_train_merges(docs, steps=3).count() == 0
    got = {r["subword"]: r["n_occurrences"]
           for r in bpe_subword_counts(docs, steps=3).collect()}
    assert got == {"a": 2, "b": 1}


def test_bpe_merges_stop_when_dry_midway(spark):
    """'ab ab cd' exhausts its merges after two rounds; rounds 3+ must
    emit nothing and leave the final segmentation intact."""
    from g1_etl_spark.operators.textops import (bpe_subword_counts,
                                                bpe_train_merges)

    docs = spark.createDataFrame([(1, "ab ab cd")],
                                 "doc_id long, text string")
    rows = sorted(bpe_train_merges(docs, steps=5).collect(),
                  key=lambda r: r["merge_step"])
    assert [(r["merge_step"], r["lhs"], r["rhs"]) for r in rows] == \
        [(1, "a", "b"), (2, "c", "d")]
    got = {r["subword"]: r["n_occurrences"]
           for r in bpe_subword_counts(docs, steps=5).collect()}
    assert got == {"ab": 2, "cd": 1}


def test_bigram_lm_matches_sequential_reference(spark):
    """bigram_lm_scores vs a plain-Python bigram LM on a tiny corpus:
    same smoothing, same scaled-integer rounding."""
    import math
    from collections import Counter

    from g1_etl_spark.operators.textops import bigram_lm_scores

    texts = {1: "the cat sat on the mat",
             2: "the cat sat",
             3: "a dog barked at the cat",
             4: "single"}  # 1 token -> no bigrams -> excluded
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}

    toks = {d: t.split() for d, t in texts.items()}
    bigrams = {d: list(zip(w, w[1:])) for d, w in toks.items()}
    c12 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({w for ws in toks.values() for w in ws})
    assert 4 not in got
    for d in (1, 2, 3):
        nll = sum(round(math.log((c1[b[0]] + 0.5 * vocab) / (c12[b] + 0.5))
                        * 1_000_000) for b in bigrams[d])
        assert got[d]["n_bigrams"] == len(bigrams[d])
        assert got[d]["nll_sum"] == nll, d
        assert got[d]["avg_nll"] == nll / len(bigrams[d])


def test_bigram_lm_boilerplate_scores_lower_than_rare_text(spark):
    """The gate property the operator exists for: a document made of the
    corpus's dominant repeated phrase is more predictable (lower mean
    NLL) than a document of corpus-unique words."""
    from g1_etl_spark.operators.textops import bigram_lm_scores

    common = "click here to subscribe now"
    rows = [(i, common) for i in range(20)]
    rows.append((99, "zygote quasar bumblebee vermilion"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"]
           for r in bigram_lm_scores(docs).collect()}
    assert got[0] == got[19]
    assert got[0] < got[99]


def test_rrf_fusion_scores_and_both_modality_dominance(spark):
    """Every emitted row's rrf_score equals the recomputed 1/(60+r)
    sum from its own ranks; a doc present in BOTH candidate lists
    always outscores a doc holding the same single rank in one list."""
    from g1_etl_spark.plans import REGISTRY

    rows = REGISTRY["pipeline_rrf_fusion"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
        want = ((1.0 / (60.0 + r.bm25_rank) if r.bm25_rank is not None
                 else 0.0)
                + (1.0 / (60.0 + r.cos_rank) if r.cos_rank is not None
                   else 0.0))
        assert r.rrf_score == want, r
    for q, rs in by_q.items():
        assert len(rs) == 5
        ranks = sorted(r.rrf_rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        both = [r for r in rs if r.bm25_rank is not None
                and r.cos_rank is not None]
        single = [r for r in rs if r.bm25_rank is None
                  or r.cos_rank is None]
        for b in both:
            for s in single:
                same_rank = (s.bm25_rank or s.cos_rank)
                if same_rank is not None and \
                        same_rank >= min(b.bm25_rank, b.cos_rank):
                    assert b.rrf_score > s.rrf_score
