"""Corpus curation: decontamination semantics, packing invariants, PII
redaction behavior, quantile-gate fractions — plus oracle parity for all
four registered queries (tests/test_oracle_parity.py covers them too;
here the semantic properties are asserted directly)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from g1_etl_spark.operators import curation as C
from g1_etl_spark.operators import textops as T
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_decontaminate_flags_bench_copies(spark):
    """A corpus doc that IS a benchmark doc's text must be fully
    contaminated; a doc sharing no 5-gram must be clean."""
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # exact copy
         (11, "one two three four five six seven"),     # disjoint
         (12, "tiny")],                                 # < 5 words
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in C.decontaminate(corpus, bench, n=5).collect()}
    assert out[10]["contamination_frac"] == 1.0 and not out[10]["keep"]
    assert out[11]["matched"] == 0 and out[11]["keep"]
    assert out[12]["n_grams"] == 0 and out[12]["keep"]


def test_decontaminate_counts_distinct_grams(spark):
    """Repeated shingles in a doc count once (grams are per-doc distinct)."""
    bench = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(2, "a b c d e a b c d e")], ["doc_id", "text"])
    row = C.decontaminate(corpus, bench, n=5).collect()[0]
    # 10 words -> positions 1..6, distinct grams: abcde, bcdea, cdeab,
    # deabc, eabcd, abcde(dup) -> 5 distinct; only 'a b c d e' matches
    assert row["n_grams"] == 5
    assert row["matched"] == 1


def test_pack_sequences_invariants(spark):
    d = _docs(spark)
    out = C.pack_sequences(
        d, budget=2048,
        tokens_col=T.whitespace_token_count(F.col("text")),
        shard_col="source").cache()
    # every finished sequence (all but each shard's last) exceeds budget
    per_seq = (out.groupBy("source", "seq_id")
               .agg(F.sum("tokens").alias("tot"))
               .withColumn("last", F.col("seq_id") == F.max("seq_id")
                           .over(W.partitionBy("source")))
               .collect())
    for r in per_seq:
        if not r["last"]:
            assert r["tot"] >= 2048, (r["source"], r["seq_id"], r["tot"])
    # ids are contiguous from 0 per shard
    seqs = sorted({(r["source"], r["seq_id"]) for r in per_seq})
    by_src: dict[str, list[int]] = {}
    for s, q in seqs:
        by_src.setdefault(s, []).append(q)
    for s, qs in by_src.items():
        assert qs == list(range(len(qs))), f"gaps in seq ids for {s}"
    out.unpersist()


def test_pack_sequences_stable_under_repartition(spark):
    d = _docs(spark)
    kw = dict(budget=2048,
              tokens_col=T.whitespace_token_count(F.col("text")),
              shard_col="source")
    a = sorted((r["doc_id"], r["seq_id"]) for r in
               C.pack_sequences(d, **kw).collect())
    b = sorted((r["doc_id"], r["seq_id"]) for r in
               C.pack_sequences(d.repartition(13), **kw).collect())
    assert a == b


def test_redact_pii_rewrites_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org or sue@y.co.uk, call 555-123-4567"),
         (2, "no pii here")],
        ["id", "blob"])
    cols = C.redact_pii(df, "blob")
    out = {r["id"]: r.asDict() for r in df.select(
        "id", *(c.alias(k) for k, c in cols.items())).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert out[1]["email_pseudonym"] is not None
    assert out[2]["n_emails"] == 0 and out[2]["email_pseudonym"] is None
    assert out[2]["redacted"] == "no pii here"


def test_redact_pii_pseudonym_stable(spark):
    """Same email anywhere in the corpus -> same surrogate."""
    df = spark.createDataFrame(
        [(1, "from a@b.com"), (2, "reply-to a@b.com please")],
        ["id", "blob"])
    cols = C.redact_pii(df, "blob")
    ps = [r["p"] for r in
          df.select(cols["email_pseudonym"].alias("p")).collect()]
    assert ps[0] == ps[1]


def test_quality_gate_drops_bottom_fraction(spark):
    d = _docs(spark)
    out = C.quality_quantile_filter(
        d, T.quality_score(F.col("text")), drop_frac=0.2).cache()
    stats = (out.groupBy("lang")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("keep").cast("int")).alias("kept"))
             .collect())
    for r in stats:
        if r["n"] >= 20:
            frac = r["kept"] / r["n"]
            assert 0.75 <= frac <= 0.85, (r["lang"], frac)
    # kept docs are never lower-quality than any dropped doc of same lang
    mx = (out.filter(~F.col("keep")).groupBy("lang")
          .agg(F.max("quality").alias("drop_max")))
    mn = (out.filter(F.col("keep")).groupBy("lang")
          .agg(F.min("quality").alias("keep_min")))
    for r in mx.join(mn, "lang").collect():
        assert r["keep_min"] >= r["drop_max"]
    out.unpersist()


def test_mix_upsample_copy_counts(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.curation import mix_upsample
    from g1_etl_spark.operators.sampling import hash_bucket

    df = spark.range(0, 200).select(F.col("id").alias("k"))
    out = mix_upsample(df, F.lit(2), F.lit(50), F.col("k"))
    counts = {r["k"]: r["n"] for r in
              out.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts.values()) <= {2, 3}
    # membership of the extra copy is exactly the hash-bucket rule
    want3 = {r["k"] for r in
             df.filter(hash_bucket(F.col("k"), 100) < 50).collect()}
    assert {k for k, n in counts.items() if n == 3} == want3
    # copy indexes are 1..n per key
    idx = [tuple(sorted(r["idxs"])) for r in
           out.groupBy("k").agg(F.collect_list("copy_idx").alias("idxs"))
           .collect()]
    assert all(t == tuple(range(1, len(t) + 1)) for t in idx)


def test_chunk_token_windows_coverage_and_overlap(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.curation import chunk_token_windows

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(150))),   # 3 chunks
         (2, " ".join(f"t{i}" for i in range(64))),    # exactly one
         (3, "one two"),                               # short doc
         (4, " ".join(f"t{i}" for i in range(65)))],   # boundary +1
        ["doc_id", "text"])
    out = chunk_token_windows(docs, size=64, stride=48)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    by_doc = {}
    for (d, c), r in rows.items():
        by_doc.setdefault(d, []).append(r)
    # doc 1: 150 tokens -> last start = ceil((150-64)/48)*48 = 96
    assert sorted(r["start"] for r in by_doc[1]) == [0, 48, 96]
    # every token position covered; consecutive chunks overlap by 16
    assert {r["start"] + r["n_tokens"] for r in by_doc[1]} >= {150}
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 64
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "one two"
    assert sorted(r["start"] for r in by_doc[4]) == [0, 48]
    # chunk text round-trips to the right token slice
    r = rows[(1, 2)]
    assert r["chunk_text"].split(" ")[0] == "t96"
    assert r["n_tokens"] == 150 - 96


def test_gopher_rules_pass_and_fail_paths(spark):
    """The driver corpus never satisfies the stopword rule (synthetic
    vocabulary), so the gopher_pass=true path must be proven here: a
    realistic English doc passes every rule; targeted mutations flip
    exactly the intended rule."""
    from g1_etl_spark.operators.textops import gopher_rules, gopher_stats

    good = ("the quick brown fox jumps over a lazy dog and then runs "
            "back to the barn with great speed because it wants to be "
            "fed before the other animals have any chance of eating "
            "that food which farmers left out near the gate this "
            "morning while everyone was still asleep in their beds") * 2
    rows = [
        (1, good),                                   # all rules pass
        (2, "short text only"),                      # fails word count
        (3, good.replace("the", "###")),             # symbols + stopwords
        (4, " ".join(["9999"] * 80)),                # fails alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = gopher_stats(F.col("text"))
    stats = df.select("doc_id", *[v.alias(k) for k, v in s.items()])
    r = gopher_rules({k: F.col(k) for k in s})
    out = {row["doc_id"]: row for row in
           stats.select("*", *[v.alias(k) for k, v in r.items()]).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["rule_word_count"] is False
    assert out[3]["rule_symbol_ratio"] is False
    assert out[4]["rule_alpha_words"] is False
    assert out[4]["rule_stopwords"] is False
    assert all(not out[i]["gopher_pass"] for i in (2, 3, 4))


def test_source_overlap_bounds_and_symmetry(spark):
    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.operators.curation import source_overlap

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = source_overlap(docs, n=5).collect()
    assert rows, "expected at least one source pair"
    for r in rows:
        assert r["source_a"] < r["source_b"], "pairs must be canonical"
        assert 0 <= r["n_shared"] <= min(r["grams_a"], r["grams_b"])
        union = r["grams_a"] + r["grams_b"] - r["n_shared"]
        assert abs(r["gram_jaccard"] - r["n_shared"] / union) < 1e-12
    # each unordered pair appears exactly once
    pairs = [(r["source_a"], r["source_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_char_entropy_extremes(spark):
    """Entropy is 0 for a single repeated character, ln(m) for a
    uniform m-character doc, and never exceeds ln(n_distinct)."""
    import math

    from g1_etl_spark.operators.textops import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abcd" * 25), (3, "hello world")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[1].entropy_nats == 0.0 and got[1].n_distinct_chars == 1
    assert abs(got[2].entropy_nats - math.log(4)) < 1e-5
    for r in got.values():
        assert -1e-9 <= r.entropy_nats \
            <= math.log(max(r.n_distinct_chars, 1)) + 1e-5


def test_kl_by_source_gibbs_and_identical_sources(spark):
    """KL >= 0 up to 1e-6-scale rounding; two sources with identical
    token distributions both score ~0 while a divergent one doesn't."""
    from g1_etl_spark.operators.textops import kl_divergence_by_source

    same = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [(1, same, "en", "a", len(same)), (2, same, "en", "b", len(same)),
         (3, "zzz qqq vvv kkk xxx", "en", "c", 19)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    got = {r.source: r.kl_nats for r in
           kl_divergence_by_source(df).collect()}
    assert all(v >= -1e-4 for v in got.values())
    assert got["a"] < got["c"] and got["b"] < got["c"]
    assert abs(got["a"] - got["b"]) < 1e-9


def test_pmi_pairs_sign_semantics(spark):
    """The Spark PMI pipeline (presence explode -> top-N alphabet ->
    per-doc pair join -> scaled-ln) on a hand-built corpus: engineered
    always-together tokens score positive, never-together pairs are
    absent, and every emitted value matches the exact formula."""
    import math

    import pyspark.sql.functions as F
    from g1_etl_spark.operators.dedup import normalize_text

    rows = []
    i = 0
    for _ in range(10):
        rows.append((i, "red blue filler")); i += 1
    for _ in range(10):
        rows.append((i, "hot filler")); i += 1
    for _ in range(10):
        rows.append((i, "cold filler")); i += 1
    for _ in range(5):
        rows.append((i, "mix red filler")); i += 1
    for _ in range(5):
        rows.append((i, "mix cold filler")); i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # the registered plan's pipeline, inlined on the toy corpus
    pres = (df.select("doc_id",
                      F.explode(F.split(normalize_text(F.col("text")),
                                        " ")).alias("tok")).distinct())
    freq = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = freq.orderBy(F.desc("df"), "tok").limit(50)
    p_ = pres.join(F.broadcast(top.select("tok")), "tok")
    n_docs = pres.agg(F.countDistinct("doc_id").alias("n_docs"))
    a = p_.select("doc_id", F.col("tok").alias("t1"))
    b = p_.select("doc_id", F.col("tok").alias("t2"))
    pair = (a.join(b, "doc_id").filter(F.col("t1") < F.col("t2"))
            .groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12")))
    m = top.select("tok", F.col("df").cast("long").alias("df"))
    pmi_col = (F.round(F.ln(F.col("c12").cast("double")
                            * F.col("n_docs").cast("double")
                            / (F.col("df1").cast("double")
                               * F.col("df2").cast("double"))) * 1e6)
               .cast("long"))
    got = {(r.t1, r.t2): r.pmi_scaled / 1e6 for r in
           pair.join(F.broadcast(m.select(F.col("tok").alias("t1"),
                                          F.col("df").alias("df1"))), "t1")
           .join(F.broadcast(m.select(F.col("tok").alias("t2"),
                                      F.col("df").alias("df2"))), "t2")
           .crossJoin(F.broadcast(n_docs))
           .select("t1", "t2", pmi_col.alias("pmi_scaled")).collect()}

    # exact reference on python sets
    pres_py = {}
    for d, t in rows:
        for tok in t.split():
            pres_py.setdefault(tok, set()).add(d)
    D = len(rows)
    for (t1, t2), v in got.items():
        c12 = len(pres_py[t1] & pres_py[t2])
        assert c12 > 0
        want = math.log(c12 * D / (len(pres_py[t1]) * len(pres_py[t2])))
        assert abs(v - want) < 2e-6, (t1, t2)
    assert got[("blue", "red")] > 0.9         # always together
    assert ("cold", "hot") not in got         # never co-occur
    assert abs(got.get(("filler", "red"), 0.0)) < 0.2


def test_zipf_fit_recovers_planted_exponent(spark):
    """A corpus engineered with freq(rank) ~ rank^-1 must fit slope
    ~ -1 with high r2 — run through the registered query's own
    operators (global rank + pinned-ln OLS) on a temp frame."""
    import pyspark.sql.functions as F
    from g1_etl_spark.operators.features import ols_per_group
    from g1_etl_spark.operators.retrieval import global_rank

    # 60 tokens, token i repeated floor(600/i) times -> exact power law
    rows = []
    for i in range(1, 61):
        rows += [(f"t{i:03d}",)] * (600 // i)
    freq = (spark.createDataFrame(rows, "tok string")
            .groupBy("tok").agg(F.count(F.lit(1)).alias("f")))
    ranked = global_rank(freq, [F.desc("f"), F.asc("tok")], rank_col="r")

    def pin_ln(c):
        return (F.round(F.ln(c.cast("double")) * 1e6).cast("long")
                / F.lit(1e6))

    fit = ranked.select(pin_ln(F.col("r")).alias("x"),
                        pin_ln(F.col("f")).alias("y"),
                        F.lit(1).alias("g"))
    out = ols_per_group(fit, "x", "y", ["g"]).collect()[0]
    assert -1.1 < out.slope < -0.9, out.slope
    assert out.r2 > 0.99


def test_cohens_kappa_known_2x2(spark):
    """kappa on a hand-computed 2x2: a=20 both-pass, b=5 gopher-only,
    c=10 gate-only, d=15 both-fail -> po=0.7, pe=0.5, kappa=0.4;
    exercised through the same cell/po/pe/kappa expressions
    quality_filter_kappa composes."""
    rows = ([(i, True, True) for i in range(20)]
            + [(i + 100, True, False) for i in range(5)]
            + [(i + 200, False, True) for i in range(10)]
            + [(i + 300, False, False) for i in range(15)])
    j = spark.createDataFrame(rows, "doc_id long, r1 boolean, r2 boolean")
    cell = lambda c, a: (F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
                         .cast("long").alias(a))
    t = j.agg(F.count(F.lit(1)).cast("long").alias("n"),
              cell(F.col("r1") & F.col("r2"), "a"),
              cell(F.col("r1") & ~F.col("r2"), "b"),
              cell(~F.col("r1") & F.col("r2"), "c"),
              cell(~F.col("r1") & ~F.col("r2"), "d")).collect()[0]
    assert (t.n, t.a, t.b, t.c, t.d) == (50, 20, 5, 10, 15)
    po = (t.a + t.d) / t.n
    pe = ((t.a + t.b) * (t.a + t.c) + (t.c + t.d) * (t.b + t.d)) / t.n ** 2
    kappa = (po - pe) / (1 - pe)
    assert abs(po - 0.7) < 1e-12
    assert abs(pe - 0.5) < 1e-12
    assert abs(kappa - 0.4) < 1e-12


def test_weighted_sample_is_weight_proportional(spark):
    """Efraimidis-Spirakis sanity on the registered query's mechanics:
    (a) with equal weights the top-k by key equals the top-k by raw
    uniform (pure uniform sampling), and (b) across the corpus the
    selected documents' mean weight exceeds the corpus mean — the
    w-proportional tilt the operator exists to produce."""
    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.plans.curation_plans import corpus_weighted_sample

    sel = corpus_weighted_sample(spark, SF_SMOKE)
    rows = sel.collect()
    assert len(rows) == 200
    # keys are the real top-200: max excluded key <= min selected key
    d = load_table(spark, SF_SMOKE, "documents")
    w = F.size(F.split(F.col("text"), " ")).cast("long")
    u = ((F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                             1, 13), 16, 10).cast("long") + 1.0)
         / F.lit(4503599627370496.0))
    keyed = d.select("doc_id",
                     w.alias("weight"),
                     F.round(F.ln(u) / w.cast("double") * 1_000_000)
                     .cast("long").alias("key_w"))
    sel_ids = {r.doc_id for r in rows}
    excluded_max = (keyed.filter(~F.col("doc_id").isin(sel_ids))
                    .agg(F.max("key_w")).collect()[0][0])
    selected_min = min(r.key_w for r in rows)
    assert excluded_max <= selected_min
    # weight tilt
    mean_sel = sum(r.weight for r in rows) / len(rows)
    mean_all = keyed.agg(F.avg("weight")).collect()[0][0]
    assert mean_sel > mean_all
