"""Hypothesis property tests for the operator algebra — invariants that
hold for ANY input, not just the fixtures. Examples are deliberately
small (Spark job launch dominates), with shrinking on failure.

Each property pins a law the rest of the repo relies on:
  - pack_sequences: every sequence except a shard's last reaches the
    budget; packing preserves rows; seq_ids are contiguous from 0.
  - global_rank: exactly the permutation a single-partition
    row_number() would produce.
  - upsert: update rows win, base-only rows survive, key set is the
    union — for any disjoint/overlapping key mix.
  - exact_dedup: canonical ids are group minima; group sizes sum to
    the row count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window, functions as F

_settings = settings(max_examples=12, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(tokens=st.lists(st.integers(min_value=0, max_value=500),
                       min_size=1, max_size=40),
       budget=st.integers(min_value=1, max_value=600))
@_settings
def test_pack_sequences_budget_law(spark, tokens, budget):
    from g1_etl_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(tokens)],
        ["doc_id", "source", "tokens"])
    out = pack_sequences(df, budget, F.col("tokens")).collect()
    assert len(out) == len(tokens)  # no row lost or duplicated
    by_seq = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    seq_ids = sorted(by_seq)
    assert seq_ids[0] == 0
    # prefix-sum packing: doc goes into the sequence its prefix falls in
    prefix = 0
    for r in sorted(out, key=lambda r: r["doc_id"]):
        assert r["seq_id"] == prefix // budget
        prefix += r["tokens"]


@given(keys=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=60),
       parts=st.integers(min_value=1, max_value=5))
@_settings
def test_global_rank_is_total_order_permutation(spark, keys, parts):
    from g1_etl_spark.operators.retrieval import global_rank

    df = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], ["k", "tie"])
    got = global_rank(df, [F.col("k").desc(), F.col("tie").asc()],
                      rank_col="r", partitions=parts)
    want = df.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.col("k").desc(), F.col("tie").asc()))
        .cast("long"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


@given(base_keys=st.sets(st.integers(min_value=0, max_value=30),
                         min_size=1, max_size=15),
       upd_keys=st.sets(st.integers(min_value=0, max_value=30),
                        min_size=0, max_size=15))
@_settings
def test_upsert_key_algebra(spark, base_keys, upd_keys):
    from g1_etl_spark.operators.merge import upsert

    base = spark.createDataFrame([(k, "old") for k in base_keys],
                                 ["k", "v"])
    upd = spark.createDataFrame([(k, "new") for k in upd_keys],
                                ["k", "v"]) if upd_keys else \
        spark.createDataFrame([], "k bigint, v string")
    got = {r["k"]: r["v"] for r in upsert(base, upd, ["k"]).collect()}
    assert set(got) == base_keys | upd_keys
    for k in upd_keys:
        assert got[k] == "new"
    for k in base_keys - upd_keys:
        assert got[k] == "old"


@given(texts=st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=12),
    min_size=1, max_size=25))
@_settings
def test_exact_dedup_group_laws(spark, texts):
    from g1_etl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(list(enumerate(texts)),
                               ["doc_id", "text"])
    rows = exact_dedup(df).collect()
    assert len(rows) == len(texts)
    groups = {}
    for r in rows:
        groups.setdefault(r["canonical_id"], []).append(r)
    for canon, members in groups.items():
        ids = [m["doc_id"] for m in members]
        assert canon == min(ids)  # canonical = group min
        assert all(m["group_size"] == len(members) for m in members)


def _ref_bpe(texts: list[str], steps: int):
    """Reference BPE trainer: textbook loop, greedy left-to-right
    non-overlapping application, (count desc, lhs, rhs) argmax."""
    from collections import Counter

    vocab = Counter(w for t in texts for w in t.split() if w)
    seqs = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, steps + 1):
        pairs = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += vocab[w]
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(),
                              key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, lhs, rhs, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    counts = Counter()
    for w, s in seqs.items():
        for sym in s:
            counts[sym] += vocab[w]
    return merges, dict(counts)


@given(words=st.lists(
    st.text(alphabet="ab", min_size=1, max_size=5),
    min_size=1, max_size=8),
    steps=st.integers(min_value=1, max_value=4))
@_settings
def test_bpe_matches_reference_trainer(spark, words, steps):
    """The window-algebra trainer must agree with the textbook
    sequential trainer on merges AND final subword counts for ANY
    corpus (tiny alphabet forces heavy pair collisions, overlapping
    runs, and dry rounds)."""
    from g1_etl_spark.operators.textops import (bpe_subword_counts,
                                                bpe_train_merges)

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    want_merges, want_counts = _ref_bpe([text], steps)
    got_merges = sorted(
        (r["merge_step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train_merges(docs, steps=steps).collect())
    assert got_merges == sorted(want_merges)
    got_counts = {r["subword"]: r["n_occurrences"]
                  for r in bpe_subword_counts(docs, steps=steps).collect()}
    assert got_counts == want_counts


def _ref_span_clip(docs: dict[int, str], n: int, min_docs: int):
    """Reference span clipper: doc-granular canonical-keeps rule."""
    words = {d: t.split(" ") for d, t in docs.items()}
    carriers: dict[tuple, set] = {}
    for d, w in words.items():
        for i in range(len(w) - n + 1):
            carriers.setdefault(tuple(w[i:i + n]), set()).add(d)
    census = {s: min(ds) for s, ds in carriers.items()
              if len(ds) >= min_docs}
    out = {}
    for d, w in words.items():
        removed = set()
        for i in range(len(w) - n + 1):
            s = tuple(w[i:i + n])
            if s in census and d > census[s]:
                removed.update(range(i, i + n))
        kept = [w[i] for i in range(len(w)) if i not in removed]
        out[d] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


@given(texts=st.lists(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=9)
    .map(" ".join),
    min_size=1, max_size=5))
@_settings
def test_span_clip_matches_reference(spark, texts):
    """Tiny vocabulary + short docs force repeated, overlapping, and
    fully-covering spans; the operator must match the sequential
    reference on every doc (n=3 so spans actually occur)."""
    from g1_etl_spark.operators.dedup import span_clip

    docs = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(list(docs.items()),
                               "doc_id long, text string")
    want = _ref_span_clip(docs, n=3, min_docs=2)
    got = {r["doc_id"]: (r["clipped_text"], r["n_words"], r["n_removed"])
           for r in span_clip(df, n=3, min_docs=2).collect()}
    assert got == want


def _ref_top_m(pairs, m):
    """Sequential reference for neardup_top_m: symmetrize, dedup by
    (doc, partner) keeping max score, rank by (-score, partner)."""
    best = {}
    for d1, d2, s in pairs:
        for doc, nb in ((d1, d2), (d2, d1)):
            k = (doc, nb)
            if k not in best or s > best[k]:
                best[k] = s
    out = {}
    by_doc = {}
    for (doc, nb), s in best.items():
        by_doc.setdefault(doc, []).append((nb, s))
    for doc, lst in by_doc.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        out[doc] = [(nb, s, i + 1) for i, (nb, s) in enumerate(lst[:m])]
    return out


@given(pairs=st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 6),
              st.sampled_from([0.5, 0.75, 0.9, 0.99]))
    .filter(lambda t: t[0] != t[1]),
    min_size=1, max_size=15),
       m=st.integers(min_value=1, max_value=4))
@_settings
def test_neardup_top_m_matches_reference(spark, pairs, m):
    """Small id space forces duplicate pairs, score ties, and docs with
    more/fewer than m partners; the operator must match the sequential
    reference exactly (ids, scores, ranks) for every doc."""
    from g1_etl_spark.operators.similarity import neardup_top_m

    df = spark.createDataFrame(pairs, "d1 long, d2 long, score double")
    got = {}
    for r in neardup_top_m(df, m=m).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["partner_id"], r["score"], r["rank"]))
    for doc in got:
        got[doc].sort(key=lambda t: t[2])
    assert got == _ref_top_m(pairs, m)


@given(vals=st.lists(st.integers(min_value=1, max_value=10_000),
                     min_size=1, max_size=50),
       parts=st.integers(min_value=1, max_value=5))
@_settings
def test_pareto_abc_matches_window_prefix_sum(spark, vals, parts):
    """The distributed prefix sum equals the single-window form for
    any value multiset, the last cumulative value is the grand total,
    and classes follow the integer 70/90 thresholds exactly."""
    from g1_etl_spark.operators.analytics import pareto_abc

    df = spark.createDataFrame(
        [(f"k{i}", v) for i, v in enumerate(vals)], ["k", "v"])
    got = pareto_abc(df, "k", "v", partitions=parts).collect()
    total = sum(vals)
    want = {}
    cum = 0
    for v, k in sorted(((v, f"k{i}") for i, v in enumerate(vals)),
                       key=lambda t: (-t[0], t[1])):
        cum += v
        want[k] = (v, cum,
                   "A" if cum * 100 <= total * 70
                   else "B" if cum * 100 <= total * 90 else "C")
    assert len(got) == len(vals)
    for r in got:
        wv, wc, wcls = want[r.k]
        assert (r.value, r.cum_value, r.abc_class) == (wv, wc, wcls), r.k
    assert max(r.cum_value for r in got) == total


@given(a_keys=st.sets(st.integers(min_value=0, max_value=2_000),
                      min_size=1, max_size=300),
       b_keys=st.sets(st.integers(min_value=0, max_value=2_000),
                      min_size=1, max_size=300),
       k=st.sampled_from([16, 64, 256]))
@_settings
def test_kmv_union_merge_identity_property(spark, a_keys, b_keys, k):
    """bottom-k(hashes(A u B)) == bottom-k(bottom-k(A) u bottom-k(B))
    for ANY key sets and sketch size — the mergeability identity the
    set-operation estimates rely on."""
    from g1_etl_spark.operators.sketches import kmv_build, kmv_union

    a = spark.createDataFrame([(x,) for x in a_keys], "k LONG")
    b = spark.createDataFrame([(x,) for x in b_keys], "k LONG")
    direct = sorted(r.h for r in
                    kmv_build(a.unionByName(b), "k", k=k).collect())
    merged = sorted(r.h for r in
                    kmv_union(kmv_build(a, "k", k=k),
                              kmv_build(b, "k", k=k), k=k).collect())
    assert direct == merged
