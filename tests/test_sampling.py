"""Deterministic sampling: stability under reshuffles/reruns, split
fractions, stratified plausibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from g1_etl_spark.operators import sampling as SA
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_deterministic_sample_stable_under_repartition(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in
         SA.deterministic_sample(d, "doc_id", 20).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         SA.deterministic_sample(d.repartition(7), "doc_id", 20)
         .select("doc_id").collect()}
    assert a == b, "sample membership must not depend on partitioning"
    n = d.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%


def test_split_assign_partitions_completely(spark):
    d = _docs(spark)
    out = d.select("doc_id",
                   SA.split_assign(F.col("doc_id")).alias("split"))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = d.count()
    assert sum(counts.values()) == n
    assert counts["train"] > counts["valid"] > 0
    assert counts["train"] > counts["test"] > 0
    assert 0.7 < counts["train"] / n < 0.9


def test_sample_supersets_nest(spark):
    """A 10% hash sample is a subset of the 20% sample — incremental
    growth without resampling history."""
    d = _docs(spark)
    s10 = {r["doc_id"] for r in
           SA.deterministic_sample(d, "doc_id", 10).select("doc_id").collect()}
    s20 = {r["doc_id"] for r in
           SA.deterministic_sample(d, "doc_id", 20).select("doc_id").collect()}
    assert s10 <= s20


def test_stratified_sample_fractions(spark):
    d = _docs(spark).select("doc_id", (F.col("doc_id") % 3).alias("lab"))
    out = SA.stratified_sample(d, "lab", {0: 0.5, 1: 0.1, 2: 0.9})
    got = {r["lab"]: r["n"] for r in
           out.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    per = {r["lab"]: r["n"] for r in
           d.groupBy("lab").agg(F.count("*").alias("n")).collect()}
    assert got.get(2, 0) / per[2] > got.get(0, 0) / per[0] \
        > got.get(1, 0) / per[1]


def test_stratified_exact_k(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.sampling import stratified_exact_k

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"))
    out = stratified_exact_k(df, "lang", "doc_id", k=10)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}
    # membership is a pure function of the key: repartitioning the
    # input must select the identical sample
    again = stratified_exact_k(df.repartition(13), "lang", "doc_id", k=10)
    a = sorted((r["lang"], r["doc_id"], r["sample_rank"])
               for r in out.collect())
    b = sorted((r["lang"], r["doc_id"], r["sample_rank"])
               for r in again.collect())
    assert a == b
    # stratum smaller than k -> whole stratum kept
    small = df.filter((F.col("lang") == "0") & (F.col("doc_id") < 20))
    got = stratified_exact_k(small, "lang", "doc_id", k=10).count()
    assert got == 5


def test_weighted_sample_k(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.sampling import weighted_sample_k

    # two weight classes: heavy rows (w=500) vs light rows (w=5).
    # A-ES inclusion probability rises with weight, so the 200-row
    # sample from a 50/50 population must be dominated by heavy rows.
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 500).otherwise(5).alias("w"))
    out = weighted_sample_k(df, "doc_id", "w", k=200)
    rows = out.collect()
    assert len(rows) == 200
    heavy = sum(1 for r in rows if r["w"] == 500)
    assert heavy > 150
    # ranks are exactly 1..k
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 201))
    # membership is a pure function of (key, weight): repartitioned
    # input selects the identical sample in the identical order
    again = weighted_sample_k(df.repartition(17), "doc_id", "w", k=200)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_shuffle_shard_assign_is_permutation(spark):
    from g1_etl_spark.operators.sampling import shuffle_shard_assign

    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = shuffle_shard_assign(df, "doc_id", n_shards=8).collect()
    assert len(out) == 1000
    # every row lands in a valid shard; positions per shard are 1..n
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the order is a real shuffle, not key order: within some shard the
    # pos ranking must disagree with doc_id ranking
    scrambled = any(
        [r["doc_id"] for r in sorted(out, key=lambda r: (r["shard"] == s,
                                                         r["pos"]))
         if r["shard"] == s]
        != sorted(r["doc_id"] for r in out if r["shard"] == s)
        for s in by_shard)
    assert scrambled
    # pure function of the key: repartitioned input, identical result
    again = shuffle_shard_assign(df.repartition(13), "doc_id",
                                 n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
