"""Deterministic sampling / split assignment — training-data plumbing.

Random sampling (rand(), sampleBy) is irreproducible across engines,
partitionings, and reruns; training pipelines need the opposite: a
row's split membership must be a pure function of its key. hash_bucket
gives that — md5 (identical bytes in every engine) -> first 8 hex
chars -> integer bucket. The same row lands in the same split on Spark,
DuckDB, or a resharded cluster, which makes held-out sets stable across
the whole data lifecycle.

sampleBy-style frequency sampling is provided seeded for
within-Spark reproducibility (rows-only checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Engine-portable deterministic bucket in [0, buckets): md5 of the
    key's string form, first 32 bits, mod buckets."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % buckets)


def split_assign(col: Column, train: int = 80, valid: int = 10,
                 buckets: int = 100) -> Column:
    """'train' / 'valid' / 'test' label from the key's hash bucket."""
    b = hash_bucket(col, buckets)
    return (F.when(b < train, "train")
            .when(b < train + valid, "valid")
            .otherwise("test"))


def shuffle_shard_assign(df: DataFrame, key_col: str = "doc_id",
                         n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle for training-data writes: md5 of the
    key is a uniform pseudo-permutation, so (shard, pos) is a stable,
    engine-portable random order — rand() is neither. shard = first 32
    md5 bits mod n_shards (co-locates a shard's rows for the write);
    pos = rank of the md5 WITHIN the shard, so each shard orders
    independently — a window partitioned by shard, never a global sort.
    Trainers then read shards in any order and rows within a shard in
    pos order for a reproducible corpus-level shuffle."""
    h = F.md5(F.col(key_col).cast("string"))
    keyed = df.select(F.col(key_col), h.alias("_h"),
                      (F.conv(F.substring(h, 1, 8), 16, 10)
                       .cast("long") % n_shards).alias("shard"))
    w = W.partitionBy("shard").orderBy("_h", key_col)
    return (keyed.select(key_col, "shard",
                         F.row_number().over(w).cast("long").alias("pos")))


def deterministic_sample(df: DataFrame, key: str, pct: int,
                         buckets: int = 100) -> DataFrame:
    """Keep ~pct% of rows, chosen by key hash — repeatable under
    reshuffles, engine changes, and incremental reruns (a row once
    sampled stays sampled)."""
    return df.filter(hash_bucket(F.col(key), buckets) < pct)


def stratified_sample(df: DataFrame, label_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-label frequency sampling (seeded sampleBy): within-Spark
    reproducible; use deterministic_sample when cross-engine/rerun
    stability matters more than exact per-label fractions."""
    return df.sampleBy(label_col, fractions, seed)


def uniform_from_key(col: Column) -> Column:
    """Deterministic uniform in (0, 1]: first 52 bits of md5(key) — 52
    so the integer is exact in a double — shifted to (0, 1]. The same
    key yields the same uniform on any engine or partitioning."""
    v = (F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10)
         .cast("double"))
    return (v + F.lit(1.0)) / F.lit(float(1 << 52))


def weighted_sample_k(df: DataFrame, key_col: str, weight_col: str,
                      k: int) -> DataFrame:
    """Weighted order sampling (Efraimidis–Spirakis A-ES): each row
    draws rank key u^(1/w) from its deterministic uniform u and weight
    w; the global top-k by that key is a weighted-without-replacement
    sample — inclusion probability rises with weight, membership is a
    pure function of the key (rerun/engine stable), and the plan is a
    TakeOrderedAndProject (per-partition top-k, merge of k·P rows — no
    full sort, no single giant partition).

    Training-data use: quality- or length-weighted subcorpus selection
    where the draw must be reproducible across pipeline reruns.
    """
    u = uniform_from_key(F.col(key_col))
    skey = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    top = (df.select(F.col(key_col), F.col(weight_col),
                     skey.alias("_skey"))
           .orderBy(F.col("_skey").desc(), F.col(key_col))
           .limit(k))
    # rank the k survivors; the window's single-partition exchange sees
    # exactly k rows (post-limit), never the corpus
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("_skey").desc(), F.col(key_col))
    return (top.withColumn("sample_rank",
                           F.row_number().over(w).cast("long"))
            .drop("_skey"))


def stratified_exact_k(df: DataFrame, strata_col: str, key_col: str,
                       k: int) -> DataFrame:
    """Exactly k rows per stratum, chosen uniformly by key hash —
    balanced eval-set construction (k docs per language/domain) with
    cross-engine, rerun-stable membership.

    Selection order is the md5 hex string of the key (engine-portable,
    uniformly distributed), tie-broken by the key itself. Implemented
    skew-free: a naive Window.partitionBy(stratum) pulls each stratum
    — possibly 1/5th of a 100 TB corpus — into ONE task, so stage 1
    takes a local top-k per (stratum, input partition) and the final
    per-stratum window ranks only the <= k*P survivors.
    """
    from pyspark.sql import Window as W

    h = F.md5(F.col(key_col).cast("string"))
    base = df.select(F.col(strata_col), F.col(key_col), h.alias("_h"))
    order = [F.col("_h"), F.col(key_col)]
    lw = W.partitionBy(strata_col, "_pid").orderBy(*order)
    pruned = (base.withColumn("_pid", F.spark_partition_id())
              .withColumn("_r", F.row_number().over(lw))
              .filter(F.col("_r") <= k).drop("_pid", "_r"))
    w = W.partitionBy(strata_col).orderBy(*order)
    return (pruned.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k)
            .select(strata_col, key_col,
                    F.col("sample_rank").cast("long").alias("sample_rank")))
