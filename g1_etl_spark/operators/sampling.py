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

from pyspark.sql import Column, DataFrame
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
