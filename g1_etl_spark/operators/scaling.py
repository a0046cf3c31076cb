"""Scale techniques as first-class operators: bucketed co-located joins
and salted skew joins.

These are the two knobs that matter most when a 100 TB fact-fact join
stops fitting the default hash-shuffle plan:

  bucketed tables   pay the shuffle ONCE at write time; every later join
                    or aggregation on the bucket key is exchange-free
                    (SortMergeJoin reads co-located buckets directly).
  salted joins      a single hot key (null-heavy foreign keys, power-law
                    user ids) funnels into one task under hash
                    partitioning; salting fans the hot side across S
                    subkeys and replicates the other side S ways — at
                    the cost of an S× blowup of ONLY the replicated side.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles moderate
skew automatically; explicit salting is for the pathological keys AQE
can't split (a single key larger than an executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 32, sort: bool = True) -> None:
    """Persist `df` bucketed (and bucket-sorted) by `key`: the one-time
    shuffle that makes every later equi-join/agg on `key` exchange-free.
    Bucket count is a layout contract — both join sides must match.

    The pre-write ``repartition(buckets, key)`` uses the same murmur3
    ``pmod`` hash as bucketing, so each write task holds exactly one
    bucket and every bucket lands in ONE file — the condition under
    which Spark reports the scan as sorted (with
    ``spark.sql.legacy.bucketedTableScan.outputOrdering``, set in
    session.py) and elides the Sort under a co-located SMJ too.
    Bucket count therefore also bounds per-file size: size ``buckets``
    so a bucket's rows fit one task comfortably (32 here; thousands on
    a real 100 TB fact)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous write can leave the managed location behind,
    # which saveAsTable refuses to reuse
    try:
        import shutil

        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{table.lower()}", ignore_errors=True)
    except Exception:
        pass
    writer = (df.repartition(buckets, F.col(key))
              .write.mode("overwrite").bucketBy(buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(left: DataFrame, right: DataFrame, on: str | list,
                   how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the join key with a sort-merge hint:
    matching bucket layouts make the SMJ exchange-free (each task reads
    bucket i of both sides). The hint matters because at small test
    sizes the planner would otherwise broadcast — on real bucketed
    facts SMJ-without-exchange IS the fast plan."""
    return left.join(right.hint("merge"), on, how)


def salted_join(left: DataFrame, right: DataFrame, on: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the left (skewed) side salted across `salt`
    subkeys and the right side replicated `salt` ways.

    Deterministic spreading: the left salt comes from hashing the whole
    row (xxhash64 of all columns), so one hot key's rows land on `salt`
    different reducers; results are identical to the plain join (no row
    gained or lost — verified in tests)."""
    # pmod, not abs(...)%: abs(Long.MIN_VALUE) stays negative, so for a
    # non-power-of-two salt the % could emit a salt matching no
    # replicated right row and silently drop that left row (2^-64 per
    # row, but the contract is exact result-neutrality)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                   F.lit(salt)).alias("_salt")
    l = left.select("*", lsalt)
    r = (right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        .alias("_s"))
        .withColumn("_salt", F.col("_s").cast("long")).drop("_s"))
    return l.join(r, [on, "_salt"], how).drop("_salt")


def enable_runtime_bloom_pruning(spark: SparkSession,
                                 apply_below_scan_bytes: int | None = None
                                 ) -> None:
    """Turn on Catalyst's runtime Bloom-filter join pruning: for a
    shuffle join whose creation side is selective (a filtered dim),
    Spark injects ``bloom_filter_agg(xxhash64(key))`` over that side and
    prunes the fact scan with ``might_contain`` BEFORE the shuffle —
    the fact rows that cannot match never leave the mappers.

    This is the third fact-join scale knob next to bucketing and
    salting: it needs no rewrite of the query, only the session conf.
    By default Spark applies it when the application side scans >10 GB
    — i.e. exactly the 100 TB regime; `apply_below_scan_bytes` lowers
    that threshold so tests (and small-SF benches) can see the filter
    in the plan.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
                   "true")
    if apply_below_scan_bytes is not None:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            str(apply_below_scan_bytes))
