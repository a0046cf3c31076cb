"""Table-layout maintenance: partitioned parquet writes and small-file
compaction — the jobs that keep a 100 TB parquet lake scannable.

Why these matter at scale:
  - Hive-style partition directories (``lang=en/date=.../``) give the
    reader PARTITION PRUNING: a filter on the partition column skips
    whole directories before any file is opened (visible as
    ``PartitionFilters`` in the scan node).
  - ``maxRecordsPerFile`` bounds file size on write, so one skewed
    partition cannot produce a single multi-GB file that serializes a
    future scan.
  - Streaming ingestion accretes small files; `compact_parquet`
    rewrites a directory to ~target-sized files (the OPTIMIZE /
    rewrite_data_files job of the lakehouse formats, expressed on
    plain parquet directories).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      max_records_per_file: int = 1_000_000) -> None:
    """Hive-partitioned parquet write with bounded file sizes."""
    (df.write.mode("overwrite")
     .option("maxRecordsPerFile", max_records_per_file)
     .partitionBy(*partition_cols)
     .parquet(path))


def parquet_file_stats(path: str) -> dict:
    """{n_files, total_bytes, min_bytes, max_bytes} over the data files
    beneath `path` (driver-side directory walk — metadata, not data)."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        sizes.extend(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return {"n_files": len(sizes), "total_bytes": sum(sizes),
            "min_bytes": min(sizes, default=0),
            "max_bytes": max(sizes, default=0)}


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    partition_cols: list[str] | None = None) -> dict:
    """Rewrite a parquet directory into ~target-sized files.

    File count = ceil(current_total_bytes / target); rows are
    redistributed with a round-robin repartition (even files, no key
    assumption — this is a LAYOUT job, ordering-sensitive consumers
    re-sort anyway). Partitioned output repartitions by the partition
    columns instead so each directory is written by the tasks that own
    it rather than every task appending to every directory.
    Returns the after-stats from `parquet_file_stats(dst)`.
    """
    stats = parquet_file_stats(src)
    n_files = max(1, -(-stats["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(src)
    if partition_cols:
        out = df.repartition(n_files, *[F.col(c) for c in partition_cols])
        (out.write.mode("overwrite").partitionBy(*partition_cols)
         .parquet(dst))
    else:
        out = df.repartition(n_files)
        out.write.mode("overwrite").parquet(dst)
    return parquet_file_stats(dst)


def interleave_bits(cols: list, bits: int) -> F.Column:
    """Round-robin bit interleave of already-scaled non-negative longs:
    bit i of column j lands at output bit ``i*len(cols)+j``. Flat
    shift/and/or expression (bits x k terms) — whole-stage codegen,
    no UDF."""
    out = F.lit(0).cast("long")
    k = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out.bitwiseOR(F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)).cast("long"),
                i * k + j))
    return out


def zorder_column(df: DataFrame, cols: list[str],
                  bits: int = 12) -> F.Column:
    """Z-order (Morton) key over `cols`: each column min-max scaled to
    `bits` bits (one metadata-sized agg pass for the bounds — two
    scalar rows to the driver, never data), then bit-interleaved so
    rows close in EVERY dimension get close keys.
    """
    row = df.agg(*[F.min(F.col(c).cast("double")).alias(f"lo_{c}")
                   for c in cols],
                 *[F.max(F.col(c).cast("double")).alias(f"hi_{c}")
                   for c in cols]).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        span = (hi - lo) or 1.0
        s = F.floor((F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span) * top).cast("long")
        scaled.append(F.least(F.greatest(s, F.lit(0)), F.lit(top)))
    return interleave_bits(scaled, bits)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 12, num_files: int | None = None) -> None:
    """Multi-dimensionally clustered parquet write (the OPTIMIZE
    ZORDER BY job of the lakehouse formats, on plain parquet).

    A single-column sort gives perfect row-group skipping on that
    column and none on any other; interleaving the bits of k columns
    gives every column ~1/k of the key's locality, so parquet min/max
    row-group stats prune scans filtered on ANY of the z-ordered
    columns. repartitionByRange on the z-key is the scalable global
    ordering (sampled range boundaries, no single-partition sort);
    sortWithinPartitions orders rows inside each file so row groups
    within a file stay tight too.
    """
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    z = zorder_column(df, cols, bits)
    (df.withColumn("_z", z)
     .repartitionByRange(n, F.col("_z"))
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))


def ensure_bucketed_table(spark: SparkSession, sf_dir: str, source: str,
                          cols: list[str], key: str,
                          buckets: int = 32) -> DataFrame:
    """Idempotent bucketed-layout materialization: the maintenance twin
    of `write_zordered`/`compact_parquet` for hash-bucketed layouts.

    Derives a table name from (sf_dir, source, cols, key, buckets) —
    distinct scale factors get distinct tables, so a plan built for one
    sf_dir can never silently read another's layout, and concurrent
    builds for different inputs don't clobber each other. The FIRST
    call pays the one-time layout shuffle (operators/scaling.
    write_bucketed); every later call in the session reuses the
    standing table, which is the 100 TB contract: a bucketed fact is
    written once as the table layout and consumed exchange-free by
    every query keyed on the bucket column.

    Staleness caveat (sandbox-scoped): the name keys on the sf_dir
    PATH, not the data's content — rewriting the parquet under an
    already-materialized sf_dir within one session would keep serving
    the old layout. Production table formats version the layout; plain
    parquet testdata here is immutable per path.

    Process isolation: the warehouse dir is pid-scoped (session.py), so
    two concurrent local processes materializing the SAME layout write
    to disjoint paths — the in-memory catalog never shared tables
    across processes anyway, and a shared physical path only enabled
    overwrite-under-reader races. Production table formats make this
    an atomic-commit concern instead.
    """
    import hashlib

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.operators.scaling import write_bucketed

    tag = hashlib.sha1("|".join(
        [os.path.abspath(sf_dir), source, *cols, key, str(buckets)]
    ).encode()).hexdigest()[:10]
    name = f"bkt_{source}_{key}_{tag}"
    if not spark.catalog.tableExists(name):
        write_bucketed(load_table(spark, sf_dir, source).select(*cols),
                       name, key, buckets=buckets)
    return spark.table(name)
