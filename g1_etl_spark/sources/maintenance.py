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
