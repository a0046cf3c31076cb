"""SparkSession factory tuned for the harness (local[32], 128 GiB host).

Design notes for cluster scale (the settings that matter at 100 TB are the
same ones set here; only the numbers change):
  - AQE on: runtime coalescing, skew-join splitting, and dynamic join
    strategy switching replace hand-tuned shuffle partition counts.
  - shuffle.partitions ~ cores locally; on a 1000-executor cluster this is
    left to AQE's coalescing with a high initial partition number.
  - UTC session timezone so results are comparable with the DuckDB oracle
    (DuckDB timestamps are UTC-naive).
  - Arrow enabled for any pandas_udf / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "g1_etl_spark", cpus: str | int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session. Idempotent within a JVM."""
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # events.parquet stores TIMESTAMP(NANOS), which Spark's reader
        # rejects; read as long (ns since epoch) and convert in catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # report bucket-sorted scan ordering so co-located SMJs over
        # bucketed layouts (sources/maintenance.ensure_bucketed_table,
        # one file per bucket by construction) elide their Sort nodes.
        # Costs a file listing at planning time — per-table metadata,
        # fine even at 100 TB bucket counts; without it Spark 3+ always
        # re-sorts bucketed scans, halving the layout's benefit.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # Per-PROCESS warehouse: the in-memory catalog is per-process
        # anyway, so a shared ./spark-warehouse can never provide
        # cross-process table reuse — but two processes materializing
        # the same bucketed layout (sources/maintenance.
        # ensure_bucketed_table) into one shared path DO clobber each
        # other mid-read (observed: concurrent pytest + driver-sim,
        # FAILED_READ_FILE on a vanished bucket file). Isolating the
        # warehouse by pid removes the only sharing that ever happened.
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               f"/tmp/g1_spark_warehouse_{os.getpid()}"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
