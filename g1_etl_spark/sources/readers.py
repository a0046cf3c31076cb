"""Sources beyond parquet — Spark-native rebuilds of the reference's
input surface (SURVEY §2.1) plus the formats a pipeline meets in
practice.

The reference reads MySQL with hand-built `SELECT ... WHERE
dispensary_id={id}` strings (mmj/utilities/utils.py:24-31, one
connection, one cursor). The Spark twin is `read_jdbc_partitioned`:
the same pushed-down predicate, but split across executors on a
numeric column so a 10^9-row table arrives as N parallel range scans.

CSV/JSONL readers pin an explicit schema — schema inference reads the
data twice and silently drifts types between runs; at 100 TB both are
unacceptable, so inference is opt-in never default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, delimiter: str = ",",
             mode: str = "FAILFAST") -> DataFrame:
    """CSV scan with explicit schema. FAILFAST by default: a malformed
    row is a data bug, not something to null-fill silently; pass
    mode='PERMISSIVE' + a corrupt-record column to quarantine instead."""
    return (spark.read
            .schema(schema)
            .option("header", str(header).lower())
            .option("sep", delimiter)
            .option("mode", mode)
            .csv(path))


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType,
               mode: str = "FAILFAST") -> DataFrame:
    """JSON-lines scan with explicit schema (the K1 sink's inverse)."""
    return (spark.read
            .schema(schema)
            .option("mode", mode)
            .json(path))


def read_jdbc_partitioned(spark: SparkSession, url: str, table: str,
                          partition_col: str, lower: int, upper: int,
                          num_partitions: int,
                          predicate: str | None = None,
                          fetch_size: int = 10_000,
                          properties: dict | None = None):
    """Partitioned JDBC source — the reference's MySQL reads
    (utils.py:24-31) distributed: `num_partitions` executors each scan
    one `partition_col` range; `predicate` reproduces the reference's
    per-dispensary WHERE pushdown inside the database.

    Returns the configured DataFrameReader result; requires the JDBC
    driver jar on the classpath (not shipped in this environment —
    construction is unit-tested, execution is an integration concern).
    """
    src = f"(SELECT * FROM {table} WHERE {predicate}) t" if predicate \
        else table
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", src)
              .option("partitionColumn", partition_col)
              .option("lowerBound", str(lower))
              .option("upperBound", str(upper))
              .option("numPartitions", str(num_partitions))
              .option("fetchsize", str(fetch_size)))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None,
             merge_schema: bool = False) -> DataFrame:
    """ORC scan — the columnar sibling of parquet for Hive-era lakes.
    Spark's native vectorized ORC reader supports the same pushdowns as
    parquet (predicate, column pruning, partition pruning), so every
    plan gate in tests/test_plan_quality.py holds unchanged over ORC
    inputs. `schema` pins types when provided (same no-inference policy
    as the CSV/JSONL readers); `merge_schema` reconciles files written
    under evolving schemas (costs a footer read per file)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("mergeSchema", str(merge_schema).lower()) \
        .orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: tuple = (), compression: str = "zstd") -> None:
    """ORC sink with zstd (ORC's best size/speed point on modern
    Spark). `partition_by` produces the same Hive layout as the parquet
    maintenance writers, so downstream partition pruning works
    identically."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_avro(spark: SparkSession, path: str,
              schema_json: str | None = None) -> DataFrame:
    """Avro scan (row-major interchange format common at ingest
    boundaries). The spark-avro module is an external jar; this
    container does not ship it, so construction raises a clear error
    when the format is unavailable rather than an opaque
    ClassNotFoundException at action time."""
    reader = spark.read.format("avro")
    if schema_json is not None:
        reader = reader.option("avroSchema", schema_json)
    try:
        return reader.load(path)
    except Exception as e:  # pragma: no cover - depends on jar presence
        if "avro" in str(e).lower() or "Failed to find" in str(e):
            raise RuntimeError(
                "spark-avro is not on the classpath; submit with "
                "--packages org.apache.spark:spark-avro_2.13:<version>"
            ) from e
        raise


def read_jsonl_quarantine(spark: SparkSession, path: str,
                          schema: T.StructType,
                          corrupt_col: str = "_corrupt_record",
                          ) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL ingest that ROUTES instead of failing: returns
    (good, quarantined). Malformed lines land whole in `corrupt_col`
    (good rows have it null), so the pipeline keeps flowing while the
    reject stream goes to a quarantine sink for triage — the standard
    posture for third-party feeds at scale, where FAILFAST on one bad
    line among 10^11 wastes the cluster and silent null-fill corrupts
    the table.

    Note Spark's documented caveat: a query over ONLY the corrupt
    column is disallowed — both returned frames keep the data columns,
    and the quarantine frame carries the raw line plus the parse-null
    data columns for inspection.
    """
    full_schema = T.StructType(
        [*schema.fields, T.StructField(corrupt_col, T.StringType())])
    raw = (spark.read
           .schema(full_schema)
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", corrupt_col)
           .json(path))
    good = raw.filter(raw[corrupt_col].isNull()).drop(corrupt_col)
    bad = raw.filter(raw[corrupt_col].isNotNull())
    return good, bad
