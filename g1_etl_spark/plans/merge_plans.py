"""Driver-facing MERGE/upsert query with an exact DuckDB oracle.

The update batch is derived deterministically from orders itself (every
50th key gets a price bump + status flip; every 97th key re-keys high as
an insert), so both engines construct identical inputs with no side
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators.merge import upsert
from g1_etl_spark.plans.registry import register


@register(
    "merge_upsert_orders",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice, o_orderdate,
             o_orderpriority
      FROM orders WHERE o_orderkey % 50 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0)
    SELECT * FROM upd
    UNION ALL
    SELECT b.* FROM orders b ANTI JOIN upd u
      ON b.o_orderkey = u.o_orderkey
    """,
    description="Delta-style MERGE (SCD1 upsert): whole-row updates win "
                "by broadcast anti-join + union — the base table is "
                "never shuffled (operators/merge.py:upsert)",
    tags=("merge", "relational"),
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders")
    changed = (base.filter(F.col("o_orderkey") % 50 == 0)
               .withColumn("o_orderstatus", F.lit("U"))
               .withColumn("o_totalprice", F.col("o_totalprice") * 1.1))
    inserts = (base.filter(F.col("o_orderkey") % 97 == 0)
               .withColumn("o_orderkey",
                           F.col("o_orderkey") + 100_000_000)
               .withColumn("o_orderstatus", F.lit("N")))
    return upsert(base, changed.unionByName(inserts), ["o_orderkey"])


@register(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT))
                AS BIGINT) AS total_scaled,
           MIN(CAST(o_orderdate AS DATE)) AS first_date,
           MAX(CAST(o_orderdate AS DATE)) AS last_date
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    description="incremental aggregate maintenance: stored pre-1997 "
                "rollup merged with the 1997+ delta's partial "
                "aggregate — algebraic-state merge, base never "
                "rescanned; must equal the full GROUP BY",
    tags=("merge", "agg"),
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.merge import merge_partial_aggregates

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.round(F.col("o_totalprice") * 1_000_000).cast("long")
        .alias("price_scaled"),
        F.to_date("o_orderdate").alias("d"))
    cut = F.lit("1997-01-01").cast("date")

    def rollup(df):
        return df.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_scaled").alias("total_scaled"),
            F.min("d").alias("first_date"),
            F.max("d").alias("last_date"))

    base_agg = rollup(o.filter(F.col("d") < cut))     # the stored rollup
    delta_agg = rollup(o.filter(F.col("d") >= cut))   # today's batch
    return merge_partial_aggregates(
        base_agg, delta_agg, ["o_orderstatus", "o_orderpriority"],
        {"n_orders": "count", "total_scaled": "sum",
         "first_date": "min", "last_date": "max"})


@register(
    "merge_join_delta",
    oracle="""
    WITH a AS (SELECT o_orderkey, o_orderdate FROM orders
               WHERE o_orderdate < DATE '1998-01-01'),
    da AS (SELECT o_orderkey, o_orderdate FROM orders
           WHERE o_orderdate >= DATE '1998-01-01'),
    b AS (SELECT l_orderkey, l_partkey, l_shipdate, l_extendedprice
          FROM lineitem WHERE l_shipdate < DATE '1998-06-01'),
    db AS (SELECT l_orderkey, l_partkey, l_shipdate, l_extendedprice
           FROM lineitem WHERE l_shipdate >= DATE '1998-06-01')
    SELECT o_orderkey, o_orderdate, l_partkey, l_shipdate,
           l_extendedprice
    FROM da JOIN b ON o_orderkey = l_orderkey
    UNION ALL
    SELECT o_orderkey, o_orderdate, l_partkey, l_shipdate,
           l_extendedprice
    FROM a JOIN db ON o_orderkey = l_orderkey
    UNION ALL
    SELECT o_orderkey, o_orderdate, l_partkey, l_shipdate,
           l_extendedprice
    FROM da JOIN db ON o_orderkey = l_orderkey
    """,
    description="incremental join-view maintenance (delta rule): with "
                "insert batches dA (new orders) and dB (new lineitems) "
                "arriving on a stored orders⋈lineitem view, emit "
                "exactly dA⋈B ∪ A⋈dB ∪ dA⋈dB — the stored view is "
                "never rescanned and the fact sides only ever join a "
                "broadcast delta",
    tags=("merge", "join"),
)
def merge_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.merge import incremental_join_delta
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_partkey",
        "l_shipdate", "l_extendedprice")
    ocut = F.lit("1998-01-01").cast("date")
    lcut = F.lit("1998-06-01").cast("date")
    return incremental_join_delta(
        o.filter(F.col("o_orderdate") < ocut),
        o.filter(F.col("o_orderdate") >= ocut),
        li.filter(F.col("l_shipdate") < lcut),
        li.filter(F.col("l_shipdate") >= lcut),
        on="o_orderkey")
