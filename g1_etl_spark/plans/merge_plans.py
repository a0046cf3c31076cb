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
