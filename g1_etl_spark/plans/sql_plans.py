"""Ad-hoc SQL surface: the SAME ANSI SQL string runs through
``spark.sql`` (tables registered as temp views) and through the DuckDB
oracle verbatim — demonstrating that the engine exposes a full SQL entry
point, not just the DataFrame API (CLI: ``python -m g1_etl_spark sql``).

Queries here are deliberately written in the ANSI dialect both engines
share (no engine-specific functions, no bare double SUMs — COUNT/MIN/MAX
and integer arithmetic only, which are exact in both)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from g1_etl_spark.catalog import TABLES, load_table
from g1_etl_spark.plans.registry import register


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register every testdata table as a temp view and run `sql`."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_ADHOC = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register(
    "sql_passthrough",
    oracle=_ADHOC,
    description="ad-hoc ANSI SQL entry point: the identical SQL string "
                "runs via spark.sql over temp views and via the oracle "
                "(plans/sql_plans.py:run_sql; CLI `sql` subcommand)",
    tags=("sql",),
)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, _ADHOC)
