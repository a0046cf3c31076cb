"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``g1_etl_spark`` package; this module is a
thin adapter over its query registry (g1_etl_spark/plans/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g1_etl_spark.plans import all_oracles, all_queries  # noqa: E402
from g1_etl_spark.plans.tpch import revenue_by_nation  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by customer nation: lineitem ⋈ orders ⋈ broadcast(customer)
    ⋈ broadcast(nation) → groupBy → exact scaled-long sum → sort.
    """
    return revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (when expressible)."""
    return all_oracles()
