"""Checks that aren't expressible as exact oracle twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_approx_count_distinct_within_5pct(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"]), r


def test_broadcast_join_chosen_for_dims(spark):
    from g1_etl_spark.plans.relational import join_inner

    plan = join_inner(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    from g1_etl_spark.plans.relational import filter_pushdown

    df = filter_pushdown(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]
