"""Physical-plan quality gates: filters reach the parquet scan, column
pruning holds, dimension joins broadcast, no Python row-UDFs sneak into
relational plans. These are the properties that decide 100 TB behavior;
asserting them keeps refactors honest."""

from __future__ import annotations

import re

import pytest

from g1_etl_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _formatted(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def test_q6_filter_pushdown_and_pruning(spark):
    plan = _formatted(spark, "q6_forecast_revenue")
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_shipdate" in m.group(1), "shipdate filter not pushed"
    assert "l_discount" in m.group(1), "discount filter not pushed"
    rs = re.search(r"ReadSchema: struct<(.*?)>", plan)
    cols = rs.group(1)
    # only the four referenced columns are read
    assert set(re.findall(r"(\w+):", cols)) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


@pytest.mark.parametrize("name", ["q3_shipping_priority",
                                  "q5_local_supplier_volume",
                                  "q8_market_share",
                                  "q14_promo_revenue",
                                  "revenue_by_nation",
                                  "corpus_decontaminate"])
def test_dim_joins_broadcast(spark, name):
    plan = _formatted(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


@pytest.mark.parametrize("name", ["q1_pricing_summary",
                                  "q18_large_orders",
                                  "window_analytics",
                                  "events_sessionization",
                                  "dedup_ngram_jaccard"])
def test_no_python_row_udfs(spark, name):
    plan = _formatted(spark, name)
    assert "BatchEvalPython" not in plan, f"{name}: Python row-UDF in plan"


def test_topk_has_partial_window_group_limit(spark):
    """The two-stage top-k must pre-reduce before any exchange — visible
    as a partial WindowGroupLimit in the plan."""
    plan = _formatted(spark, "sim_brute_force_topk")
    assert "WindowGroupLimit" in plan
    assert plan.count("Window") >= 2  # local stage + final stage


def test_lsh_candidate_exchange_carries_ids_only(spark):
    """The candidate-dedup aggregate must group on ids, not embeddings."""
    plan = _formatted(spark, "sim_lsh_topk")
    m = re.findall(r"Keys \[2\]: \[(.*?)\]", plan)
    assert any("q_id" in keys and "vec_id" in keys
               and "embedding" not in keys for keys in m), m
