"""Stats surface: the oracle-checked plans compute textbook formulas from
deterministic sorted-sum moments (plans/stats_plans.py); here the Spark
BUILT-IN aggregates (different accumulation order, last-ulp drift) are
asserted against those values within float tolerance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.plans.stats_plans import agg_moments, agg_percentiles
from tests.conftest import SF_SMOKE


def test_builtin_moments_match_textbook(spark):
    textbook = {r["l_returnflag"]: r for r in
                agg_moments(spark, SF_SMOKE).collect()}
    builtin = {r["l_returnflag"]: r for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.var_samp("l_quantity").alias("var_qty"),
             F.stddev_samp("l_quantity").alias("stddev_qty"),
             F.covar_samp("l_quantity", "l_extendedprice").alias("covar"),
             F.corr("l_quantity", "l_extendedprice").alias("corr"))
        .collect())}
    assert textbook.keys() == builtin.keys()
    for flag, t in textbook.items():
        b = builtin[flag]
        assert math.isclose(t["var_qty"], b["var_qty"], rel_tol=1e-9)
        assert math.isclose(t["stddev_qty"], b["stddev_qty"], rel_tol=1e-9)
        assert math.isclose(t["covar_qty_price"], b["covar"], rel_tol=1e-9)
        assert math.isclose(t["corr_qty_price"], b["corr"], rel_tol=1e-9)


def test_percentiles_bounded_by_min_max(spark):
    for r in agg_percentiles(spark, SF_SMOKE).collect():
        assert r["min_qty"] <= r["median_qty"] <= r["p90_qty"] <= r["max_qty"]


def test_approx_percentile_within_rank_error(spark):
    """GK sketch at accuracy 1e4 → rank error <= n/1e4. Compare the
    sketch's median against the exact rank window around 0.5 (the
    registered query is now the contract form; this test recomputes
    the raw sketch value and checks the window independently)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    approx = {r["l_returnflag"]: r["median_qty"]
              for r in li.groupBy("l_returnflag")
              .agg(F.percentile_approx("l_quantity", 0.5, 10_000)
                   .alias("median_qty")).collect()}
    for flag, med in approx.items():
        vals = sorted(r["l_quantity"] for r in
                      li.filter(F.col("l_returnflag") == flag)
                      .select("l_quantity").collect())
        n = len(vals)
        eps = max(1, n // 10_000)
        lo = vals[max(0, n // 2 - eps - 1)]
        hi = vals[min(n - 1, n // 2 + eps + 1)]
        assert lo <= med <= hi, (flag, lo, med, hi)
