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


def test_cms_estimate_never_undercounts_any_key(spark):
    import random

    from pyspark.sql import functions as F
    from g1_etl_spark.operators.sketches import cms_build, cms_estimate

    rng = random.Random(7)
    # zipf-ish stream over a key space much wider than the sketch, so
    # collisions are guaranteed and the one-sided bound is actually
    # exercised (not vacuous)
    stream = [(rng.randint(0, 999) if rng.random() < 0.7
               else rng.randint(0, 49),) for _ in range(5000)]
    df = spark.createDataFrame(stream, "k LONG")
    sketch = cms_build(df, "k", width=64)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact, "k", width=64)
    rows = est.collect()
    assert len(rows) == exact.count()
    overcounted = 0
    for r in rows:
        assert r["cms_est"] >= r["exact"], r
        overcounted += int(r["cms_est"] > r["exact"])
    assert overcounted > 0  # the regime is collision-heavy by design


def test_cms_sketches_merge_by_addition(spark):
    from g1_etl_spark.operators.sketches import cms_build

    a = spark.createDataFrame([(i % 10,) for i in range(100)], "k LONG")
    b = spark.createDataFrame([(i % 7,) for i in range(70)], "k LONG")
    merged = {(r.j, r.bucket): r.c
              for r in cms_build(a.unionByName(b), "k").collect()}
    sa = {(r.j, r.bucket): r.c for r in cms_build(a, "k").collect()}
    sb = {(r.j, r.bucket): r.c for r in cms_build(b, "k").collect()}
    summed = dict(sa)
    for cell, c in sb.items():
        summed[cell] = summed.get(cell, 0) + c
    assert merged == summed


def test_cms_exact_when_width_exceeds_keys(spark):
    from pyspark.sql import functions as F
    from g1_etl_spark.operators.sketches import cms_build, cms_estimate

    # 8 keys into width 4096: collision probability ~0 per hash row,
    # and with depth 3 the min over rows recovers exact counts
    df = spark.createDataFrame([(i % 8,) for i in range(80)], "k LONG")
    sketch = cms_build(df, "k", width=4096)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    for r in cms_estimate(sketch, exact, "k", width=4096).collect():
        assert r["cms_est"] == r["exact"] == 10


def _brute_skyline(points):
    """Quadratic reference: keep p unless some q dominates it."""
    keep = []
    for i, (px, py) in enumerate(points):
        dominated = any(
            qx <= px and qy >= py and (qx < px or qy > py)
            for j, (qx, qy) in enumerate(points) if j != i)
        if not dominated:
            keep.append(i)
    return keep


def test_skyline_matches_brute_force_with_duplicates(spark):
    import random

    from g1_etl_spark.operators.analytics import skyline_2d

    rng = random.Random(13)
    pts = [(round(rng.uniform(0, 10), 1), rng.randint(0, 20))
           for _ in range(120)]
    pts += pts[:10]  # exact duplicates: neither dominates, both kept
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id INT, x DOUBLE, y INT")
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute_skyline(pts)


def test_skyline_anticorrelated_keeps_all_correlated_keeps_extreme(spark):
    from g1_etl_spark.operators.analytics import skyline_2d

    # pure trade-off (cost and benefit rise together): every point is
    # Pareto-optimal under (min x, max y)
    tradeoff = spark.createDataFrame(
        [(i, float(i), i) for i in range(50)],
        "id INT, x DOUBLE, y INT")
    assert skyline_2d(tradeoff, "x", "y").count() == 50
    # one corner point beats everything (cheapest AND biggest y)
    corner = spark.createDataFrame(
        [(i, float(i), 100 - i) for i in range(50)],
        "id INT, x DOUBLE, y INT")
    rows = skyline_2d(corner, "x", "y").collect()
    assert len(rows) == 1 and rows[0].id == 0


def test_cms_join_size_never_undercounts(spark):
    import random

    from g1_etl_spark.operators.sketches import cms_build, cms_join_size

    rng = random.Random(21)
    a = spark.createDataFrame(
        [(rng.randint(0, 300),) for _ in range(2000)], "k LONG")
    b = spark.createDataFrame(
        [(rng.randint(100, 500),) for _ in range(1500)], "k LONG")
    est = cms_join_size(cms_build(a, "k", width=64),
                        cms_build(b, "k", width=64)).collect()[0]["est"]
    exact = a.join(b, "k").count()
    assert est >= exact > 0
    # and with a wide sketch (collision-free), the estimate is exact
    est_wide = cms_join_size(
        cms_build(a, "k", width=65536),
        cms_build(b, "k", width=65536)).collect()[0]["est"]
    assert est_wide == exact
