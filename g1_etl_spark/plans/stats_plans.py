"""Statistical aggregation surface with deterministic oracles.

stddev/variance/correlation are NOT oracle-safe via the built-ins (Spark
and DuckDB use different accumulation algorithms -> last-ulp drift), so
the oracle-checked forms compute the textbook formulas from exact decimal
sums — identical double operands on both sides. The built-in variants are
asserted within tolerance in tests/test_stats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.plans.registry import register


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    description="exact interpolated percentiles (percentile/quantile_cont)",
    tags=("agg", "stats"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.percentile("l_quantity", 0.5).alias("median_qty"),
                 F.percentile("l_quantity", 0.9).alias("p90_qty"),
                 F.percentile("l_extendedprice", 0.25).alias("p25_price"),
                 F.min("l_quantity").alias("min_qty"),
                 F.max("l_quantity").alias("max_qty")))


# Second-moment sums (x², xy) overflow double's 15.95 significant digits
# when routed through wide decimals (the decimal->double cast then rounds
# differently per engine), so they use the OTHER determinism tool: sort
# the per-row products, sum sequentially — identical operation order in
# both engines. The scale path for plain sums stays decimal (plans/_util).
_SORTSUM = "list_sum(list_sort(list({expr})))"


@register(
    "agg_moments",
    oracle=f"""
    SELECT l_returnflag, n,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))
             AS corr_qty_price
    FROM (SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 {_SORTSUM.format(expr='l_quantity')} AS sx,
                 {_SORTSUM.format(expr='l_quantity * l_quantity')} AS sxx,
                 {_SORTSUM.format(expr='l_extendedprice')} AS sy,
                 {_SORTSUM.format(expr='l_extendedprice * l_extendedprice')}
                   AS syy,
                 {_SORTSUM.format(expr='l_quantity * l_extendedprice')}
                   AS sxy
          FROM lineitem GROUP BY l_returnflag)
    """,
    description="variance/stddev/covariance/correlation from sorted "
                "sequential-sum moments (textbook formulas, "
                "bit-deterministic; see module docstring)",
    tags=("agg", "stats"),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def sortsum(expr):
        return F.aggregate(F.array_sort(F.collect_list(expr)),
                           F.lit(0.0), lambda acc, x: acc + x)

    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    base = (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 sortsum(q).alias("sx"),
                 sortsum(q * q).alias("sxx"),
                 sortsum(p).alias("sy"),
                 sortsum(p * p).alias("syy"),
                 sortsum(q * p).alias("sxy")))
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return base.select(
        "l_returnflag", "n",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_price"),
        ((sxy - sx * sy / n)
         / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)))
        .alias("corr_qty_price"),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
    description="fixed-width histogram buckets over order totals",
    tags=("agg", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.floor(F.col("o_totalprice") / 25000).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi")))


# Contract row: the sketch value itself is engine-specific, but its
# ERROR BOUND is checkable. percentile_approx(accuracy=1e4) guarantees
# rank error <= 1e-4; the contract brackets the approx value between
# the exact interpolated quantiles at p +/- 0.001 (10x the guaranteed
# rank error, so value-level monotonicity absorbs interpolation) and
# ships the booleans to the driver — a sketch regression breaking the
# GK guarantee turns the row red.
@register(
    "agg_approx_percentile",
    oracle="""
    SELECT DISTINCT l_returnflag, TRUE AS median_ok, TRUE AS p90_ok
    FROM lineitem
    """,
    description="approximate percentiles (GK sketch, accuracy 1e4): "
                "mergeable one-pass summaries — the 100 TB path where "
                "exact percentile's full sort/collect is off the table; "
                "registered as an error-bound contract vs the exact "
                "quantiles at p +/- 0.001",
    tags=("agg", "stats", "sketch", "contract"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = (li.groupBy("l_returnflag")
           .agg(F.percentile_approx("l_quantity", 0.5, 10_000)
                .alias("median_qty"),
                F.percentile_approx("l_extendedprice", 0.9, 10_000)
                .alias("p90_price"),
                F.expr("percentile(l_quantity, 0.499)").alias("_q_lo"),
                F.expr("percentile(l_quantity, 0.501)").alias("_q_hi"),
                F.expr("percentile(l_extendedprice, 0.899)").alias("_p_lo"),
                F.expr("percentile(l_extendedprice, 0.901)").alias("_p_hi")))
    return agg.select(
        "l_returnflag",
        ((F.col("median_qty") >= F.col("_q_lo"))
         & (F.col("median_qty") <= F.col("_q_hi"))).alias("median_ok"),
        ((F.col("p90_price") >= F.col("_p_lo"))
         & (F.col("p90_price") <= F.col("_p_hi"))).alias("p90_ok"))


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY COUNT(*) DESC,
                                             o_orderpriority) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_orderpriority)
    WHERE rn = 1
    """,
    description="mode (most frequent value) per group with deterministic "
                "tie-break",
    tags=("agg", "stats"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    counts = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy("c_mktsegment", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("n"), "o_orderpriority")
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("c_mktsegment",
                    F.col("o_orderpriority").alias("mode_priority"), "n"))


_CMS_W = 256
# the three (a, b) LCG rows restated verbatim from operators/sketches —
# the oracle recomputes the exact buckets, cells and min-estimates
_CMS_HASHES_SQL = ("(VALUES (0, 1103515245, 12345), "
                   "(1, 69069, 362437), "
                   "(2, 1664525, 1013904223)) AS h(j, a, b)")

_CMS_SQL = f"""
    WITH counts AS (SELECT o_custkey AS k, COUNT(*) AS cnt
                    FROM orders GROUP BY o_custkey),
    hashes AS (SELECT * FROM {_CMS_HASHES_SQL}),
    cells AS (
      SELECT h.j, ((h.a * c.k + h.b) % 2147483647) % {_CMS_W} AS bucket,
             CAST(SUM(c.cnt) AS BIGINT) AS c
      FROM counts c CROSS JOIN hashes h GROUP BY 1, 2),
    topk AS (SELECT k, cnt FROM counts ORDER BY cnt DESC, k LIMIT 20),
    probes AS (
      SELECT t.k, t.cnt, h.j,
             ((h.a * t.k + h.b) % 2147483647) % {_CMS_W} AS bucket
      FROM topk t CROSS JOIN hashes h)
    SELECT p.k AS custkey, p.cnt AS exact_cnt, MIN(s.c) AS cms_est
    FROM probes p JOIN cells s ON p.j = s.j AND p.bucket = s.bucket
    GROUP BY 1, 2 ORDER BY custkey
"""


@register(
    "sketch_cms_orders",
    oracle=_CMS_SQL,
    description="Count-Min sketch (depth 3 x width 256, all-integer "
                "LCG hashes) over per-customer order counts, probed at "
                "the exact top-20 customers — the mergeable O(d*w) "
                "frequency structure (cell updates are SUMs, so "
                "partition-local sketches merge by addition with "
                "map-side combine); output carries exact vs estimate "
                "side by side, and est >= exact is the one-sided CMS "
                "bound (property-tested); the oracle restates the LCG "
                "buckets verbatim, so even the COLLISION pattern is "
                "bit-checked",
    tags=("sketch", "agg", "scale"),
)
def sketch_cms_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sketches import cms_build, cms_estimate

    orders = load_table(spark, sf_dir, "orders")
    sketch = cms_build(orders, "o_custkey", width=_CMS_W)
    counts = (orders.groupBy(F.col("o_custkey").alias("custkey"))
              .agg(F.count(F.lit(1)).alias("exact_cnt")))
    topk = counts.orderBy(F.desc("exact_cnt"), "custkey").limit(20)
    return (cms_estimate(sketch, topk, "custkey", width=_CMS_W)
            .select("custkey", "exact_cnt", "cms_est")
            .orderBy("custkey"))


@register(
    "skyline_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part r
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= r.p_retailprice
        AND q.p_size >= r.p_size
        AND (q.p_retailprice < r.p_retailprice OR q.p_size > r.p_size))
    ORDER BY p_partkey
    """,
    description="2-D skyline / Pareto front of parts (minimize retail "
                "price, maximize size) — EXACT without any pairwise "
                "comparison: dominance reduces to a per-price group "
                "max plus a distributed STRICT prefix max over the "
                "price-ordered group table (the global_rank/budget_fill "
                "range-partition shape), then one equi-join back; "
                "oracle = the textbook quadratic NOT EXISTS self-join, "
                "a genuinely different algorithm agreeing row-for-row "
                "(operators/analytics.skyline_2d)",
    tags=("analytics", "scale"),
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.analytics import skyline_2d

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size")
    return (skyline_2d(part, "p_retailprice", "p_size")
            .orderBy("p_partkey"))


_CMS_JOIN_SQL = f"""
    WITH ca AS (SELECT o_custkey AS k, COUNT(*) AS cnt
                FROM orders GROUP BY 1),
    cb AS (SELECT c_custkey AS k, COUNT(*) AS cnt
           FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
    hashes AS (SELECT * FROM {_CMS_HASHES_SQL}),
    sa AS (SELECT h.j,
                  ((h.a * ca.k + h.b) % 2147483647) % {_CMS_W} AS bucket,
                  CAST(SUM(ca.cnt) AS BIGINT) AS c
           FROM ca CROSS JOIN hashes h GROUP BY 1, 2),
    sb AS (SELECT h.j,
                  ((h.a * cb.k + h.b) % 2147483647) % {_CMS_W} AS bucket,
                  CAST(SUM(cb.cnt) AS BIGINT) AS c
           FROM cb CROSS JOIN hashes h GROUP BY 1, 2),
    ip AS (SELECT sa.j, CAST(SUM(sa.c * sb.c) AS BIGINT) AS v
           FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
           GROUP BY 1),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_size
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING')
    SELECT (SELECT MIN(v) FROM ip) AS est,
           ex.exact_size,
           (SELECT MIN(v) FROM ip) >= ex.exact_size AS lower_bound_ok
    FROM ex
"""


@register(
    "sketch_cms_join_size",
    oracle=_CMS_JOIN_SQL,
    description="sketch-based JOIN-SIZE estimation: |orders x BUILDING "
                "customers on custkey| estimated as the Count-Min "
                "inner product min_j sum_b A[j][b]*B[j][b] — how an "
                "optimizer sizes a join from O(d*w) state per relation "
                "without touching data; every bucket product contains "
                "all true matches plus non-negative collision terms, "
                "so est >= exact always (lower_bound_ok carried in the "
                "row); the LCG buckets are SQL-stated, so the ESTIMATE "
                "itself hash-matches the oracle, not just the bound",
    tags=("sketch", "join", "scale"),
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.sketches import cms_build, cms_join_size

    orders = load_table(spark, sf_dir, "orders")
    cust = (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING"))
    est = cms_join_size(cms_build(orders, "o_custkey", width=_CMS_W),
                        cms_build(cust, "c_custkey", width=_CMS_W))
    exact = (orders.join(cust,
                         orders.o_custkey == cust.c_custkey)
             .agg(F.count(F.lit(1)).alias("exact_size")))
    return (est.crossJoin(F.broadcast(exact))
            .select("est", "exact_size",
                    (F.col("est") >= F.col("exact_size"))
                    .alias("lower_bound_ok")))
