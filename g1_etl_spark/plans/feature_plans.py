"""Driver-facing feature-engineering queries with exact DuckDB oracles,
plus the k-means cluster-assignment query, registered as a
nearest-centroid contract row (the Lloyd iteration itself has no SQL
twin, but the assignment invariant is oracle-checkable)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators import features as FE
from g1_etl_spark.plans.registry import register

_SORTSUM = "list_sum(list_sort(list({expr})))"
_BINS = 10


@register(
    "feat_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {_SORTSUM.format(expr='o_totalprice')} AS sx,
             {_SORTSUM.format(expr='o_totalprice * o_totalprice')} AS sxx
      FROM orders GROUP BY o_orderpriority),
    g AS (
      SELECT o_orderpriority, sx / n AS grp_mean,
             CASE WHEN n > 1
                  THEN sqrt((sxx - sx * sx / n) / (n - 1)) END AS grp_std
      FROM stats)
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           g.grp_mean, g.grp_std,
           CASE WHEN g.grp_std > 0
                THEN (o.o_totalprice - g.grp_mean) / g.grp_std
           END AS z
    FROM orders o JOIN g USING (o_orderpriority)
    """,
    description="per-group z-score normalization: tiny stats aggregate "
                "broadcast back, fact table never shuffled "
                "(operators/features.py:zscore_per_group)",
    tags=("features",),
)
def feat_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    return FE.zscore_per_group(o, "o_totalprice", ["o_orderpriority"])


@register(
    "feat_minmax",
    oracle="""
    WITH g AS (
      SELECT o_orderstatus, MIN(o_totalprice) AS grp_min,
             MAX(o_totalprice) AS grp_max
      FROM orders GROUP BY o_orderstatus)
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
           g.grp_min, g.grp_max,
           CASE WHEN g.grp_max - g.grp_min > 0
                THEN (o.o_totalprice - g.grp_min)
                     / (g.grp_max - g.grp_min)
           END AS scaled
    FROM orders o JOIN g USING (o_orderstatus)
    """,
    description="per-group min-max scaling to [0,1] "
                "(operators/features.py:minmax_per_group)",
    tags=("features",),
)
def feat_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    return FE.minmax_per_group(o, "o_totalprice", ["o_orderstatus"])


@register(
    "feat_equidepth_bins",
    oracle=f"""
    WITH r AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
               AS rank,
             COUNT(*) OVER () AS total
      FROM orders)
    SELECT o_orderkey, o_totalprice,
           CAST(FLOOR((rank - 1) * {_BINS} / total) + 1 AS INT) AS bin
    FROM r
    """,
    description="equi-depth decile binning via distributed total-order "
                "rank — no single-partition NTILE window "
                "(operators/features.py:equidepth_bins)",
    tags=("features",),
)
def feat_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice")
    return FE.equidepth_bins(o, "o_totalprice", ["o_orderkey"],
                             n_bins=_BINS)


# Contract row: Lloyd iteration has no SQL twin, but the assignment
# INVARIANT does — every vector's assigned cluster must score at least
# as high as every other cluster against the final centroids. The
# re-check runs through a second, independent implementation (JVM
# expression dot products over exploded centroid literals) of the
# Arrow-matmul assignment, so a drift between the two paths (wrong
# centroid broadcast, normalization bug, argmax tie handling) turns
# the row red. Tolerance 1e-9 absorbs matmul-vs-sequential float
# reassociation on genuine near-ties.
@register(
    "sim_kmeans_clusters",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) AS BIGINT) AS n_nearest_ok,
           TRUE AS all_nearest
    FROM embeddings
    """,
    description="k-means cluster assignment over embeddings: "
                "deterministic hash-seeded centroids, distributed Lloyd "
                "steps (Arrow matmul assign + per-component mean); "
                "registered as the nearest-centroid contract — JVM "
                "re-scoring must agree with the Arrow assignment for "
                "every vector",
    tags=("similarity", "clustering", "contract"),
)
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.similarity import (_assign_cells, dot,
                                                   train_ivf_centroids)

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_cells=8, iters=4)
    assigned = emb.select(
        "vec_id", "embedding",
        _assign_cells(1, cents)(F.col("embedding"))[0].alias("cluster"))
    # assignment is argmax over COSINE — both sides normalized. The
    # per-row vector normalization is a positive row-constant (argmax-
    # invariant), but the per-CELL centroid normalization is not, so
    # the literals must carry the same unit centroids _assign_cells
    # uses. 8x row explode, zero joins/exchanges on the re-check path.
    unit = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cent_lit = F.array(*[
        F.struct(F.lit(i).alias("cell"),
                 F.array(*[F.lit(float(x)) for x in unit[i]])
                 .alias("cvec"))
        for i in range(len(unit))])
    pairs = assigned.select(
        "vec_id", "cluster", F.explode(cent_lit).alias("c"),
        "embedding")
    scored = pairs.select(
        "vec_id", "cluster", F.col("c.cell").alias("cell"),
        dot(F.col("embedding"), F.col("c.cvec")).alias("s"))
    per_vec = (scored.groupBy("vec_id", "cluster")
               .agg(F.max("s").alias("best"),
                    F.max(F.when(F.col("cell") == F.col("cluster"),
                                 F.col("s"))).alias("mine")))
    flags = per_vec.select(
        (F.col("mine") >= F.col("best") - F.lit(1e-9)).alias("ok"))
    return flags.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("ok").cast("long")).alias("n_nearest_ok"),
        F.min("ok").alias("all_nearest"))


_PCA_ITERS = 6
_SU = 1_000_000_000_000
_SW = 1_000_000_000


def _pca_iter_cte(k: int) -> str:
    return f"""
    u{k} AS (SELECT c.vec_id,
                    CAST(SUM(CAST(round(c.xv * v.v * {_SU}) AS BIGINT))
                         AS DOUBLE) / {_SU} AS u
             FROM xc c JOIN v{k - 1} v USING (idx) GROUP BY c.vec_id),
    w{k} AS (SELECT c.idx,
                    CAST(SUM(CAST(round(c.xv * u.u * {_SW}) AS BIGINT))
                         AS DOUBLE) / {_SW} / (SELECT n FROM cnt) AS w
             FROM xc c JOIN u{k} u USING (vec_id) GROUP BY c.idx),
    n{k} AS (SELECT sqrt(CAST(SUM(CAST(round(w * w * {_SU}) AS BIGINT))
                              AS DOUBLE) / {_SU}) AS nrm FROM w{k}),
    v{k} AS (SELECT idx, w / nrm AS v FROM w{k} CROSS JOIN n{k})
"""


_PCA_SQL = (f"""
    WITH cnt AS (SELECT COUNT(*) AS n FROM embeddings),
    xr AS (SELECT vec_id, g.i AS idx,
                  CAST(embedding[g.i] AS DOUBLE) AS x
           FROM embeddings, LATERAL unnest(range(1, 65)) g(i)),
    mu AS (SELECT idx,
                  CAST(SUM(CAST(round(x * {_SW}) AS BIGINT)) AS DOUBLE)
                    / {_SW} / (SELECT n FROM cnt) AS m
           FROM xr GROUP BY idx),
    xc AS (SELECT x.vec_id, x.idx, x.x - m.m AS xv
           FROM xr x JOIN mu m USING (idx)),
    v0 AS (SELECT unnest(range(1, 65)) AS idx,
                  CAST(0.125 AS DOUBLE) AS v),
"""
            + ",".join(_pca_iter_cte(k) for k in range(1, _PCA_ITERS + 1))
            + f"""
    SELECT c.vec_id,
           CAST(SUM(CAST(round(c.xv * v.v * {_SU}) AS BIGINT)) AS DOUBLE)
             / {_SU} AS score
    FROM xc c JOIN v{_PCA_ITERS} v USING (idx)
    GROUP BY c.vec_id
    ORDER BY c.vec_id
""")


@register(
    "feat_pca_project",
    oracle=_PCA_SQL,
    description="distributed PCA by power iteration (6 rounds on the "
                "centered Gram matrix, v0 uniform = 1/sqrt(64)): every "
                "vector's projection onto the learned principal "
                "direction. All cross-row/cross-component sums go "
                "through scaled longs and the rest is IEEE-exact, so "
                "the DuckDB twin unrolls the iteration as chained CTEs "
                "and hash-matches — iterative ML #3 after PageRank and "
                "the BPE trainer",
    tags=("features", "iterative"),
)
def feat_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.features import pca_project
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, iters=_PCA_ITERS).orderBy("vec_id")


@register(
    "feat_winsorize",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS p_lo,
             quantile_cont(o_totalprice, 0.95) AS p_hi
      FROM orders GROUP BY o_orderpriority)
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           g.p_lo, g.p_hi,
           CASE WHEN o.o_totalprice < g.p_lo THEN g.p_lo
                WHEN o.o_totalprice > g.p_hi THEN g.p_hi
                ELSE o.o_totalprice END AS winsorized
    FROM orders o JOIN g USING (o_orderpriority)
    """,
    description="per-group winsorization: clip to the exact p05/p95 "
                "band — heavy-tail outlier treatment before scaling; "
                "tiny quantile frame broadcast back, fact never "
                "shuffled (operators/features.winsorize_per_group)",
    tags=("features",),
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    return FE.winsorize_per_group(o, "o_totalprice", ["o_orderpriority"])


_OLS_SORTSUM = _SORTSUM


@register(
    "feat_ols_per_group",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {_OLS_SORTSUM.format(expr='l_quantity')} AS sx,
             {_OLS_SORTSUM.format(expr='l_quantity * l_quantity')} AS sxx,
             {_OLS_SORTSUM.format(expr='l_extendedprice')} AS sy,
             {_OLS_SORTSUM.format(expr='l_extendedprice * l_extendedprice')}
               AS syy,
             {_OLS_SORTSUM.format(expr='l_quantity * l_extendedprice')}
               AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END
             AS slope,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                           * sx) / n END AS intercept,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                     AND n * syy - sy * sy > 0
                THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END
             AS r2
    FROM m
    """,
    description="per-group OLS regression (price ~ quantity): slope/"
                "intercept/r2 from ONE pass of five algebraic moment "
                "sums (the ANSI regr_* family) — map-side partial agg, "
                "no residual second pass; sorted-sequential sums keep "
                "both engines bit-identical "
                "(operators/features.ols_per_group)",
    tags=("features", "stats"),
)
def feat_ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return FE.ols_per_group(li, "l_quantity", "l_extendedprice",
                            ["l_returnflag"])


@register(
    "feat_target_encoding",
    oracle="""
    WITH s AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(round(o_totalprice * 1000000) AS BIGINT) AS own_sc
      FROM orders),
    g AS (
      SELECT o_orderpriority,
             CAST(SUM(own_sc) AS BIGINT) AS sum_sc,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s GROUP BY o_orderpriority)
    SELECT s.o_orderkey, s.o_orderpriority, s.o_totalprice,
           CASE WHEN g.n > 1
                THEN CAST(g.sum_sc - s.own_sc AS DOUBLE)
                     / (g.n - 1) / 1000000 END AS loo_mean
    FROM s JOIN g USING (o_orderpriority)
    """,
    description="leave-one-out target encoding (the ML categorical "
                "encoder that avoids self-leakage): each row gets the "
                "mean target of the OTHER rows in its category, "
                "(group_sum - own) / (n-1) — one tiny per-group "
                "aggregate broadcast back, the subtraction exact in "
                "scaled longs so no row's own value contaminates its "
                "feature even in the last bit; singleton categories "
                "yield NULL in both engines",
    tags=("features",),
)
def feat_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.select("o_orderkey", "o_orderpriority", "o_totalprice",
                 F.round(F.col("o_totalprice") * 1000000).cast("long")
                 .alias("_own"))
    g = (s.groupBy("o_orderpriority")
         .agg(F.sum("_own").alias("_sum"),
              F.count(F.lit(1)).alias("_n")))
    loo = ((F.col("_sum") - F.col("_own")).cast("double")
           / (F.col("_n") - 1) / 1000000)
    return (s.join(F.broadcast(g), "o_orderpriority")
            .select("o_orderkey", "o_orderpriority", "o_totalprice",
                    F.when(F.col("_n") > 1, loo).alias("loo_mean")))


@register(
    "feat_woe_iv",
    oracle="""
    WITH s AS (SELECT o_totalprice AS x,
                      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                        AS is_bad
               FROM orders),
    mm AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM s),
    b AS (SELECT LEAST(CAST(floor((x - lo) / (hi - lo) * 10) AS INT), 9)
                   AS bin,
                 is_bad
          FROM s CROSS JOIN mm),
    g AS (SELECT bin, COUNT(*) - SUM(is_bad) AS good,
                 SUM(is_bad) AS bad
          FROM b GROUP BY bin),
    t AS (SELECT SUM(good) AS tg, SUM(bad) AS tb FROM g)
    SELECT bin, CAST(good AS BIGINT) AS good, CAST(bad AS BIGINT) AS bad,
           CAST(round(ln(((good + 0.5) * (tb + 5.0))
                         / ((bad + 0.5) * (tg + 5.0))) * 1000000)
                AS BIGINT) AS woe_e6,
           (CAST(good AS DOUBLE) / tg - CAST(bad AS DOUBLE) / tb)
             * (CAST(round(ln(((good + 0.5) * (tb + 5.0))
                              / ((bad + 0.5) * (tg + 5.0))) * 1000000)
                     AS BIGINT) / 1000000.0) AS iv_term
    FROM g CROSS JOIN t
    ORDER BY bin
    """,
    description="weight-of-evidence / information-value bins (credit-"
                "scoring & feature-selection staple): 10 equi-width "
                "bins over order totals vs the o_orderstatus='F' label, "
                "Laplace-smoothed WOE = ln(good share / bad share) "
                "pinned to a scaled integer (the repo's ln-pinning "
                "idiom) so both engines agree bit-for-bit; iv_term is "
                "the per-bin IV contribution on the pinned WOE. "
                "Scale shape: one min/max scalar broadcast over the "
                "scan, one 10-row bin aggregate — two passes, no "
                "shuffle wider than 10 rows",
    tags=("features", "stats"),
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.select(F.col("o_totalprice").alias("x"),
                 F.when(F.col("o_orderstatus") == "F", 1)
                 .otherwise(0).alias("is_bad"))
    mm = s.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    b = (s.crossJoin(F.broadcast(mm))
         .select(F.least(F.floor((F.col("x") - F.col("lo"))
                                 / (F.col("hi") - F.col("lo")) * 10)
                         .cast("int"), F.lit(9)).alias("bin"),
                 "is_bad"))
    g = b.groupBy("bin").agg(
        (F.count(F.lit(1)) - F.sum("is_bad")).alias("good"),
        F.sum("is_bad").alias("bad"))
    t = g.agg(F.sum("good").alias("tg"), F.sum("bad").alias("tb"))
    woe_e6 = F.round(F.ln(
        ((F.col("good") + 0.5) * (F.col("tb") + 5.0))
        / ((F.col("bad") + 0.5) * (F.col("tg") + 5.0))) * 1000000) \
        .cast("long")
    w = g.crossJoin(F.broadcast(t)).withColumn("woe_e6", woe_e6)
    return (w.select(
        "bin", F.col("good").cast("long").alias("good"),
        F.col("bad").cast("long").alias("bad"), "woe_e6",
        ((F.col("good").cast("double") / F.col("tg")
          - F.col("bad").cast("double") / F.col("tb"))
         * (F.col("woe_e6") / F.lit(1000000.0))).alias("iv_term"))
        .orderBy("bin"))


@register(
    "feat_ridge_price",
    oracle="""
    WITH s AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x1,
                      CAST(round(l_discount * 10000) AS BIGINT) AS x2,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS y
               FROM lineitem),
    m AS (SELECT COUNT(*) AS n,
                 SUM(CAST(x1 AS HUGEINT)) AS s1,
                 SUM(CAST(x2 AS HUGEINT)) AS s2,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
                 SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
                 SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
                 SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
                 SUM(CAST(x2 AS HUGEINT) * y) AS s2y
          FROM s),
    c AS (SELECT CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
                 CAST(sy AS DOUBLE) AS syd,
                 CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                   + 1000000.0 AS a11,
                 CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                   + 1000000.0 AS a22,
                 CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a12,
                 CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b1,
                 CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS b2
          FROM m),
    k AS (SELECT nd, s1d, s2d, syd,
                 (a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12)
                   AS w1s,
                 (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12)
                   AS w2s
          FROM c)
    SELECT CAST(nd AS BIGINT) AS n,
           w1s AS coef_quantity,
           w2s * 100.0 AS coef_discount,
           (syd - w1s * s1d - w2s * s2d) / nd / 100.0 AS intercept
    FROM k
    """,
    description="closed-form ridge regression (lambda = 1e6 in scaled "
                "units, intercept unpenalized) of extended price on "
                "(quantity, discount): the 2-feature normal equations "
                "are NINE exact 128-bit integer moment sums of "
                "pre-scaled longs, then the centered 2x2 system is "
                "inverted in one fixed double expression tree both "
                "engines share — the regularized sibling of "
                "feat_ols_per_group, and the shape every closed-form "
                "GLM takes at 100 TB: one aggregate scan, driver-sized "
                "algebra, no iteration. Coefficients reported in "
                "ORIGINAL units via exact scale-factor multiplications",
    tags=("features", "stats"),
)
def feat_ridge_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    s = li.select(
        F.round(F.col("l_quantity") * 100).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    m = s.agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("x1").cast(d38)).alias("s1"),
              F.sum(F.col("x2").cast(d38)).alias("s2"),
              F.sum(F.col("y").cast(d38)).alias("sy"),
              F.sum(F.col("x1").cast(d38) * F.col("x1")).alias("s11"),
              F.sum(F.col("x2").cast(d38) * F.col("x2")).alias("s22"),
              F.sum(F.col("x1").cast(d38) * F.col("x2")).alias("s12"),
              F.sum(F.col("x1").cast(d38) * F.col("y")).alias("s1y"),
              F.sum(F.col("x2").cast(d38) * F.col("y")).alias("s2y"))
    nd = F.col("n").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    syd = F.col("sy").cast("double")
    lam = F.lit(1000000.0)
    a11 = F.col("s11").cast("double") - s1d * s1d / nd + lam
    a22 = F.col("s22").cast("double") - s2d * s2d / nd + lam
    a12 = F.col("s12").cast("double") - s1d * s2d / nd
    b1 = F.col("s1y").cast("double") - s1d * syd / nd
    b2 = F.col("s2y").cast("double") - s2d * syd / nd
    det = a11 * a22 - a12 * a12
    w1s = (a22 * b1 - a12 * b2) / det
    w2s = (a11 * b2 - a12 * b1) / det
    return m.select(
        F.col("n").cast("long").alias("n"),
        w1s.alias("coef_quantity"),
        (w2s * 100.0).alias("coef_discount"),
        ((syd - w1s * s1d - w2s * s2d) / nd / 100.0).alias("intercept"))


_LOGIT_ITERS = 4
_E6 = 1_000_000


def logistic_irls_cells(cells: DataFrame,
                        iters: int = _LOGIT_ITERS) -> tuple:
    """IRLS (Newton) logistic regression on a QUANTIZED cell census:
    `cells` holds (q, dc, n, ny) — integer feature levels with exact
    per-cell row/positive counts, the sufficient statistics of the
    whole dataset. Returns (b0, b1, b2) in (1, q, dc) units after
    `iters` fixed Newton steps from b = 0.

    This is the 100 TB shape for a GLM on quantized features: ONE
    data-sized census pass, then every iteration touches only the
    alphabet-bounded cell frame (<= 51*11 rows here) — the
    feat_ridge_price philosophy extended to an iterative model.

    Determinism contract (the reason every step below is pinned): the
    ONLY cross-engine libm call is exp(); its result is immediately
    pinned to a 1e-6 grid (p_w), and ALL downstream quantities — the
    IRLS weight w, the working response, the 9 normal-equation moments
    — are exact integer arithmetic on the pinned values, so a last-ulp
    exp() disagreement between the JVM and DuckDB can only matter if
    p*1e6 lands within ~1e-10 of a rounding boundary (the pinned-ln
    exposure the MI/Theil family already accepts). The 3x3 Cramer
    solve runs on identical doubles with an identical expression tree
    in Python (driver) and SQL (oracle), so each iterate is
    bit-reproducible.
    """
    # r12 (guide §1.2 / §5 — bounded driver metadata, the
    # graph_mst_boruvka discipline): the census is alphabet-bounded
    # (<= 51 x 11 cells), yet each Newton step ran as its own Spark
    # agg+collect job — 4 scheduled rounds of pure fixed cost. The
    # census is now collected ONCE through the bounded_collect guard
    # and the steps run on the driver with the EXACT arithmetic the
    # Spark expressions computed: identical double tree left-to-right,
    # exp() pinned to the 1e-6 grid the instant it is produced
    # (CPython's libm exp vs the JVM's Math.exp may differ in the last
    # ulp — the SAME class of exposure the DuckDB oracle's exp()
    # already carries, absorbed by the pinning unless p*1e6 lands
    # within an ulp of a rounding boundary; parity stays hash-verified
    # at sf0.001 + sf0.01 like every pinned-libm operator), round =
    # HALF_UP on the exact binary double (decimal.Decimal mirrors
    # java.math.BigDecimal), and the nine moment sums are exact Python
    # ints (== the old decimal(38,0) / the oracle's HUGEINT sums).
    from decimal import ROUND_HALF_UP, Decimal

    from g1_etl_spark.plans._util import bounded_collect

    def rnd(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1),
                                       rounding=ROUND_HALF_UP))

    rows = bounded_collect(cells.select("q", "dc", "n", "ny"),
                           "logistic IRLS cell census", limit=4096)
    cell = [(int(r["q"]), int(r["dc"]), int(r["n"]), int(r["ny"]))
            for r in rows]
    b = (0.0, 0.0, 0.0)
    for _ in range(iters):
        aw = bw = cw = dw = ew = fw = gw = hw = iw = 0
        for qi, dci, ni, nyi in cell:
            qd, dcd = float(qi), float(dci)
            nd, nyd = float(ni), float(nyi)
            eta = b[0] + b[1] * qd + b[2] * dcd
            etac = max(min(eta, 13.0), -13.0)
            p = 1.0 / (1.0 + math.exp(-etac))
            pd = float(rnd(p * 1e6)) / 1e6
            w_w = rnd(pd * (1.0 - pd) * 1e6)
            u = nd * (float(w_w) / 1e6) * etac + (nyd - nd * pd)
            u_w = rnd(u * 1e6)
            nw = ni * w_w
            aw += nw
            bw += nw * qi
            cw += nw * dci
            dw += nw * qi * qi
            ew += nw * qi * dci
            fw += nw * dci * dci
            gw += u_w
            hw += u_w * qi
            iw += u_w * dci
        # Cramer on the 3x3 symmetric system — the SAME expression
        # tree as the oracle's SQL, evaluated on identical doubles.
        # The 0.001 diagonal ridge keeps the solve nonsingular when a
        # feature column is constant (a degenerate census — e.g. every
        # doc in one stopword bucket — would otherwise hit det = 0);
        # it is ~1e-9 of a typical diagonal entry, so coefficients on
        # healthy data are unchanged to float precision.
        # int -> float before the double Cramer solve (round-nearest,
        # exactly the oracle's split-converted HUGEINT -> DOUBLE and
        # the old float(Decimal) conversion)
        aw, bw, cw, dw, ew, fw, gw, hw, iw = (
            float(x) for x in (aw, bw, cw, dw, ew, fw, gw, hw, iw))
        a, bb, c = aw / 1e6 + 0.001, bw / 1e6, cw / 1e6
        dm, e, f = dw / 1e6 + 0.001, ew / 1e6, fw / 1e6 + 0.001
        g, h, i = gw / 1e6, hw / 1e6, iw / 1e6
        det = a * (dm * f - e * e) - bb * (bb * f - e * c) \
            + c * (bb * e - dm * c)
        b = ((g * (dm * f - e * e) - bb * (h * f - e * i)
              + c * (h * e - dm * i)) / det,
             (a * (h * f - e * i) - g * (bb * f - e * c)
              + c * (bb * i - h * c)) / det,
             (a * (dm * i - e * h) - bb * (bb * i - h * c)
              + g * (bb * e - dm * c)) / det)
    return b


def _logit_cell_sql(b0: str, b1: str, b2: str) -> str:
    """Per-cell pinned columns for one IRLS iteration, as SQL over
    `cells` cross-joined with the previous coefficient row — the exact
    mirror of the Spark expressions in logistic_irls_cells."""
    return f"""
      SELECT n, ny, q, dc, etac, pd,
             CAST(round(pd * (1.0 - pd) * 1000000) AS BIGINT) AS w_w
      FROM (
        SELECT n, ny, q, dc, etac,
               CAST(CAST(round(1.0 / (1.0 + exp(-etac)) * 1000000)
                         AS BIGINT) AS DOUBLE) / 1000000 AS pd
        FROM (
          SELECT n, ny, q, dc,
                 GREATEST(LEAST({b0} + {b1} * CAST(q AS DOUBLE)
                                + {b2} * CAST(dc AS DOUBLE), 13.0),
                          -13.0) AS etac
          FROM cells CROSS JOIN {b0.split('.')[0]}))"""


def _logit_iter_cte(k: int) -> str:
    cell = _logit_cell_sql(f"bb{k - 1}.b0", f"bb{k - 1}.b1",
                           f"bb{k - 1}.b2")
    return f"""
    it{k} AS (
      SELECT SUM(CAST(n AS HUGEINT) * w_w) AS aw,
             SUM(CAST(n AS HUGEINT) * w_w * q) AS bw,
             SUM(CAST(n AS HUGEINT) * w_w * dc) AS cw,
             SUM(CAST(n AS HUGEINT) * w_w * q * q) AS dw,
             SUM(CAST(n AS HUGEINT) * w_w * q * dc) AS ew,
             SUM(CAST(n AS HUGEINT) * w_w * dc * dc) AS fw,
             SUM(CAST(u_w AS HUGEINT)) AS gw,
             SUM(CAST(u_w AS HUGEINT) * q) AS hw,
             SUM(CAST(u_w AS HUGEINT) * dc) AS iw
      FROM (
        SELECT n, q, dc, w_w,
               CAST(round((CAST(n AS DOUBLE)
                           * (CAST(w_w AS DOUBLE) / 1000000) * etac
                           + (CAST(ny AS DOUBLE)
                              - CAST(n AS DOUBLE) * pd)) * 1000000)
                    AS BIGINT) AS u_w
        FROM ({cell}))),
    bb{k} AS (
      SELECT (g * (dm * f - e * e) - b * (h * f - e * i)
              + c * (h * e - dm * i)) / det AS b0,
             (a * (h * f - e * i) - g * (b * f - e * c)
              + c * (b * i - h * c)) / det AS b1,
             (a * (dm * i - e * h) - b * (b * i - h * c)
              + g * (b * e - dm * c)) / det AS b2
      FROM (
        SELECT a, b, c, dm, e, f, g, h, i,
               a * (dm * f - e * e) - b * (b * f - e * c)
                 + c * (b * e - dm * c) AS det
        FROM (
          -- split-converted (sql_big_to_double): equals Python's
          -- round-nearest float() past 2^53 where a bare HUGEINT
          -- cast truncates (r10 finding); exact below
          SELECT (CAST(((aw) - (aw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((aw) % 1073741824 AS DOUBLE)) / 1000000 + 0.001 AS a,
                 (CAST(((bw) - (bw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((bw) % 1073741824 AS DOUBLE)) / 1000000 AS b,
                 (CAST(((cw) - (cw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((cw) % 1073741824 AS DOUBLE)) / 1000000 AS c,
                 (CAST(((dw) - (dw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((dw) % 1073741824 AS DOUBLE)) / 1000000 + 0.001 AS dm,
                 (CAST(((ew) - (ew) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((ew) % 1073741824 AS DOUBLE)) / 1000000 AS e,
                 (CAST(((fw) - (fw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((fw) % 1073741824 AS DOUBLE)) / 1000000 + 0.001 AS f,
                 (CAST(((gw) - (gw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((gw) % 1073741824 AS DOUBLE)) / 1000000 AS g,
                 (CAST(((hw) - (hw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((hw) % 1073741824 AS DOUBLE)) / 1000000 AS h,
                 (CAST(((iw) - (iw) % 1073741824) // 1073741824 AS DOUBLE) * 1073741824.0 + CAST((iw) % 1073741824 AS DOUBLE)) / 1000000 AS i
          FROM it{k})))"""


def _logit_oracle() -> str:
    final_cell = _logit_cell_sql(f"bb{_LOGIT_ITERS}.b0",
                                 f"bb{_LOGIT_ITERS}.b1",
                                 f"bb{_LOGIT_ITERS}.b2")
    return ("""
    WITH cells AS (
      SELECT CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS dc,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ny
      FROM lineitem GROUP BY 1, 2),
    bb0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),"""
            + ",".join(_logit_iter_cte(k)
                       for k in range(1, _LOGIT_ITERS + 1))
            + f""",
    fin AS (
      SELECT n, ny, etac,
             CAST(round(ln(pd) * 1000000) AS BIGINT) AS lnp_w,
             CAST(round(ln(1.0 - pd) * 1000000) AS BIGINT) AS ln1p_w
      FROM ({final_cell})),
    agg AS (
      SELECT CAST(SUM(n) AS BIGINT) AS ntot,
             CAST(SUM(ny * lnp_w + (n - ny) * ln1p_w) AS BIGINT) AS llw,
             CAST(SUM(CASE WHEN etac >= 0.0 THEN ny ELSE n - ny END)
                  AS BIGINT) AS ncorrect
      FROM fin)
    SELECT ntot AS n, bb{_LOGIT_ITERS}.b0 AS coef_intercept,
           bb{_LOGIT_ITERS}.b1 AS coef_quantity,
           bb{_LOGIT_ITERS}.b2 * 100.0 AS coef_discount,
           -(CAST(llw AS DOUBLE) / 1000000) / CAST(ntot AS DOUBLE)
             AS avg_log_loss,
           CAST(ncorrect AS DOUBLE) / CAST(ntot AS DOUBLE) AS accuracy
    FROM agg CROSS JOIN bb{_LOGIT_ITERS}
    """)


@register(
    "feat_logistic_irls",
    oracle=_logit_oracle(),
    description="logistic regression (return-flag R ~ quantity + "
                "discount) by 4 fixed IRLS/Newton steps on the "
                "QUANTIZED cell census — the iterative GLM the "
                "closed-form ridge cannot express, still fully "
                "oracle-checked: the census (<= 51x11 integer cells) "
                "is the model's exact sufficient statistics, so every "
                "iteration touches only the bounded cell frame; the "
                "one libm call (exp) is pinned to the 1e-6 grid the "
                "instant it is produced and all nine normal-equation "
                "moments are exact integer sums of pinned values; the "
                "3x3 Cramer solve shares one expression tree between "
                "the driver (Python) and the oracle's unrolled CTEs "
                "(the PageRank pattern). Reports coefficients in "
                "original units + pinned-ln train log-loss + exact "
                "integer accuracy. Scale shape: ONE census scan, "
                "4 codebook-sized jobs, one final scoring fold — at "
                "100 TB the iteration cost is independent of row "
                "count (plans/feature_plans.logistic_irls_cells)",
    tags=("features", "stats", "ml", "iterative"),
)
def feat_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.select(
        F.round("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("dc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
        .groupBy("q", "dc")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("y").cast("long").alias("ny"))
        .localCheckpoint(eager=True))  # bounded census, 5 consumers
    b0, b1, b2 = logistic_irls_cells(cells, iters=_LOGIT_ITERS)
    qd, dcd = F.col("q").cast("double"), F.col("dc").cast("double")
    eta = F.lit(b0) + F.lit(b1) * qd + F.lit(b2) * dcd
    etac = F.greatest(F.least(eta, F.lit(13.0)), F.lit(-13.0))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-etac))
    pd = (F.round(p * _E6).cast("long").cast("double") / _E6)
    fin = cells.select(
        "n", "ny", etac.alias("etac"),
        F.round(F.ln(pd) * _E6).cast("long").alias("lnp_w"),
        F.round(F.ln(F.lit(1.0) - pd) * _E6).cast("long")
        .alias("ln1p_w"))
    agg = fin.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum(F.col("ny") * F.col("lnp_w")
              + (F.col("n") - F.col("ny")) * F.col("ln1p_w"))
        .cast("long").alias("llw"),
        F.sum(F.when(F.col("etac") >= 0.0, F.col("ny"))
              .otherwise(F.col("n") - F.col("ny")))
        .cast("long").alias("ncorrect"))
    return agg.select(
        F.col("ntot").alias("n"),
        F.lit(b0).alias("coef_intercept"),
        F.lit(b1).alias("coef_quantity"),
        (F.lit(b2) * 100.0).alias("coef_discount"),
        (-(F.col("llw").cast("double") / _E6)
         / F.col("ntot").cast("double")).alias("avg_log_loss"),
        (F.col("ncorrect").cast("double")
         / F.col("ntot").cast("double")).alias("accuracy"))


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_oracle() -> str:
    s = {c: f"s_{i}" for i, c in enumerate(_CORR_COLS)}
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i, c in enumerate(_CORR_COLS):
        moments.append(
            f"SUM(CAST(round({c} * 100) AS HUGEINT)) AS {s[c]}")
        moments.append(
            f"SUM(CAST(round({c} * 100) AS HUGEINT)"
            f" * CAST(round({c} * 100) AS HUGEINT)) AS {s[c]}{s[c]}")
    pairs = []
    for i, cx in enumerate(_CORR_COLS):
        for cy in _CORR_COLS[i + 1:]:
            moments.append(
                f"SUM(CAST(round({cx} * 100) AS HUGEINT)"
                f" * CAST(round({cy} * 100) AS HUGEINT))"
                f" AS {s[cx]}_{s[cy]}")
            pairs.append(
                f"('{cx}', '{cy}', n,"
                f" (CAST(n AS DOUBLE) * CAST({s[cx]}_{s[cy]} AS DOUBLE)"
                f"  - CAST({s[cx]} AS DOUBLE) * CAST({s[cy]} AS DOUBLE))"
                f" / (sqrt(CAST(n AS DOUBLE)"
                f"         * CAST({s[cx]}{s[cx]} AS DOUBLE)"
                f"         - CAST({s[cx]} AS DOUBLE)"
                f"           * CAST({s[cx]} AS DOUBLE))"
                f"    * sqrt(CAST(n AS DOUBLE)"
                f"           * CAST({s[cy]}{s[cy]} AS DOUBLE)"
                f"           - CAST({s[cy]} AS DOUBLE)"
                f"             * CAST({s[cy]} AS DOUBLE))))")
    return f"""
    WITH m AS (SELECT {", ".join(moments)} FROM lineitem)
    SELECT t.* FROM m, LATERAL (VALUES {", ".join(pairs)})
      t(col_x, col_y, n, pearson_r)
    ORDER BY col_x, col_y
    """


@register(
    "feat_correlation_matrix",
    oracle=_corr_matrix_oracle(),
    description="pairwise Pearson correlation matrix over the four "
                "lineitem numerics (quantity, extendedprice, "
                "discount, tax) in ONE pass: every moment (4 sums, 4 "
                "sums of squares, 6 cross products) is an exact "
                "128-bit/decimal integer sum of cent-scaled longs "
                "accumulated in a single aggregate — the feature-"
                "screening step before any model (which engineered "
                "features are redundant; expect quantity x price "
                "strongly positive, discount/tax near zero). The "
                "cent scaling cancels in r, so no float ever crosses "
                "an aggregation; the 6 r values are one shared "
                "double tree (sqrt IEEE-exact) off the one-row "
                "moment frame. Scale shape: ONE scan + map-side-"
                "combined global aggregate; the pair fan-out is a "
                "constant 6-row literal",
    tags=("feat", "stats", "scale"),
)
def feat_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    sc = {c: F.round(F.col(c) * 100).cast("long").cast(d38)
          for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(sc[c]).alias(f"s_{c}"))
        aggs.append(F.sum(sc[c] * sc[c]).alias(f"ss_{c}"))
    pair_names = []
    for i, cx in enumerate(_CORR_COLS):
        for cy in _CORR_COLS[i + 1:]:
            aggs.append(F.sum(sc[cx] * sc[cy]).alias(f"sp_{cx}_{cy}"))
            pair_names.append((cx, cy))
    m = li.agg(*aggs)
    dd = lambda c: F.col(c).cast("double")  # noqa: E731

    def r_expr(cx: str, cy: str):
        num = dd("n") * dd(f"sp_{cx}_{cy}") - dd(f"s_{cx}") * dd(f"s_{cy}")
        den = (F.sqrt(dd("n") * dd(f"ss_{cx}")
                      - dd(f"s_{cx}") * dd(f"s_{cx}"))
               * F.sqrt(dd("n") * dd(f"ss_{cy}")
                        - dd(f"s_{cy}") * dd(f"s_{cy}")))
        return num / den

    rows = F.explode(F.array(*[
        F.struct(F.lit(cx).alias("col_x"), F.lit(cy).alias("col_y"),
                 F.col("n").alias("n"),
                 r_expr(cx, cy).alias("pearson_r"))
        for cx, cy in pair_names])).alias("p")
    return (m.select(rows)
            .select("p.col_x", "p.col_y", "p.n", "p.pearson_r")
            .orderBy("col_x", "col_y"))


_MI_FEATS = """
      ('quantity',  CAST(l_quantity AS BIGINT)),
      ('price_k',   CAST(floor(l_extendedprice / 1000) AS BIGINT)),
      ('discount',  CAST(round(l_discount * 100) AS BIGINT)),
      ('tax',       CAST(round(l_tax * 100) AS BIGINT))"""


@register(
    "feat_mi_ranking",
    oracle=f"""
    WITH s AS (
      SELECT t.f AS feature, t.b AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem, LATERAL (VALUES {_MI_FEATS}) t(f, b)),
    obs AS (SELECT feature, bin, y, CAST(COUNT(*) AS BIGINT) AS o
            FROM s GROUP BY 1, 2, 3),
    r AS (SELECT feature, bin, CAST(SUM(o) AS BIGINT) AS r
          FROM obs GROUP BY 1, 2),
    c AS (SELECT feature, y, CAST(SUM(o) AS BIGINT) AS c
          FROM obs GROUP BY 1, 2),
    n AS (SELECT feature, CAST(SUM(o) AS BIGINT) AS n
          FROM obs GROUP BY 1),
    mi AS (SELECT obs.feature,
                  CAST(SUM(CAST(obs.o AS HUGEINT)
                       * CAST(round(ln((CAST(obs.o AS DOUBLE)
                                        * CAST(n.n AS DOUBLE))
                                       / (CAST(r.r AS DOUBLE)
                                          * CAST(c.c AS DOUBLE)))
                                    * 1000000) AS BIGINT))
                       AS BIGINT) AS miw
           FROM obs
           JOIN r USING (feature, bin)
           JOIN c ON c.feature = obs.feature AND c.y = obs.y
           JOIN n ON n.feature = obs.feature
           GROUP BY obs.feature),
    nb AS (SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_bins
           FROM r GROUP BY feature)
    SELECT mi.feature, nb.n_bins,
           CAST(mi.miw AS DOUBLE)
             / (SELECT CAST(n AS DOUBLE) FROM n
                WHERE n.feature = mi.feature) / 1000000.0 AS mi_nats
    FROM mi JOIN nb USING (feature)
    ORDER BY feature
    """,
    description="mutual-information feature ranking against the "
                "returned-item flag: for each of the four lineitem "
                "numerics (quantized to bounded bins — unit quantity, "
                "thousand-dollar price, percent discount/tax), "
                "I(feature; returnflag='R') in nats — the model-free "
                "feature-selection step that tells you which columns "
                "carry ANY signal about returns before fitting "
                "anything (correlation only sees linear signal; MI "
                "sees all of it). One unpivoted scan (LATERAL VALUES "
                "/ explode), contingency cells as exact BIGINTs, the "
                "pinned-ln weighted 128-bit fold of the MI idiom per "
                "feature. Scale shape: one scan, one (feature, bin, "
                "y) groupBy — bins are value-bounded, so all "
                "downstream frames are codebook class",
    tags=("feat", "stats", "ml"),
)
def feat_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    feats = F.array(
        F.struct(F.lit("quantity").alias("f"),
                 F.col("l_quantity").cast("long").alias("b")),
        F.struct(F.lit("price_k").alias("f"),
                 F.floor(F.col("l_extendedprice") / 1000).cast("long")
                 .alias("b")),
        F.struct(F.lit("discount").alias("f"),
                 F.round(F.col("l_discount") * 100).cast("long")
                 .alias("b")),
        F.struct(F.lit("tax").alias("f"),
                 F.round(F.col("l_tax") * 100).cast("long").alias("b")))
    s = li.select(
        F.explode(feats).alias("t"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y")
    ).select(F.col("t.f").alias("feature"), F.col("t.b").alias("bin"),
             "y")
    obs = (s.groupBy("feature", "bin", "y")
           .agg(F.count(F.lit(1)).cast("long").alias("o")))
    obs = obs.localCheckpoint(eager=True)  # feeds 4 marginal branches
    r = (obs.groupBy("feature", "bin")
         .agg(F.sum("o").cast("long").alias("r")))
    c = (obs.groupBy("feature", "y")
         .agg(F.sum("o").cast("long").alias("c")))
    n = obs.groupBy("feature").agg(F.sum("o").cast("long").alias("n"))
    d38 = "decimal(38,0)"
    dd = lambda col: F.col(col).cast("double")  # noqa: E731
    pin = F.round(F.ln((dd("o") * dd("n")) / (dd("r") * dd("c")))
                  * 1_000_000).cast("long")
    mi = (obs.join(r, ["feature", "bin"])
          .join(c, ["feature", "y"])
          .join(F.broadcast(n), "feature")
          .select("feature", (F.col("o").cast(d38) * pin).alias("t"))
          .groupBy("feature").agg(F.sum("t").cast("long").alias("miw")))
    nb = r.groupBy("feature").agg(F.count(F.lit(1)).cast("long")
                                  .alias("n_bins"))
    return (mi.join(nb, "feature").join(n, "feature")
            .select("feature", "n_bins",
                    (F.col("miw").cast("double") / dd("n") / 1e6)
                    .alias("mi_nats"))
            .orderBy("feature"))


_ISO_BINS = 10


@register(
    "feat_isotonic_calibration",
    oracle=f"""
    WITH mx AS (SELECT MAX(value) AS maxv FROM events),
    p AS (SELECT value / maxv AS prob,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS hit
          FROM events CROSS JOIN mx),
    b AS (SELECT LEAST(CAST(floor(prob * {_ISO_BINS}) AS INT),
                       {_ISO_BINS - 1}) AS bin,
                 hit
          FROM p),
    cells AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(hit) AS BIGINT) AS h
              FROM b GROUP BY bin),
    idx AS (SELECT bin, n, h,
                   CAST(row_number() OVER (ORDER BY bin) AS BIGINT)
                     AS r
            FROM cells),
    seg AS (SELECT i.r AS ri, j.r AS rj,
                   CAST(SUM(CAST(k.h AS HUGEINT)) AS DOUBLE)
                   / CAST(SUM(CAST(k.n AS HUGEINT)) AS DOUBLE) AS m
            FROM idx i JOIN idx j ON i.r <= j.r
            JOIN idx k ON k.r BETWEEN i.r AND j.r
            GROUP BY i.r, j.r),
    inner_min AS (SELECT t.r, seg.ri, MIN(seg.m) AS mn
                  FROM idx t
                  JOIN seg ON seg.ri <= t.r AND seg.rj >= t.r
                  GROUP BY t.r, seg.ri),
    iso AS (SELECT r, MAX(mn) AS iso_rate FROM inner_min GROUP BY r)
    SELECT idx.bin, idx.n,
           CAST(idx.h AS DOUBLE) / idx.n AS raw_rate,
           iso.iso_rate
    FROM idx JOIN iso USING (r)
    ORDER BY idx.bin
    """,
    description=f"isotonic calibration (weighted PAVA) of the "
                f"purchase rate over {_ISO_BINS} confidence bins: the "
                "monotone regression computed via the exact minimax "
                "identity iso_b = max_(i<=b) min_(j>=b) "
                "weightedMean(y_i..y_j) — the closed form whose "
                "segment means are single divisions of exact integer "
                "hit/count sums, so both engines compare and pick "
                "IDENTICAL doubles and the pooled fit is "
                "bit-deterministic with no sequential pooling loop. "
                "The calibration-curve repair step next to "
                "stats_reliability_bins' diagnostic: reliability "
                "tells you the classifier is miscalibrated, isotonic "
                "FIXES the mapping (the standard post-hoc calibrator "
                "for quality-filter scores). Scale shape: one "
                "data-sized bin census; the minimax runs on "
                "bins^3-bounded codebook frames (<= 1000 rows)",
    tags=("features", "ml", "quality"),
)
def feat_isotonic_calibration(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("maxv"))
    p = (ev.crossJoin(F.broadcast(mx))
         .select((F.col("value") / F.col("maxv")).alias("prob"),
                 F.when(F.col("event_type") == "purchase", 1)
                 .otherwise(0).alias("hit")))
    b = p.select(
        F.least(F.floor(F.col("prob") * _ISO_BINS).cast("int"),
                F.lit(_ISO_BINS - 1)).alias("bin"), "hit")
    cells = (b.groupBy("bin")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("hit").cast("long").alias("h")))
    from pyspark.sql import Window as W
    idx = cells.withColumn(
        "r", F.row_number().over(W.orderBy("bin")).cast("long"))
    i = idx.select(F.col("r").alias("ri"))
    j = idx.select(F.col("r").alias("rj"))
    k = idx.select(F.col("r").alias("rk"), "n", "h")
    d38 = "decimal(38,0)"
    seg = (i.join(j, F.col("ri") <= F.col("rj"))
           .join(k, (F.col("rk") >= F.col("ri"))
                 & (F.col("rk") <= F.col("rj")))
           .groupBy("ri", "rj")
           .agg((F.sum(F.col("h").cast(d38)).cast("double")
                 / F.sum(F.col("n").cast(d38)).cast("double"))
                .alias("m")))
    t = idx.select(F.col("r").alias("rt"))
    inner_min = (t.join(seg, (F.col("ri") <= F.col("rt"))
                        & (F.col("rj") >= F.col("rt")))
                 .groupBy("rt", "ri")
                 .agg(F.min("m").alias("mn")))
    iso = (inner_min.groupBy("rt")
           .agg(F.max("mn").alias("iso_rate"))
           .withColumnRenamed("rt", "r"))
    return (idx.join(iso, "r")
            .select("bin", "n",
                    (F.col("h").cast("double") / F.col("n"))
                    .alias("raw_rate"),
                    "iso_rate")
            .orderBy("bin"))


_OOF_FOLDS = 5


@register(
    "feat_target_encoding_oof",
    oracle=f"""
    WITH s AS (
      SELECT c.c_mktsegment AS seg,
             CAST(concat('0x', substr(md5(CAST(o.o_orderkey
                                               AS VARCHAR)), 1, 8))
                  AS BIGINT) % {_OOF_FOLDS} AS fold,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cw
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    pf AS (SELECT seg, fold, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(cw AS HUGEINT)) AS BIGINT) AS sw
           FROM s GROUP BY 1, 2),
    tot AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS tn,
                   CAST(SUM(sw) AS BIGINT) AS tsw
            FROM pf GROUP BY seg)
    SELECT pf.seg AS segment, pf.fold, pf.n AS n_rows,
           CAST(tot.tsw - pf.sw AS DOUBLE)
           / (tot.tn - pf.n) / 100.0 AS oof_encoding
    FROM pf JOIN tot USING (seg)
    ORDER BY segment, fold
    """,
    description=f"leakage-safe (out-of-fold) target encoding of "
                f"market segment by mean order value: rows are "
                f"assigned to {_OOF_FOLDS} deterministic folds by "
                "md5(orderkey) parity, and each (segment, fold) "
                "cell's encoding is the mean over the OTHER folds — "
                "(total - fold) sums of exact cents — so no row's "
                "target ever leaks into its own feature, the "
                "train-time discipline plain feat_target_encoding "
                "cannot provide (this is the encoding you'd actually "
                "ship to a model). Exact integer sums, one double "
                "division per cell. Scale shape: one grouped census "
                "over (segment, fold) — 25 cells at any data size",
    tags=("features", "ml", "sampling"),
)
def feat_target_encoding_oof(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (o.join(c, o.o_custkey == c.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 (F.conv(F.substring(F.md5(F.col("o_orderkey")
                                           .cast("string")), 1, 8),
                         16, 10).cast("long") % _OOF_FOLDS)
                 .alias("fold"),
                 F.round(F.col("o_totalprice") * 100).cast("long")
                 .alias("cw")))
    d38 = "decimal(38,0)"
    pf = (s.groupBy("seg", "fold")
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum(F.col("cw").cast(d38)).cast("long").alias("sw")))
    tot = (pf.groupBy("seg")
           .agg(F.sum("n").cast("long").alias("tn"),
                F.sum("sw").cast("long").alias("tsw")))
    return (pf.join(tot, "seg")
            .select(F.col("seg").alias("segment"), "fold",
                    F.col("n").alias("n_rows"),
                    ((F.col("tsw") - F.col("sw")).cast("double")
                     / (F.col("tn") - F.col("n")) / F.lit(100.0))
                    .alias("oof_encoding"))
            .orderBy("segment", "fold"))
