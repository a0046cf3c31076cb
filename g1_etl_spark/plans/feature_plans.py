"""Driver-facing feature-engineering queries with exact DuckDB oracles,
plus the k-means cluster-assignment query (iterative — rows-only check,
like the driver's other non-SQL-expressible entries)."""

from __future__ import annotations

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


@register(
    "sim_kmeans_clusters",
    oracle=None,  # iterative Lloyd refinement — no single SQL equivalent;
    # determinism + convergence asserted in tests/test_features.py
    description="k-means cluster assignment over embeddings: "
                "deterministic hash-seeded centroids, distributed Lloyd "
                "steps (Arrow matmul assign + per-component mean), "
                "cells sized by one groupBy "
                "(operators/similarity.py:train_ivf_centroids)",
    tags=("similarity", "clustering"),
)
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators.similarity import (_assign_cells,
                                                   train_ivf_centroids)

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_cells=8, iters=4)
    return (emb.select(
        "vec_id",
        _assign_cells(1, cents)(F.col("embedding"))[0].alias("cluster"))
        .groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"),
                                F.min("vec_id").alias("min_member")))
