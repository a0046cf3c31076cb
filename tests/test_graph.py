"""Weighted-PageRank operator tests (plan-level invariants; exact
values are guarded by the unrolled-CTE oracle in plans/graph_plans.py
and the sf0.001/0.01 parity gates)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pagerank_mass_and_floor(spark):
    from g1_etl_spark.plans.graph_plans import graph_pagerank_trade

    rows = graph_pagerank_trade(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 25
    n, d = 25, 0.85
    floor = (1 - d) / n
    for r in rows:
        assert r["rank"] >= floor - 1e-12
    # every nation trades, so no dangling mass: total stays ~1
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_pagerank_uniform_on_symmetric_graph(spark):
    from g1_etl_spark.operators.graph import pagerank

    # complete digraph with equal weights -> uniform stationary ranks
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame(
        [(i, j, 1.0) for i in range(4) for j in range(4) if i != j],
        "src long, dst long, weight double")
    out = {r["id"]: r["rank"]
           for r in pagerank(nodes, edges, iters=5).collect()}
    assert all(abs(v - 0.25) < 1e-9 for v in out.values())


def test_pagerank_star_graph_concentrates_rank(spark):
    """All edges into one hub: the hub's rank must dominate and equal
    (1-d)/n + d * (leaf mass), leaves sit at the floor."""
    from g1_etl_spark.operators.graph import pagerank

    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, 0, 1.0) for i in range(1, n)],
        "src long, dst long, weight double")
    out = {r["id"]: r["rank"]
           for r in pagerank(nodes, edges, iters=20).collect()}
    floor = 0.15 / n
    for i in range(1, n):
        assert abs(out[i] - floor) < 1e-9, "leaf above floor"
    assert abs(out[0] - (floor + 0.85 * (n - 1) * floor)) < 1e-9


def test_triangle_count_k4(spark):
    from g1_etl_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(4) if i < j],
        "src long, dst long")
    out = {r["id"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    # K4: 4 triangles, every node on 3 of them
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_canonicalizes_input(spark):
    """Reversed duplicates, parallel edges, and self-loops must not
    change the count — the operator dedupes to a simple undirected
    graph first."""
    from g1_etl_spark.operators.graph import triangle_count

    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 2)]
    out = {r["id"]: r["n_triangles"]
           for r in triangle_count(
               spark.createDataFrame(messy, "src long, dst long")).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_triangle_count_path_has_none(spark):
    from g1_etl_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                  "src long, dst long")
    assert triangle_count(edges).count() == 0
