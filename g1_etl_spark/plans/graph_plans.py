"""Driver-facing graph-analytics queries.

graph_pagerank_trade runs weighted PageRank on the nation-level trade
graph (edge cust_nation -> supp_nation weighted by exact trade revenue)
— an ITERATIVE algorithm that is still fully oracle-checked: the DuckDB
twin unrolls the same 10 iterations as chained CTEs generated from one
template, and every float that crosses an aggregation goes through the
scaled-long idiom, so the fixed point is bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators.folded import (bind, bounded_graph_row,
                                           in_adjacency, iterate)
from g1_etl_spark.operators.graph import (PR_SCALE, bfs_closure, pagerank,
                                          triangle_count,
                                          triangle_count_degree)
from g1_etl_spark.plans.registry import register
from g1_etl_spark.plans._util import bounded_collect

_ITERS = 10
_D = 0.85

_GRAPH_CTES = f"""
    nodes AS (SELECT n_name AS id FROM nation),
    cnt AS (SELECT COUNT(*) AS c FROM nodes),
    edges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2),
    e AS (
      SELECT src, dst, w / ow AS frac
      FROM edges JOIN (SELECT src, CAST(SUM(CAST(round(w * 1000000)
                                               AS BIGINT)) AS DOUBLE)
                                     / 1000000 AS ow
                       FROM edges GROUP BY src) o USING (src)),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / cnt.c AS rank
           FROM nodes CROSS JOIN cnt)
"""


def _iter_cte(k: int) -> str:
    return f"""
    r{k} AS (
      SELECT n.id,
             (1 - CAST({_D} AS DOUBLE)) / cnt.c
               + CAST({_D} AS DOUBLE) * COALESCE(s.v, 0.0) AS rank
      FROM nodes n CROSS JOIN cnt
      LEFT JOIN (
        SELECT e.dst AS id,
               CAST(SUM(CAST(round(r.rank * e.frac * {PR_SCALE})
                             AS BIGINT)) AS DOUBLE) / {PR_SCALE} AS v
        FROM r{k - 1} r JOIN e ON r.id = e.src
        GROUP BY e.dst) s ON s.id = n.id)
"""


_PAGERANK_SQL = ("WITH " + _GRAPH_CTES + ","
                 + ",".join(_iter_cte(k) for k in range(1, _ITERS + 1))
                 + f"""
    SELECT id AS nation, rank FROM r{_ITERS} ORDER BY nation
""")


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, weight): nation-level trade edges, cust_nation ->
    supp_nation, weighted by exact (scaled-long) trade revenue — the
    shared graph both the PageRank and triangle queries analyze, and
    the Spark twin of the oracle's edges CTE."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("_ck"),
                  F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("_sk"),
                  F.col("n_name").alias("dst"))
    cust_n = (c.join(F.broadcast(cn), c.c_nationkey == F.col("_ck"))
              .select("c_custkey", "src"))
    supp_n = (s.join(F.broadcast(sn), s.s_nationkey == F.col("_sk"))
              .select("s_suppkey", "dst"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o.select("o_orderkey", "o_custkey"),
                    li.l_orderkey == F.col("o_orderkey"))
            .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
            .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
            .groupBy("src", "dst")
            .agg((F.sum(F.round(rev * 1_000_000).cast("long"))
                  .cast("double") / 1_000_000).alias("weight")))


def _normalized_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, frac): trade edges with out-weight-normalized
    fractions; outw folds through scaled longs to mirror the oracle."""
    edges = _trade_edges(spark, sf_dir)
    outw = (edges.groupBy("src")
            .agg((F.sum(F.round(F.col("weight") * 1_000_000)
                        .cast("long")).cast("double") / 1_000_000)
                 .alias("_ow")))
    return edges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("_ow")).alias("frac"))


def _folded_pagerank(row: DataFrame, nn: int, iters: int = _ITERS,
                     damping: float = _D, teleport_id=None) -> DataFrame:
    """PageRank over a bounded_graph_row frame as ONE fold expression
    (operators/folded docstring): per-edge arithmetic is the exact
    expression tree of operators/graph.pagerank — round(rank*frac*1e12)
    summed as BIGINT, /1e12, damped — so the fixed point is
    bit-identical to both the distributed loop and the unrolled-CTE
    oracle. Returns (_id, rank) rows, one per alphabet id."""
    ids, ed = F.col("ids"), F.col("edges")

    if teleport_id is None:
        def seed(v):
            return F.lit(1.0 / nn)

        def base(v):
            return F.lit((1.0 - damping) / nn)
    else:
        def seed(v):
            return F.when(v == teleport_id,
                          F.lit(1.0)).otherwise(F.lit(0.0))

        def base(v):
            return F.when(v == teleport_id,
                          F.lit(1.0 - damping)).otherwise(F.lit(0.0))

    def build(inm):
        def contrib(m, v):
            return F.aggregate(
                F.element_at(inm, v), F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.round(F.element_at(m, g["src"]) * g["frac"]
                          * PR_SCALE).cast("long"))

        def step(m, _k):
            return F.map_from_arrays(ids, F.transform(ids, lambda v:
                base(v) + F.lit(damping)
                * (contrib(m, v).cast("double") / PR_SCALE)))

        m0 = F.map_from_arrays(ids, F.transform(ids, seed))
        return iterate(iters, m0, step)

    fin = bind(in_adjacency(ids, ed, "dst"), build)
    return row.select(F.explode(fin).alias("_id", "rank"))


@register(
    "graph_pagerank_trade",
    oracle=_PAGERANK_SQL,
    description="weighted PageRank (10 iterations, d=0.85) on the "
                "nation trade graph (cust_nation -> supp_nation, "
                "edges weighted by exact trade revenue) — iterative "
                "DataFrame loop with bounded-depth lineage truncation, "
                "oracle = the same iterations unrolled as chained CTEs; "
                "scaled-long sums make the fixed point engine-exact",
    tags=("graph", "iterative"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): the data-sized stage is
    # the edge census; the 10 nation-bounded iterations run as one
    # expression instead of 40+ tiny scheduled stages. The distributed
    # loop (operators/graph.pagerank, used by graph_pagerank_bucketed's
    # census twin before r11) remains the at-scale form for data-sized
    # vertex sets; values are bit-identical (same scaled-long tree).
    n = load_table(spark, sf_dir, "nation")
    e = _normalized_trade_edges(spark, sf_dir)
    nodes = n.select(F.col("n_name").alias("nation"))
    nn = nodes.count()  # graph metadata scalar, as before
    row = bounded_graph_row(nodes, "nation", e, ["src", "dst", "frac"])
    return (_folded_pagerank(row, nn)
            .select(F.col("_id").alias("nation"), "rank")
            .orderBy("nation"))


_EDGES_CTE = """
    edges AS (
      SELECT cn.n_name AS src, sn.n_name AS dst,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                 * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS w
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2)
"""

_TRIANGLE_SQL = f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b FROM top3),
    wedge AS (SELECT e1.a, e1.b, e2.b AS c
              FROM und e1 JOIN und e2 ON e1.b = e2.a),
    tri AS (SELECT w.a, w.b, w.c
            FROM wedge w JOIN und e3 ON w.a = e3.a AND w.c = e3.b),
    members AS (SELECT a AS id FROM tri UNION ALL
                SELECT b FROM tri UNION ALL
                SELECT c FROM tri)
    SELECT id AS nation, COUNT(*) AS n_triangles
    FROM members GROUP BY id ORDER BY nation
"""


def _sparsified_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3-partners-by-revenue sparsification of the trade graph —
    SHARED by the id-ordered and degree-ordered triangle twins, which
    hash against the same oracle and so must see the same edges."""
    edges = _trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w = W.partitionBy("src").orderBy(F.desc("weight"), "dst")
    return (edges.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 3).select("src", "dst"))


@register(
    "graph_triangle_trade",
    oracle=_TRIANGLE_SQL,
    description="per-nation triangle counts on the sparsified trade "
                "graph (each nation keeps its top-3 partners by exact "
                "revenue; direction dropped) — ordered two-join "
                "enumeration, each triangle produced exactly once; "
                "the window top-k sparsification is the skew guard "
                "that keeps hub fan-out bounded",
    tags=("graph",),
)
def graph_triangle_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (triangle_count(_sparsified_top3(spark, sf_dir))
            .select(F.col("id").alias("nation"), "n_triangles")
            .orderBy("nation"))


_REACH_HOPS = 4

_REACH_SQL = f"""
    WITH RECURSIVE {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    reach(src, dst, hops) AS (
      SELECT src, dst, 1 FROM top3
      UNION
      SELECT r.src, e.dst, r.hops + 1
      FROM reach r JOIN top3 e ON r.dst = e.src
      WHERE r.hops < {_REACH_HOPS})
    SELECT src, dst, MIN(hops) AS hops
    FROM reach GROUP BY src, dst ORDER BY src, dst
"""


@register(
    "graph_reachability_trade",
    oracle=_REACH_SQL,
    description="bounded-depth transitive closure (shortest hops <= 4) "
                "over the sparsified directed trade graph — the "
                "recursive-CTE query family as SEMI-NAIVE DataFrame "
                "iteration (operators/graph.bfs_closure): each round "
                "joins only the newly-discovered frontier against the "
                "edge list and anti-joins the known set, so work is "
                "proportional to new pairs, with per-round lineage "
                "truncation; oracle = DuckDB WITH RECURSIVE + MIN(hops) "
                "— a genuinely different evaluation strategy agreeing "
                "bit-for-bit (all-integer output)",
    tags=("graph", "iterative"),
)
def graph_reachability_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (bfs_closure(_sparsified_top3(spark, sf_dir),
                        max_hops=_REACH_HOPS)
            .orderBy("src", "dst"))


@register(
    "graph_triangle_degree",
    oracle=_TRIANGLE_SQL,
    description="per-nation triangle counts via DEGREE-ordered "
                "enumeration (operators/graph.triangle_count_degree): "
                "wedges pivot at each triangle's lowest-DEGREE-rank "
                "vertex, bounding hub fan-out by O(sqrt(m)) instead of "
                "C(deg, 2) — the at-scale form of the id-ordered "
                "graph_triangle_trade, whose enumeration is this "
                "query's oracle twin (triangle counts are orientation-"
                "invariant); same sparsified trade graph, same oracle",
    tags=("graph", "scale"),
)
def graph_triangle_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (triangle_count_degree(_sparsified_top3(spark, sf_dir))
            .select(F.col("id").alias("nation"), "n_triangles")
            .orderBy("nation"))


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
            FROM top3 GROUP BY 1, 2),
    dirp AS (SELECT a AS u, b AS v FROM und
             UNION ALL SELECT b AS u, a AS v FROM und),
    deg AS (SELECT u, COUNT(*) AS d FROM dirp GROUP BY u),
    p AS (SELECT d1.d AS dx, d2.d AS dy
          FROM dirp JOIN deg d1 ON dirp.u = d1.u
                    JOIN deg d2 ON dirp.v = d2.u),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(dx) AS BIGINT) AS sx,
                 CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                 CAST(SUM(dx * dy) AS BIGINT) AS sxy
          FROM p)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
           (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS assortativity
    FROM t
    """,
    description="degree assortativity of the undirected trade graph "
                "(Newman's r): Pearson correlation of endpoint degrees "
                "over the directed-both-ways edge list, so the x/y "
                "moment sums coincide (sy = sx, syy = sxx) and the "
                "whole statistic reduces to four BIGINT moments and "
                "one fixed double expression — no float accumulation "
                "anywhere. Answers 'do high-degree trade hubs link to "
                "other hubs or to the periphery?' — the graph-level "
                "complement of the per-node degree/triangle queries, "
                "computed on the SAME top-3-partners sparsified graph "
                "they analyze (the dense trade graph is near-complete, "
                "so raw degrees are constant and r is undefined). "
                "Scale shape: the edge census is the same "
                "aggregate-then-analyze pattern as PageRank (the "
                "sf-scaled joins reduce to a nation-bounded frame "
                "before any graph math)",
    tags=("graph", "stats"),
)
def graph_degree_assortativity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = _sparsified_top3(spark, sf_dir)
    und = (e.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
           .groupBy("a", "b").agg(F.count(F.lit(1)).alias("_c"))
           .select("a", "b"))
    dirp = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(und.select(F.col("b").alias("u"),
                                    F.col("a").alias("v"))))
    deg = dirp.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    p = (dirp
         .join(deg.select(F.col("u").alias("_u1"), F.col("d").alias("dx")),
               F.col("u") == F.col("_u1"))
         .join(deg.select(F.col("u").alias("_u2"), F.col("d").alias("dy")),
               F.col("v") == F.col("_u2")))
    t = p.agg(F.count(F.lit(1)).cast("long").alias("m"),
              F.sum("dx").cast("long").alias("sx"),
              F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
              F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (t.crossJoin(n_nodes).crossJoin(n_edges)
            .select("n_nodes", "n_edges",
                    ((d("m") * d("sxy") - d("sx") * d("sx"))
                     / (d("m") * d("sxx") - d("sx") * d("sx")))
                    .alias("assortativity")))


_KCORE_ITERS = 10

_KCORE_BASE = f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
            FROM top3 GROUP BY 1, 2),
    dirp AS (SELECT a AS u, b AS v FROM und
             UNION ALL SELECT b AS u, a AS v FROM und),
    c0 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS c FROM dirp GROUP BY u)
"""


def _kcore_iter_cte(k: int) -> str:
    # h-index step: h(v) = max over neighbors-ranked-desc of
    # min(rank, neighbor_core) — the classic O(1)-memory h-index form
    return f"""
    c{k} AS (
      SELECT u, CAST(MAX(LEAST(rn, nc)) AS BIGINT) AS c
      FROM (SELECT d.u, p.c AS nc,
                   ROW_NUMBER() OVER (PARTITION BY d.u
                                      ORDER BY p.c DESC, d.v) AS rn
            FROM dirp d JOIN c{k - 1} p ON d.v = p.u)
      GROUP BY u)
"""


_KCORE_SQL = (_KCORE_BASE + ","
              + ",".join(_kcore_iter_cte(k)
                         for k in range(1, _KCORE_ITERS + 1))
              + f"""
    SELECT c0.u AS nation, c0.c AS degree, c{_KCORE_ITERS}.c AS core
    FROM c0 JOIN c{_KCORE_ITERS} USING (u) ORDER BY nation
""")


def kcore_hindex_iteration(dirp: DataFrame, c: DataFrame) -> DataFrame:
    """One h-index refinement step, UN-checkpointed: joins each directed
    edge to its endpoint's current value and takes, per node, the
    largest h with >= h neighbors at >= h.

    DEGREE BOUND (load-bearing — see VERDICT r8 watch-item): the
    row_number window partitions by node, so the largest single window
    task holds exactly deg(v) rows. That is fine wherever max degree is
    bounded — the registered trade graph (25 nations, top-3-sparsified)
    and any similarity/kNN graph with a per-node cap — but on a
    power-law graph a 10^8-neighbor hub lands its whole adjacency in
    one task. Before reusing this iteration on user-keyed graphs,
    either cap degree upstream (the h-index of the top-h neighbors
    only needs the LARGEST values, so pre-truncating each adjacency to
    its current-c prefix is exact) or switch to semi-naive peeling.
    The skewed-star bound is pinned by
    tests/test_graph.py::test_kcore_hindex_skewed_star_hub, and the
    un-checkpointed plan shape (no cartesian / no single-partition
    exchange) by tests/test_plan_quality.py.
    """
    nb = dirp.join(c.select(F.col("u").alias("v"),
                            F.col("c").alias("nc")), "v")
    w = W.partitionBy("u").orderBy(F.desc("nc"), "v")
    return (nb.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("nc")))
                 .cast("long").alias("c")))



def _sparsified_dirp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v): both directions of the deduped undirected sparsified
    trade graph — the shared k-core / LPA edge frame."""
    e = _sparsified_top3(spark, sf_dir)
    und = (e.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
           .groupBy("a", "b").agg(F.count(F.lit(1)).alias("_c"))
           .select("a", "b"))
    return (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(und.select(F.col("b").alias("u"),
                                    F.col("a").alias("v")))
            # bounded (<= 2 * |nations|^2 rows); consumed THREE times by
            # the fold build (node ids, edge array, and the node-census
            # distinct) -- without this the data-sized sparsification
            # census runs once per consumer (no CSE across subtrees)
            .localCheckpoint(eager=True))


def _neighbor_map(ids, ed):
    """map: node -> array of neighbor ids over the folded (u, v)
    edge array (bind-hoist at the call site)."""
    return F.map_from_arrays(ids, F.transform(
        ids, lambda u: F.transform(
            F.filter(ed, lambda g: g["u"] == u), lambda g: g["v"])))


@register(
    "graph_kcore_trade",
    oracle=_KCORE_SQL,
    description="k-core decomposition (core number per nation) of the "
                "sparsified undirected trade graph via distributed "
                "h-index iteration (Montresor-De Pellegrini-Miorandi): "
                "start every node at its degree, then repeatedly set "
                "c(v) to the h-index of its neighbors' values — the "
                "largest h with >= h neighbors at >= h — which "
                "monotonically descends onto the exact core numbers "
                "without ever materializing the sequential "
                "peel-min-degree order, making the textbook "
                "sequential algorithm embarrassingly parallel (each "
                "iteration is one edge join + one per-node ranked "
                "window). BOTH engines run the identical fixed "
                f"{_KCORE_ITERS} iterations (oracle = chained CTEs "
                "from one template, the PageRank pattern), and "
                "convergence-within-budget plus agreement with a "
                "reference sequential peeling are unit-asserted in "
                "tests/test_graph.py. All-integer state end to end. "
                "Scale shape: census-then-analyze like the rest of "
                "the graph family; on a real billion-edge graph the "
                "per-iteration join keys on the high-cardinality "
                "node id and the window ranks each node's bounded "
                "neighbor list",
    tags=("graph", "iterative"),
)
def graph_kcore_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): the h-index refinement
    # max_h(>= h neighbors at >= h) depends only on the MULTISET of
    # neighbor values, so the sort-desc + least(rank, value) fold here
    # equals kcore_hindex_iteration's ranked-window form exactly
    # (all-integer state; that operator remains the at-scale form).
    dirp = _sparsified_dirp(spark, sf_dir)
    nodes = dirp.select("u").distinct()
    row = bounded_graph_row(nodes, "u", dirp, ["u", "v"])
    ids, ed = F.col("ids"), F.col("edges")

    def build(nbm):
        deg = F.map_from_arrays(ids, F.transform(
            ids, lambda u: F.size(F.element_at(nbm, u)).cast("long")))

        def step(m, _k):
            def h(u):
                ncs = F.transform(F.element_at(nbm, u),
                                  lambda v: F.element_at(m, v))
                return bind(
                    F.reverse(F.array_sort(ncs)),
                    lambda srt: F.array_max(F.transform(
                        srt, lambda x, i: F.least((i + 1).cast("long"),
                                                  x))).cast("long"))
            return F.map_from_arrays(ids, F.transform(ids, h))

        return bind(deg, lambda dm: F.struct(
            dm.alias("deg"),
            iterate(_KCORE_ITERS, dm, step).alias("core")))

    fin = bind(_neighbor_map(ids, ed), build)
    return (row.select(F.explode(fin["deg"]).alias("nation", "degree"),
                       fin["core"].alias("_c"))
            .select("nation", "degree",
                    F.element_at(F.col("_c"), F.col("nation"))
                    .alias("core"))
            .orderBy("nation"))


_SSSP_ITERS = 10
_SSSP_SRC = "FRANCE"
_SSSP_INF = 1_000_000_000_000_000  # >> any real path (<= 25 * 36e6)


def _sssp_iter_cte(k: int) -> str:
    return f"""
    d{k} AS (
      SELECT id, MIN(cand) AS d FROM (
        SELECT id, d AS cand FROM d{k - 1}
        UNION ALL
        SELECT ec.dst AS id, dd.d + ec.cw AS cand
        FROM ec JOIN d{k - 1} dd ON dd.id = ec.src
      ) GROUP BY id)"""


def minplus_sssp(nodes: DataFrame, ec: DataFrame, src_id,
                 iters: int = _SSSP_ITERS,
                 inf: int = _SSSP_INF) -> DataFrame:
    """Min-plus Bellman-Ford: `nodes` = (id), `ec` = (src, dst, cw)
    with non-negative INTEGER costs. Returns (id, d) after `iters`
    synchronous relaxation rounds from `src_id`; unreached nodes hold
    the `inf` sentinel (valid while iters * max_cost << inf). All
    state is BIGINT min-plus — no float anywhere — so the fold is
    order-insensitive and engine-exact by construction. Each round is
    one edge-keyed join + one min-combine per node, lineage truncated;
    the semi-naive SSSP shape that holds at any graph size."""
    d = nodes.select(
        "id", F.when(F.col("id") == src_id, F.lit(0))
        .otherwise(F.lit(inf)).cast("long").alias("d"))
    for _ in range(iters):
        relax = (ec.join(d.select(F.col("id").alias("src"),
                                  F.col("d").alias("ds")), "src")
                 .select(F.col("dst").alias("id"),
                         (F.col("ds") + F.col("cw")).alias("cand")))
        d = (d.select("id", F.col("d").alias("cand"))
             .unionByName(relax)
             .groupBy("id").agg(F.min("cand").cast("long").alias("d"))
             .localCheckpoint())  # truncate iterative lineage
    return d


_SSSP_SQL = ("WITH " + _GRAPH_CTES + f""",
    ec AS (SELECT src, dst,
                  CAST(-round(ln(frac) * 1000000) AS BIGINT) AS cw
           FROM e WHERE src <> dst),
    d0 AS (SELECT id, CASE WHEN id = '{_SSSP_SRC}'
                           THEN CAST(0 AS BIGINT)
                           ELSE CAST({_SSSP_INF} AS BIGINT) END AS d
           FROM nodes),"""
             + ",".join(_sssp_iter_cte(k)
                        for k in range(1, _SSSP_ITERS + 1))
             + f"""
    SELECT id AS nation, d AS cost_w,
           CASE WHEN d < {_SSSP_INF}
                THEN CAST(d AS DOUBLE) / 1000000 ELSE -1.0 END
             AS cost_nats,
           d < {_SSSP_INF} AS reached
    FROM d{_SSSP_ITERS} ORDER BY nation
""")


def _minplus_cost_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, cw): -round(ln(frac)*1e6) BIGINT min-plus costs over
    the normalized trade edges, self-loops dropped."""
    return (_normalized_trade_edges(spark, sf_dir)
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst",
                    (-F.round(F.ln(F.col("frac")) * 1_000_000))
                    .cast("long").alias("cw")))


def _folded_minplus_step(ids, inm):
    """One synchronous min-plus relaxation over the folded in-edge
    adjacency: new d(v) = min(d(v), min over in-edges of d(src) + cw)
    — the exact BIGINT fold of operators/graph.minplus_sssp,
    order-free."""
    def step(m, _k):
        return F.map_from_arrays(
            ids, F.transform(ids, lambda v: F.aggregate(
                F.element_at(inm, v), F.element_at(m, v),
                lambda acc, g: F.least(
                    acc, F.element_at(m, g["src"]) + g["cw"]))))
    return step


@register(
    "graph_sssp_trade",
    oracle=_SSSP_SQL,
    description=f"single-source shortest paths from {_SSSP_SRC} on the "
                "revenue-normalized trade graph under min-plus "
                "Bellman-Ford with INTEGER edge costs "
                "cw = -round(ln(out_fraction)*1e6) — so the shortest "
                "path IS the most-probable supply route (sum of "
                "-log flow fractions = -log path probability), the "
                "random-walk dual of PageRank on the same edges. "
                f"{_SSSP_ITERS} fixed relaxation rounds in BOTH "
                "engines (oracle = unrolled min-plus CTEs, the "
                "PageRank pattern); every distance is a BIGINT "
                "min-plus fold of pinned-ln costs, so the fixed point "
                "is exact integer arithmetic — no float sum ordering "
                "anywhere. Scale shape: the data-sized stage is the "
                "one edge census over lineitem (shared with "
                "pagerank); each relaxation joins the "
                "alphabet-bounded edge list to the 25-row frontier. "
                "On a billion-node graph the same loop is the "
                "standard semi-naive SSSP: edge-partitioned join + "
                "min-combine per node, lineage truncated per round",
    tags=("graph", "iterative"),
)
def graph_sssp_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded; graph_pagerank_trade
    # comment): all-BIGINT min-plus, bit-identical to minplus_sssp
    # (operators/graph), which remains the at-scale semi-naive form.
    n = load_table(spark, sf_dir, "nation")
    ec = _minplus_cost_edges(spark, sf_dir)
    nodes = n.select(F.col("n_name").alias("id"))
    row = bounded_graph_row(nodes, "id", ec, ["src", "dst", "cw"])
    ids, ed = F.col("ids"), F.col("edges")
    m0 = F.map_from_arrays(ids, F.transform(ids, lambda v: F.when(
        v == _SSSP_SRC, F.lit(0)).otherwise(F.lit(_SSSP_INF))
        .cast("long")))
    fin = bind(in_adjacency(ids, ed, "dst"), lambda inm:
               iterate(_SSSP_ITERS, m0, _folded_minplus_step(ids, inm)))
    return (row.select(F.explode(fin).alias("nation", "_d"))
            .select(
                "nation", F.col("_d").alias("cost_w"),
                F.when(F.col("_d") < _SSSP_INF,
                       F.col("_d").cast("double") / 1_000_000)
                .otherwise(F.lit(-1.0)).alias("cost_nats"),
                (F.col("_d") < _SSSP_INF).alias("reached"))
            .orderBy("nation"))


_LPA_ITERS = 10


def _lpa_iter_cte(k: int) -> str:
    # synchronous mode update: new label = most frequent neighbor
    # label, ties to the lexicographically smallest label
    return f"""
    l{k} AS (
      SELECT u, label FROM (
        SELECT u, label,
               ROW_NUMBER() OVER (PARTITION BY u
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM (SELECT d.u, p.label, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM dirp d JOIN l{k - 1} p ON d.v = p.u
              GROUP BY d.u, p.label))
      WHERE rn = 1)
"""


_LPA_SQL = (_KCORE_BASE + f""",
    l0 AS (SELECT u, u AS label FROM c0),"""
            + ",".join(_lpa_iter_cte(k)
                       for k in range(1, _LPA_ITERS + 1))
            + f"""
    , sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS community_size
             FROM l{_LPA_ITERS} GROUP BY label)
    SELECT l.u AS nation, l.label AS community, sz.community_size
    FROM l{_LPA_ITERS} l JOIN sz USING (label) ORDER BY nation
""")


def lpa_iteration(dirp: DataFrame, lab: DataFrame) -> DataFrame:
    """One synchronous label-propagation step, UN-checkpointed: each
    node adopts its neighbors' MODE label (count desc, ties to the
    lexicographically smallest label — both exact, so the step is
    engine-deterministic even where async LPA would be order-
    dependent). The argmax is a partial+final MIN over a
    (-count, label) struct — no ranked window over raw edges, so the
    per-task bound is even tighter than k-core's degree bound (counts
    group on (node, label) first)."""
    cnt = (dirp.join(lab.select(F.col("u").alias("v"), "label"), "v")
           .groupBy("u", "label")
           .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    best = (cnt.groupBy("u")
            .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                F.col("label").alias("label")))
                 .alias("b")))
    return best.select("u", F.col("b.label").alias("label"))


@register(
    "graph_label_propagation",
    oracle=_LPA_SQL,
    description="community detection by synchronous label propagation "
                "(Raghavan et al.) on the top-3-sparsified undirected "
                f"trade graph: {_LPA_ITERS} fixed mode-update rounds "
                "from singleton labels, each node adopting its "
                "neighbors' most frequent label with ties to the "
                "smallest — the missing third member of the graph "
                "family (components = connectivity, k-core = density, "
                "LPA = mesoscale structure). Counts are exact BIGINTs "
                "and the tie-break is total, so the normally "
                "order-sensitive LPA heuristic is bit-deterministic "
                "here, and the oracle unrolls the same rounds as "
                "chained CTEs (the PageRank pattern). Scale shape: "
                "census-then-analyze; each round is one edge join + "
                "one (node,label) count + one struct-MIN argmax — "
                "never a ranked window over raw edges, so the "
                "per-task bound is distinct neighbor labels per node "
                "(plans/graph_plans.lpa_iteration)",
    tags=("graph", "iterative", "clustering"),
)
def graph_label_propagation(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): the synchronous mode
    # update argmin over (-count, label) structs is order-free (counts
    # are exact, tie-break total), so the fold equals lpa_iteration's
    # struct-MIN form exactly; that operator remains the at-scale form.
    dirp = _sparsified_dirp(spark, sf_dir)
    nodes = dirp.select("u").distinct()
    row = bounded_graph_row(nodes, "u", dirp, ["u", "v"])
    ids, ed = F.col("ids"), F.col("edges")

    def build(nbm):
        def step(m, _k):
            def best(u):
                return bind(
                    F.transform(F.element_at(nbm, u),
                                lambda v: F.element_at(m, v)),
                    lambda nls: F.array_min(F.transform(
                        F.array_distinct(nls),
                        lambda c: F.struct(
                            (-F.size(F.filter(nls, lambda x: x == c)))
                            .alias("nc"),
                            c.alias("label"))))["label"])
            return F.map_from_arrays(ids, F.transform(ids, best))

        lab0 = F.map_from_arrays(ids, ids)
        return iterate(_LPA_ITERS, lab0, step)

    out = bind(bind(_neighbor_map(ids, ed), build), lambda lm: bind(
        F.transform(ids, lambda u: F.element_at(lm, u)),
        lambda larr: F.transform(ids, lambda u: F.struct(
            u.alias("nation"),
            F.element_at(lm, u).alias("community"),
            F.size(F.filter(larr,
                            lambda x: x == F.element_at(lm, u)))
            .cast("long").alias("community_size")))))
    return (row.select(F.explode(out).alias("r"))
            .select(F.col("r.nation").alias("nation"),
                    F.col("r.community").alias("community"),
                    F.col("r.community_size").alias("community_size"))
            .orderBy("nation"))


_APSP_ITERS = 10


def _apsp_iter_cte(k: int) -> str:
    return f"""
    ap{k} AS (
      SELECT s, id, MIN(cand) AS d FROM (
        SELECT s, id, d AS cand FROM ap{k - 1}
        UNION ALL
        SELECT dd.s, ec.dst AS id, dd.d + ec.cw AS cand
        FROM ec JOIN ap{k - 1} dd ON dd.id = ec.src
      ) GROUP BY s, id)"""


_CLOSENESS_SQL = ("WITH " + _GRAPH_CTES + f""",
    ec AS (SELECT src, dst,
                  CAST(-round(ln(frac) * 1000000) AS BIGINT) AS cw
           FROM e WHERE src <> dst),
    ap0 AS (SELECT a.id AS s, b.id AS id,
                   CASE WHEN a.id = b.id THEN CAST(0 AS BIGINT)
                        ELSE CAST({_SSSP_INF} AS BIGINT) END AS d
            FROM nodes a CROSS JOIN nodes b),"""
                  + ",".join(_apsp_iter_cte(k)
                             for k in range(1, _APSP_ITERS + 1))
                  + f"""
    SELECT s AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(d) AS BIGINT) AS total_cost_w,
           CAST(MAX(d) AS BIGINT) AS eccentricity_w,
           CAST(COUNT(*) AS DOUBLE)
             / (CAST(SUM(d) AS DOUBLE) / 1000000.0) AS closeness
    FROM ap{_APSP_ITERS}
    WHERE s <> id AND d < {_SSSP_INF}
    GROUP BY s ORDER BY nation
""")


@register(
    "graph_closeness_trade",
    oracle=_CLOSENESS_SQL,
    description="closeness centrality (and eccentricity) of every "
                "nation via ALL-pairs min-plus shortest paths on the "
                "-log-flow trade graph — which nation can reach the "
                "whole trade network through the most probable "
                "routes? The APSP is graph_sssp_trade's loop with a "
                "source dimension: the frontier is the (source, node) "
                "frame, every relaxation is one edge join + one "
                "integer min-combine keyed by (s, id), all BIGINT "
                "min-plus end to end; closeness = n_reached / "
                "total_path_nats is one division of exact integers. "
                f"{_APSP_ITERS} fixed rounds, oracle = the same "
                "rounds unrolled (the PageRank pattern). Scale shape: "
                "the nodes x nodes seed is 625 constant rows (the "
                "one-row-build-side BNLJ class); on a graph where "
                "n_nodes is data-sized, APSP is the wrong ask — use "
                "per-source SSSP on the landmark subset instead, "
                "which this same loop serves by seeding fewer "
                "sources",
    tags=("graph", "iterative"),
)
def graph_closeness_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): per-source min-plus
    # APSP as one expression — each source's fold is the exact BIGINT
    # relaxation of graph_sssp_trade; the per-source summary (count /
    # sum / max over reached longs) is order-free. Sources with no
    # reached partner emit no row, as in the grouped form.
    n = load_table(spark, sf_dir, "nation")
    ec = _minplus_cost_edges(spark, sf_dir)
    nodes = n.select(F.col("n_name").alias("id"))
    row = bounded_graph_row(nodes, "id", ec, ["src", "dst", "cw"])
    ids, ed = F.col("ids"), F.col("edges")

    def per_source(inm):
        def one(s):
            m0 = F.map_from_arrays(ids, F.transform(
                ids, lambda v: F.when(v == s, F.lit(0))
                .otherwise(F.lit(_SSSP_INF)).cast("long")))
            return bind(
                iterate(_APSP_ITERS, m0,
                        _folded_minplus_step(ids, inm)),
                lambda dm: bind(
                    F.filter(F.transform(ids, lambda v: F.struct(
                        v.alias("v"),
                        F.element_at(dm, v).alias("d"))),
                        lambda p: (p["v"] != s) & (p["d"] < _SSSP_INF)),
                    lambda reached: F.struct(
                        s.alias("nation"),
                        F.size(reached).cast("long").alias("n_reached"),
                        F.aggregate(reached, F.lit(0).cast("long"),
                                    lambda acc, p: acc + p["d"])
                        .cast("long").alias("total_cost_w"),
                        F.array_max(F.transform(reached,
                                                lambda p: p["d"]))
                        .cast("long").alias("eccentricity_w"))))
        return F.transform(ids, one)

    out = bind(in_adjacency(ids, ed, "dst"),
               lambda inm: F.filter(per_source(inm),
                                    lambda r: r["n_reached"] > 0))
    return (row.select(F.explode(out).alias("r"))
            .select(F.col("r.nation").alias("nation"),
                    F.col("r.n_reached").alias("n_reached"),
                    F.col("r.total_cost_w").alias("total_cost_w"),
                    F.col("r.eccentricity_w").alias("eccentricity_w"),
                    (F.col("r.n_reached").cast("double")
                     / (F.col("r.total_cost_w").cast("double")
                        / F.lit(1000000.0))).alias("closeness"))
            .orderBy("nation"))


_HITS_ITERS = 10


def _hits_iter_cte(k: int) -> str:
    # authority pass then hub pass, each sum-normalized: the raw
    # scores are exact BIGINT sums of pinned products, and the
    # normalizer is the exact BIGINT total, so every score is ONE
    # division of two bigints — no float accumulation anywhere
    return f"""
    aw{k} AS MATERIALIZED (SELECT e.dst AS id,
                     CAST(SUM(CAST(round(h.h * e.frac * {PR_SCALE})
                                   AS BIGINT)) AS BIGINT) AS w
              FROM h{k - 1} h JOIN em e ON h.id = e.src
              GROUP BY e.dst),
    at{k} AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM aw{k}),
    a{k} AS MATERIALIZED (SELECT n.id,
                    COALESCE(CAST(aw{k}.w AS DOUBLE)
                             / CAST(at{k}.t AS DOUBLE), 0.0) AS a
             FROM nodes n
             LEFT JOIN aw{k} ON aw{k}.id = n.id CROSS JOIN at{k}),
    hw{k} AS MATERIALIZED (SELECT e.src AS id,
                     CAST(SUM(CAST(round(a.a * e.frac * {PR_SCALE})
                                   AS BIGINT)) AS BIGINT) AS w
              FROM a{k} a JOIN em e ON a.id = e.dst GROUP BY e.src),
    ht{k} AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM hw{k}),
    h{k} AS MATERIALIZED (SELECT n.id,
                    COALESCE(CAST(hw{k}.w AS DOUBLE)
                             / CAST(ht{k}.t AS DOUBLE), 0.0) AS h
             FROM nodes n
             LEFT JOIN hw{k} ON hw{k}.id = n.id CROSS JOIN ht{k})"""


_HITS_SQL = ("WITH " + _GRAPH_CTES + """,
    em AS MATERIALIZED (SELECT src, dst, frac FROM e),
    h0 AS (SELECT id, CAST(1.0 AS DOUBLE) / cnt.c AS h
           FROM nodes CROSS JOIN cnt),"""
             + ",".join(_hits_iter_cte(k)
                        for k in range(1, _HITS_ITERS + 1))
             + f"""
    SELECT h{_HITS_ITERS}.id AS nation, h{_HITS_ITERS}.h AS hub,
           a{_HITS_ITERS}.a AS authority
    FROM h{_HITS_ITERS} JOIN a{_HITS_ITERS} USING (id)
    ORDER BY nation
""")


@register(
    "graph_hits_trade",
    oracle=_HITS_SQL,
    description="HITS hubs and authorities (Kleinberg) on the "
                "flow-normalized trade graph: a good HUB is a "
                "customer nation whose spend flows to authoritative "
                "suppliers, a good AUTHORITY a supplier nation fed by "
                "strong hubs — the directed dual PageRank's single "
                "score conflates. 10 fixed mutual-reinforcement "
                "rounds, each pass SUM-normalized (not L2) so every "
                "score is one division of two exact BIGINTs: raw "
                "scores are integer sums of pinned score*fraction "
                "products (the PageRank scaled-long idiom) and the "
                "normalizer is their exact total — no float "
                "accumulation order anywhere, oracle = unrolled "
                "CTEs. Scale shape: identical to PageRank (one edge "
                "census; per-round joins touch the bounded edge "
                "list), lineage truncated EVERY round — the one-row "
                "sum-normalizer broadcast is a materialization "
                "barrier that would otherwise re-execute all prior "
                "rounds (measured 210s vs 9s at sf0.1)",
    tags=("graph", "iterative"),
)
def graph_hits_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): before r11 every pass
    # broadcast a one-row sum-normalizer, which forced an eager
    # localCheckpoint per pass (20 materialization barriers; without
    # them the k-th pass re-executed all k-1 prior passes — measured
    # 210 s vs 9 s at sf0.1). The fold keeps the normalizer INSIDE the
    # one expression (an integer array sum), so there is no broadcast
    # subplan and no barrier at all; per-pass arithmetic is the exact
    # round(score*frac*1e12)-sum-BIGINT tree of the old _pass, and the
    # sum normalizer divides the same two exact BIGINTs.
    n = load_table(spark, sf_dir, "nation")
    e = _normalized_trade_edges(spark, sf_dir)
    nodes = n.select(F.col("n_name").alias("id"))
    nn = nodes.count()  # graph metadata scalar, the pagerank pattern
    row = bounded_graph_row(nodes, "id", e, ["src", "dst", "frac"])
    ids, ed = F.col("ids"), F.col("edges")

    def _pass(adj, m, in_key: str):
        # raw weight per node: sum of round(score*frac*1e12) over the
        # node's own adjacency list (adj keyed by the OUT endpoint);
        # then each score is one division of two exact BIGINTs
        # (w / total). warr and tot are bind()-hoisted so they
        # evaluate once per pass.
        def w(v):
            return F.aggregate(
                F.element_at(adj, v), F.lit(0).cast("long"),
                lambda acc, g: acc
                + F.round(F.element_at(m, g[in_key]) * g["frac"]
                          * PR_SCALE).cast("long"))
        return bind(F.transform(ids, w), lambda warr: bind(
            F.aggregate(warr, F.lit(0).cast("long"),
                        lambda acc, x: acc + x),
            lambda tot: F.map_from_arrays(ids, F.transform(
                warr, lambda x: F.coalesce(
                    x.cast("double") / tot.cast("double"),
                    F.lit(0.0))))))

    def build(by_dst, by_src):
        # named_struct, not struct(x.alias(...)): alias is dropped on
        # expressions built inside a lambda body (fields come out as
        # col1/col2), and the fold accesses acc["h"] next round
        def step(acc, _k):
            return bind(_pass(by_dst, acc["h"], "src"),
                        lambda a: F.named_struct(
                            F.lit("h"), _pass(by_src, a, "dst"),
                            F.lit("a"), a))
        h0 = F.map_from_arrays(
            ids, F.transform(ids, lambda v: F.lit(1.0 / nn)))
        return iterate(_HITS_ITERS,
                       F.named_struct(F.lit("h"), h0,
                                      F.lit("a"), h0), step)

    fin = bind(in_adjacency(ids, ed, "dst"), lambda by_dst:
               bind(in_adjacency(ids, ed, "src"), lambda by_src:
                    build(by_dst, by_src)))
    return (row.select(F.posexplode(ids).alias("_p", "nation"),
                       fin.alias("_f"))
            .select("nation",
                    F.element_at(F.col("_f")["h"], F.col("nation"))
                    .alias("hub"),
                    F.element_at(F.col("_f")["a"], F.col("nation"))
                    .alias("authority"))
            .orderBy("nation"))


_LINKPRED_SQL = f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b FROM top3),
    nbr AS (SELECT a AS x, b AS z FROM und
            UNION ALL SELECT b AS x, a AS z FROM und),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM nbr GROUP BY x),
    wedge AS (
      SELECT n1.z AS a, n2.z AS b, n1.x AS c
      FROM nbr n1 JOIN nbr n2 ON n1.x = n2.x AND n1.z < n2.z),
    cand AS (
      SELECT w.a, w.b, w.c FROM wedge w
      LEFT JOIN und u ON u.a = w.a AND u.b = w.b
      WHERE u.a IS NULL),
    sc AS (SELECT c.a, c.b,
                  CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                  CAST(SUM(CAST(round(1000000.0 / ln(CAST(dz.d AS
                      DOUBLE))) AS BIGINT)) AS BIGINT) AS aa_w
           FROM cand c JOIN deg dz ON dz.x = c.c
           GROUP BY c.a, c.b)
    SELECT sc.a, sc.b, sc.common_neighbors,
           CAST(sc.common_neighbors AS DOUBLE)
           / (da.d + db.d - sc.common_neighbors) AS jaccard,
           CAST(sc.aa_w AS DOUBLE) / 1000000.0 AS adamic_adar
    FROM sc JOIN deg da ON da.x = sc.a JOIN deg db ON db.x = sc.b
    ORDER BY sc.a, sc.b
"""


@register(
    "graph_link_prediction",
    oracle=_LINKPRED_SQL,
    description="link prediction over the sparsified trade graph: for "
                "every NON-adjacent nation pair with at least one "
                "common trading partner, the three classic scores — "
                "common-neighbor count, neighborhood Jaccard, and "
                "Adamic-Adar (sum of 1/ln(deg) over shared partners, "
                "down-weighting promiscuous hubs) — 'which trade "
                "links are likely to appear next', the graph-ML "
                "feature stage next to the descriptive centralities. "
                "Wedge enumeration through the shared-partner key "
                "(one equi-join, each wedge once via z-ordering), "
                "existing edges removed by anti-join; the only libm "
                "call (ln of an integer degree >= 2 — a common "
                "neighbor is adjacent to both endpoints) is pinned to "
                "the 1e-6 grid per term and summed exactly. Scale "
                "shape: the top-3 sparsification bounds per-node "
                "fan-out, so wedges are O(nodes * 9); everything "
                "upstream is the shared certified edge census",
    tags=("graph", "ml"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (_sparsified_top3(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct().localCheckpoint(eager=True))  # feeds 3 branches
    nbr = und.select(F.col("a").alias("x"), F.col("b").alias("z")) \
        .unionAll(und.select(F.col("b").alias("x"),
                             F.col("a").alias("z")))
    deg = nbr.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    n1, n2 = nbr.alias("n1"), nbr.alias("n2")
    wedge = (n1.join(n2, (F.col("n1.x") == F.col("n2.x"))
                     & (F.col("n1.z") < F.col("n2.z")))
             .select(F.col("n1.z").alias("a"), F.col("n2.z").alias("b"),
                     F.col("n1.x").alias("c")))
    cand = wedge.join(und, ["a", "b"], "left_anti")
    aa_term = F.round(F.lit(1_000_000.0)
                      / F.ln(F.col("d").cast("double"))).cast("long")
    sc = (cand.join(deg.withColumnRenamed("x", "c"), "c")
          .groupBy("a", "b")
          .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"),
               F.sum(aa_term).cast("long").alias("aa_w")))
    da = deg.select(F.col("x").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("x").alias("b"), F.col("d").alias("db"))
    return (sc.join(da, "a").join(db, "b")
            .select("a", "b", "common_neighbors",
                    (F.col("common_neighbors").cast("double")
                     / (F.col("da") + F.col("db")
                        - F.col("common_neighbors"))).alias("jaccard"),
                    (F.col("aa_w").cast("double") / 1e6)
                    .alias("adamic_adar"))
            .orderBy("a", "b"))


_MST_SQL = f"""
    WITH RECURSIVE {_EDGES_CTE},
    undw AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                    CAST(SUM(CAST(round(w * 1000000) AS BIGINT))
                         AS DOUBLE) / 1000000.0 AS w
             FROM edges WHERE src <> dst GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT x FROM (SELECT a AS x FROM undw
                                      UNION SELECT b FROM undw)),
    elist AS (SELECT list(struct_pack(a := a, b := b, w := w)
                          ORDER BY w, a, b) AS es FROM undw),
    labels0 AS (SELECT list(struct_pack(n := x, l := x) ORDER BY x)
                  AS ls FROM nodes),
    k(i, ls, kept) AS (
      SELECT 0, (SELECT ls FROM labels0),
             CAST([] AS STRUCT(a VARCHAR, b VARCHAR, w DOUBLE)[])
      UNION ALL
      SELECT k.i + 1,
             CASE WHEN t.la <> t.lb
                  THEN list_transform(k.ls, s -> struct_pack(n := s.n,
                       l := CASE WHEN s.l = t.la OR s.l = t.lb
                                 THEN LEAST(t.la, t.lb) ELSE s.l END))
                  ELSE k.ls END,
             CASE WHEN t.la <> t.lb THEN list_append(k.kept, t.e)
                  ELSE k.kept END
      FROM k CROSS JOIN elist,
           LATERAL (SELECT elist.es[k.i + 1] AS e,
                           list_filter(k.ls,
                             s -> s.n = elist.es[k.i + 1].a)[1].l AS la,
                           list_filter(k.ls,
                             s -> s.n = elist.es[k.i + 1].b)[1].l AS lb)
             t
      WHERE k.i < len(elist.es))
    SELECT u.e.a AS a, u.e.b AS b, u.e.w AS w
    FROM (SELECT unnest(kept) AS e FROM k CROSS JOIN elist
          WHERE k.i = len(elist.es)) u
    ORDER BY a, b
"""


@register(
    "graph_mst_boruvka",
    oracle=_MST_SQL,
    description="minimum spanning forest of the undirected trade "
                "graph (edge weight = exact bidirectional revenue): "
                "the cheapest backbone that still connects every "
                "trading nation — the infrastructure-planning staple "
                "next to the centralities. Spark side runs BORUVKA: "
                "the data-sized edge census folds to the bounded "
                "undirected label graph (<= |nations|^2/2 rows — "
                "codebook class, guarded by bounded_collect; an "
                "unbounded graph would swap in the star-contraction "
                "operator), then every round each component picks its "
                "minimum outgoing edge under the strict total order "
                "(w, a, b) and the union-find merges, all driver-side "
                "over the bounded census, halving components per "
                "round. Oracle runs "
                "KRUSKAL as a recursive CTE folding the (w, a, b)-"
                "sorted edge list over a label list. Under a strict "
                "total order the MSF is UNIQUE, so two genuinely "
                "different algorithms must agree bit-for-bit — the "
                "strongest oracle form in the graph family. Scale "
                "shape: the only data-sized stage is the shared edge "
                "census; rounds are O(log n) with bounded frames",
    tags=("graph", "iterative"),
)
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (_trade_edges(spark, sf_dir)
             .filter(F.col("src") != F.col("dst")))
    undw = (edges.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.round(F.col("weight") * 1_000_000).cast("long").alias("ww"))
        .groupBy("a", "b")
        .agg((F.sum("ww").cast("double") / 1e6).alias("w")))
    # Driver-side rounds are legal ONLY because the vertex alphabet is
    # the 25-nation label set, so the undirected census is bounded by
    # alphabet^2/2 <= 300 rows; bounded_collect raises rather than
    # silently materializing an unbounded edge set (VERDICT r10 #5).
    # r11: the census is collected ONCE and the Boruvka rounds run on
    # the driver over the bounded edge list — before, every round paid
    # a createDataFrame + two broadcast joins + an eager checkpoint +
    # a collect (2-3 Spark jobs x ~4 rounds; isolated A/B 4.39 s ->
    # ~1.4 s at sf0.1). The kept SET is round-order-invariant: under
    # the strict total order (w, a, b) the per-component minimum
    # outgoing edges never form a cycle, so the same unique MSF falls
    # out (and the oracle's Kruskal remains a genuinely different
    # algorithm agreeing bit-for-bit).
    edge_rows = bounded_collect(undw, "graph_mst_boruvka edge census",
                                limit=2048)
    # Python float/str tuple comparison == Spark (double, string,
    # string) struct order on this census: finite doubles, ASCII names
    ew = sorted((r["w"], r["a"], r["b"]) for r in edge_rows)
    parent: dict = {}
    for _, a, b in ew:
        parent[a] = a
        parent[b] = b

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kept: list = []
    for _ in range(20):
        # every cross edge is offered to BOTH its components; per
        # component keep the minimum under the strict (w, a, b) order
        best: dict = {}
        for w, a, b in ew:
            ca, cb = find(a), find(b)
            if ca == cb:
                continue
            for c in (ca, cb):
                if c not in best or (w, a, b) < best[c]:
                    best[c] = (w, a, b)
        if not best:
            break
        for w, a, b in sorted(set(best.values())):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                kept.append((a, b, w))
    else:
        raise RuntimeError("boruvka did not converge in 20 rounds")
    return (spark.createDataFrame(kept, "a string, b string, w double")
            .orderBy("a", "b"))


_BC_L = 12  # unrolled BFS depth; >= any plausible diameter of the
#             sparsified 25-node graph — empty deeper levels are
#             no-ops in BOTH engines, so parity is depth-independent


def _betweenness_oracle() -> str:
    # forward: BFS levels + path counts sigma, one materialized CTE
    # pair per level (each is referenced by the next level AND the
    # backward pass — without AS MATERIALIZED the reference fan-out
    # re-expands 2^k, the graph_hits_trade lesson)
    fw = []
    for k in range(1, _BC_L + 1):
        fw.append(f"""
    new{k} AS MATERIALIZED (
      SELECT DISTINCT p.s, nb.z AS v
      FROM vis{k - 1} p JOIN nbr nb ON nb.x = p.v
      WHERE p.lev = {k - 1}
        AND NOT EXISTS (SELECT 1 FROM vis{k - 1} q
                        WHERE q.s = p.s AND q.v = nb.z)),
    sign{k} AS MATERIALIZED (
      SELECT n.s, n.v, CAST(SUM(sg.sig) AS BIGINT) AS sig
      FROM new{k} n
      JOIN nbr nb ON nb.z = n.v
      JOIN vis{k - 1} vv ON vv.s = n.s AND vv.v = nb.x
                        AND vv.lev = {k - 1}
      JOIN sig{k - 1} sg ON sg.s = n.s AND sg.v = nb.x
      GROUP BY n.s, n.v),
    vis{k} AS MATERIALIZED (
      SELECT * FROM vis{k - 1}
      UNION ALL SELECT s, v, {k} AS lev FROM new{k}),
    sig{k} AS MATERIALIZED (
      SELECT * FROM sig{k - 1}
      UNION ALL SELECT s, v, sig FROM sign{k})""")
    # backward: pinned dependency accumulation, deepest level first
    bw = [f"""
    del{_BC_L} AS MATERIALIZED (
      SELECT s, v, CAST(0 AS BIGINT) AS dw
      FROM vis{_BC_L} WHERE lev = {_BC_L})"""]
    for k in range(_BC_L - 1, 0, -1):
        bw.append(f"""
    del{k} AS MATERIALIZED (
      SELECT lv.s, lv.v,
             CAST(COALESCE((
               SELECT SUM(CAST(round(CAST(sv.sig AS DOUBLE)
                          / CAST(sw.sig AS DOUBLE)
                          * (1000000.0 + dl.dw)) AS BIGINT))
               FROM nbr nb
               JOIN vis{_BC_L} wv ON wv.s = lv.s AND wv.v = nb.z
                                 AND wv.lev = {k + 1}
               JOIN sig{_BC_L} sw ON sw.s = lv.s AND sw.v = nb.z
               JOIN del{k + 1} dl ON dl.s = lv.s AND dl.v = nb.z
               WHERE nb.x = lv.v), 0) AS BIGINT) AS dw
      FROM vis{_BC_L} lv
      JOIN sig{_BC_L} sv ON sv.s = lv.s AND sv.v = lv.v
      WHERE lv.lev = {k})""")
    alld = " UNION ALL ".join(f"SELECT v, dw FROM del{k}"
                              for k in range(1, _BC_L + 1))
    return (f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b FROM top3),
    nbr AS (SELECT a AS x, b AS z FROM und
            UNION ALL SELECT b AS x, a AS z FROM und),
    nds AS (SELECT DISTINCT x FROM nbr),
    vis0 AS (SELECT x AS s, x AS v, 0 AS lev FROM nds),
    sig0 AS (SELECT x AS s, x AS v, CAST(1 AS BIGINT) AS sig
             FROM nds),"""
            + ",".join(fw) + "," + ",".join(bw) + f""",
    alld AS ({alld})
    SELECT v AS nation,
           CAST(SUM(dw) AS DOUBLE) / 1000000.0 / 2.0 AS betweenness
    FROM alld GROUP BY v ORDER BY nation
    """)


@register(
    "graph_betweenness_trade",
    oracle=_betweenness_oracle(),
    description="Brandes betweenness centrality on the sparsified "
                "trade graph — WHICH nations broker the trade routes "
                "(highest fraction of shortest paths passing through "
                "them), the brokerage complement that closes the "
                "centrality family (degree/PageRank/closeness/HITS/"
                "k-core measure importance, betweenness measures "
                "chokepoints). Forward: per-source BFS levels + exact "
                "BIGINT shortest-path counts sigma. Backward: the "
                "dependency recursion delta(v) = sum sigma_v/sigma_w "
                "* (1 + delta(w)) over successors, with EVERY "
                "fractional term pinned to the 1e-6 grid before "
                "summation (integer adds in any order) and the "
                "division a shared double tree — so the normally "
                "float-fragile accumulation is engine-exact. Fixed "
                f"{_BC_L}-level unroll (>= diameter; empty levels "
                "no-op identically in both engines); oracle = the "
                "same rounds as materialized CTEs (the HITS 2^k "
                "lesson). Scale shape: the only data-sized stage is "
                "the shared edge census; all (s,v) frames are "
                "nations^2-bounded with per-round lineage truncation",
    tags=("graph", "iterative"),
)
def graph_betweenness_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded): before r11 the 12
    # forward + 11 backward Brandes rounds ran as ~35 eager
    # localCheckpoint barriers over (s, v) frames bounded by
    # |nations|^2. The fold runs every per-source BFS + dependency
    # pass inside one expression; sigma sums are BIGINT and every
    # dependency term is pinned to the 1e-6 grid before an integer
    # sum (identical expression tree), so results are bit-identical
    # to the unrolled-CTE oracle. Every node of the sparsified graph
    # appears in some source's level>=1 visit set (each has >= 1
    # neighbor), so emitting all ids matches the union-of-dels rows.
    und = (_sparsified_top3(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct())
    nbr = (und.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionAll(und.select(F.col("b").alias("u"),
                                F.col("a").alias("v")))
           # bounded; feeds nds + the one-row ids/edges folds (see
           # _sparsified_dirp comment)
           .localCheckpoint(eager=True))
    nds = nbr.select("u").distinct()
    row = bounded_graph_row(nds, "u", nbr, ["u", "v"])
    ids, ed = F.col("ids"), F.col("edges")
    zero = F.lit(0).cast("long")

    def build(nbm):
        def fwd_step(st, k):
            # unvisited v joins level k with sigma = sum of its
            # level-(k-1) predecessors' sigmas (exact BIGINT)
            def cand(v):
                return F.aggregate(
                    F.element_at(nbm, v), zero,
                    lambda acc, z: acc + F.coalesce(
                        F.when(F.try_element_at(st, z)["lev"] == k - 1,
                               F.try_element_at(st, z)["sig"]),
                        zero))
            adds = F.filter(
                F.transform(ids, lambda v: F.struct(
                    v.alias("v"), cand(v).alias("sig"))),
                lambda x: (~F.map_contains_key(st, x["v"]))
                & (x["sig"] > 0))
            return F.map_concat(st, F.map_from_entries(F.transform(
                adds, lambda x: F.struct(
                    x["v"].alias("key"),
                    F.struct(k.alias("lev"),
                             x["sig"].alias("sig")).alias("value")))))

        def bwd(st):
            vks = F.map_keys(st)

            def bwd_step(dm, j):
                k = F.lit(_BC_L) - j

                def nd(v):
                    terms = F.aggregate(
                        F.element_at(nbm, v), zero,
                        lambda acc, z: acc + F.coalesce(
                            F.when(
                                F.try_element_at(st, z)["lev"] == k + 1,
                                F.round(
                                    F.element_at(st, v)["sig"]
                                    .cast("double")
                                    / F.try_element_at(st, z)["sig"]
                                    .cast("double")
                                    * (F.lit(1000000.0)
                                       + F.element_at(dm, z)))
                                .cast("long")),
                            zero))
                    return F.when(F.element_at(st, v)["lev"] == k,
                                  terms).otherwise(F.element_at(dm, v))
                return F.map_from_arrays(vks, F.transform(vks, nd))

            d0 = F.map_from_arrays(vks, F.transform(vks, lambda v: zero))
            return iterate(_BC_L - 1, d0, bwd_step)

        def per_source(s):
            st0 = F.create_map(
                s, F.struct(F.lit(0).alias("lev"),
                            F.lit(1).cast("long").alias("sig")))
            return bind(iterate(_BC_L, st0, fwd_step), bwd)

        return F.transform(ids, per_source)

    all_dm = bind(_neighbor_map(ids, ed), build)
    total = lambda v: F.aggregate(  # noqa: E731
        all_dm, zero,
        lambda acc, m: acc + F.coalesce(F.try_element_at(m, v), zero))
    out = bind(all_dm, lambda _a: F.transform(ids, lambda v: F.struct(
        v.alias("nation"),
        (total(v).cast("double") / 1e6 / 2.0).alias("betweenness"))))
    return (row.select(F.explode(out).alias("r"))
            .select(F.col("r.nation").alias("nation"),
                    F.col("r.betweenness").alias("betweenness"))
            .orderBy("nation"))


_CLUSTCOEF_SQL = f"""
    WITH {_EDGES_CTE},
    top3 AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM edges WHERE src <> dst) WHERE rn <= 3),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a,
                   GREATEST(src, dst) AS b FROM top3),
    nbr AS (SELECT a AS x, b AS z FROM und
            UNION ALL SELECT b AS x, a AS z FROM und),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM nbr GROUP BY x),
    wedge AS (SELECT n1.x AS c, n1.z AS a, n2.z AS b
              FROM nbr n1 JOIN nbr n2
                ON n1.x = n2.x AND n1.z < n2.z),
    closed AS (SELECT w.c, CAST(COUNT(*) AS BIGINT) AS t
               FROM wedge w JOIN und u ON u.a = w.a AND u.b = w.b
               GROUP BY w.c)
    SELECT deg.x AS nation, deg.d AS degree,
           CAST(COALESCE(closed.t, 0) AS BIGINT) AS triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * CAST(COALESCE(closed.t, 0) AS DOUBLE)
                     / (CAST(deg.d AS DOUBLE) * (deg.d - 1))
                ELSE 0.0 END AS clustering_coef
    FROM deg LEFT JOIN closed ON closed.c = deg.x
    ORDER BY nation
"""


@register(
    "graph_clustering_coef",
    oracle=_CLUSTCOEF_SQL,
    description="local clustering coefficient per nation on the "
                "sparsified trade graph: closed wedges through each "
                "node over its possible wedges d(d-1)/2 — do my "
                "trading partners trade WITH EACH OTHER (cliquish "
                "regional blocs vs hub-and-spoke brokerage), the "
                "local-structure complement of the global triangle "
                "count and the direct input to small-world "
                "diagnostics. Wedge enumeration through the center "
                "key with z-ordering (each wedge once), closure "
                "checked by one equi-join against the undirected "
                "edge set — exact integers, one final double ratio. "
                "Scale shape: the top-3 sparsification bounds "
                "per-node wedge fan-out at 9; everything upstream is "
                "the shared certified edge census",
    tags=("graph",),
)
def graph_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (_sparsified_top3(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .distinct().localCheckpoint(eager=True))  # feeds 3 branches
    nbr = und.select(F.col("a").alias("x"), F.col("b").alias("z")) \
        .unionAll(und.select(F.col("b").alias("x"),
                             F.col("a").alias("z")))
    deg = nbr.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    n1, n2 = nbr.alias("n1"), nbr.alias("n2")
    wedge = (n1.join(n2, (F.col("n1.x") == F.col("n2.x"))
                     & (F.col("n1.z") < F.col("n2.z")))
             .select(F.col("n1.x").alias("c"), F.col("n1.z").alias("a"),
                     F.col("n2.z").alias("b")))
    closed = (wedge.join(und, ["a", "b"])
              .groupBy("c").agg(F.count(F.lit(1)).cast("long")
                                .alias("t")))
    cc = (F.when(F.col("d") >= 2,
                 F.lit(2.0) * F.coalesce("t", F.lit(0)).cast("double")
                 / (F.col("d").cast("double") * (F.col("d") - 1)))
          .otherwise(F.lit(0.0)))
    return (deg.join(closed, deg.x == closed.c, "left")
            .select(F.col("x").alias("nation"),
                    F.col("d").alias("degree"),
                    F.coalesce("t", F.lit(0)).cast("long")
                    .alias("triangles"),
                    cc.alias("clustering_coef"))
            .orderBy("nation"))


# Teleport source: the lexicographically smallest nation name — a
# dataset-agnostic deterministic pick (the testdata uses synthetic
# NATION_* labels, so no hard-coded TPC-H name can be assumed).
def _ppr_iter_cte(k: int) -> str:
    return f"""
    pr{k} AS (
      SELECT n.id,
             CASE WHEN n.id = srcn.m
                  THEN 1 - CAST({_D} AS DOUBLE) ELSE 0.0 END
               + CAST({_D} AS DOUBLE) * COALESCE(s.v, 0.0) AS rank
      FROM nodes n CROSS JOIN srcn
      LEFT JOIN (
        SELECT e.dst AS id,
               CAST(SUM(CAST(round(r.rank * e.frac * {PR_SCALE})
                             AS BIGINT)) AS DOUBLE) / {PR_SCALE} AS v
        FROM pr{k - 1} r JOIN e ON r.id = e.src
        GROUP BY e.dst) s ON s.id = n.id)
"""


_PPR_SQL = ("WITH " + _GRAPH_CTES.replace(
    "r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / cnt.c AS rank\n"
    "           FROM nodes CROSS JOIN cnt)",
    "srcn AS (SELECT min(id) AS m FROM nodes),\n"
    "    pr0 AS (SELECT id, CASE WHEN id = (SELECT m FROM srcn) "
    "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank\n"
    "           FROM nodes)") + ","
    + ",".join(_ppr_iter_cte(k) for k in range(1, _ITERS + 1))
    + f"""
    SELECT id AS nation, rank AS ppr FROM pr{_ITERS} ORDER BY nation
""")


@register(
    "graph_ppr_trade",
    oracle=_PPR_SQL,
    description=f"personalized PageRank (random walk with restart, "
                f"{_ITERS} iterations, d={_D}) from the smallest "
                "nation label (deterministic, dataset-agnostic) on "
                "the weighted nation trade graph: the teleport vector "
                "concentrates on ONE source, so the fixed point ranks "
                "every nation by its trade PROXIMITY to the source "
                "rather than its global importance — the "
                "recommendation / similar-entity primitive next to "
                "global PageRank (and the graph-side analogue of the "
                "embedding ANN queries: 'what is near X, by random "
                "walk'). Reuses the certified pagerank operator with "
                "a teleport_id; the oracle unrolls the same "
                "iterations with the source-concentrated restart "
                "term, every per-iteration sum pinned through "
                "scaled longs, so the fixed point is bit-identical. "
                "Scale shape: identical to graph_pagerank_trade — "
                "the one data-sized stage is the shared edge census; "
                "iterations are |nations|-bounded joins",
    tags=("graph", "iterative"),
)
def graph_ppr_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-alphabet fold (operators/folded; graph_pagerank_trade
    # comment) — same restart arithmetic as the distributed loop.
    n = load_table(spark, sf_dir, "nation")
    e = _normalized_trade_edges(spark, sf_dir)
    nodes = n.select(F.col("n_name").alias("nation"))
    nn = nodes.count()  # metadata scalar (unused seed denom; kept API)
    # graph METADATA collect (one 25-row min), like pagerank's count()
    src_name = nodes.agg(F.min("nation")).collect()[0][0]
    row = bounded_graph_row(nodes, "nation", e, ["src", "dst", "frac"])
    return (_folded_pagerank(row, nn, teleport_id=src_name)
            .select(F.col("_id").alias("nation"),
                    F.col("rank").alias("ppr"))
            .orderBy("nation"))
