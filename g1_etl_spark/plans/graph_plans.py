"""Driver-facing graph-analytics queries.

graph_pagerank_trade runs weighted PageRank on the nation-level trade
graph (edge cust_nation -> supp_nation weighted by exact trade revenue)
— an ITERATIVE algorithm that is still fully oracle-checked: the DuckDB
twin unrolls the same 10 iterations as chained CTEs generated from one
template, and every float that crosses an aggregation goes through the
scaled-long idiom, so the fixed point is bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.operators.graph import PR_SCALE, pagerank
from g1_etl_spark.plans.registry import register

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


@register(
    "graph_pagerank_trade",
    oracle=_PAGERANK_SQL,
    description="weighted PageRank (10 iterations, d=0.85) on the "
                "nation trade graph (cust_nation -> supp_nation, "
                "edges weighted by exact trade revenue) — iterative "
                "DataFrame loop with per-iteration lineage truncation, "
                "oracle = the same iterations unrolled as chained CTEs; "
                "scaled-long sums make the fixed point engine-exact",
    tags=("graph", "iterative"),
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("_ck"),
                  F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("_sk"),
                  F.col("n_name").alias("dst"))
    # same exact-revenue edge weights as the oracle (scaled-long sums)
    cust_n = (c.join(F.broadcast(cn), c.c_nationkey == F.col("_ck"))
              .select("c_custkey", "src"))
    supp_n = (s.join(F.broadcast(sn), s.s_nationkey == F.col("_sk"))
              .select("s_suppkey", "dst"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    edges = (li.join(o.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == F.col("o_orderkey"))
             .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
             .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
             .groupBy("src", "dst")
             .agg((F.sum(F.round(rev * 1_000_000).cast("long"))
                   .cast("double") / 1_000_000).alias("weight")))
    # outw must also fold through scaled longs to mirror the oracle
    outw = (edges.groupBy("src")
            .agg((F.sum(F.round(F.col("weight") * 1_000_000)
                        .cast("long")).cast("double") / 1_000_000)
                 .alias("_ow")))
    e = edges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("_ow")).alias("weight"))
    nodes = n.select(F.col("n_name").alias("nation"))
    pr = pagerank(nodes, e, iters=_ITERS, damping=_D, id_col="nation",
                  src_col="src", dst_col="dst", weight_col="weight",
                  normalized=True)
    return pr.orderBy("nation")
