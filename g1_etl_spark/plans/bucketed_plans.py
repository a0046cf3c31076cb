"""Bucketed co-located twins of the two heaviest shuffle plans.

`q21_late_supplier_blame` and `orders_basket_pairs` are the most
shuffle-heavy plans in the suite (r4 probe: 3.1x/3.2x at 10x data —
sub-linear, but every stage re-hashes lineitem on l_orderkey). Both key
EVERY heavy join/distinct on the order key, which is exactly the shape
bucketing amortizes: pay the orderkey shuffle ONCE when the layout is
materialized (sources/maintenance.ensure_bucketed_table), then the
distinct, the self-join, and the semi/anti joins all read co-located
buckets with NO Exchange.

The layout write is a MAINTENANCE operation, not part of the query: at
100 TB the bucketed fact is the standing table layout, written once and
served to every orderkey-keyed query. `ensure_bucketed_table` is
idempotent — the first caller in a session pays the write, every later
run (including bench repetitions) measures what the twin exists to
prove: exchange-free consumption. Both facts of the Q21 shape (lineitem
AND orders) are bucketed on their order key, so the lateness join is a
co-located sort-merge join too — no broadcast of a fact table, which
would not survive 100 TB (orders is ~1/4 of lineitem, not a dim).

Results are driver-checked against the same oracles as the shuffle
forms and the Exchange count is plan-asserted (tests/test_scaling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.plans._util import dsum, sql_dsum
from g1_etl_spark.plans.graph_plans import _D, _ITERS, _PAGERANK_SQL
from g1_etl_spark.plans.registry import register
from g1_etl_spark.sources.maintenance import ensure_bucketed_table

_BUCKETS = 32


# Oracle: identical to q21_late_supplier_blame — the twin must produce
# byte-identical results; only the physical layout differs.
@register(
    "q21_blame_bucketed",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY),
    blamed AS (
      SELECT t.l_orderkey, t.l_suppkey
      FROM late t
      WHERE EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = t.l_orderkey
                      AND l2.l_suppkey <> t.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM late l3
                        WHERE l3.l_orderkey = t.l_orderkey
                          AND l3.l_suppkey <> t.l_suppkey))
    SELECT s.s_name, COUNT(*) AS numwait
    FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    description="TPC-H Q21 shape on BUCKETED lineitem AND orders "
                "layouts: the orderkey shuffle is paid once at layout-"
                "maintenance time; the lateness join, the late-distinct, "
                "the other-supplier semi-join and the sole-late anti-"
                "join all consume co-located buckets exchange-free "
                "(plan-asserted) — the table-layout answer to the "
                "suite's heaviest shuffle plan",
    tags=("join", "agg", "scale"),
)
def q21_blame_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = ensure_bucketed_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_shipdate"], "l_orderkey",
        buckets=_BUCKETS)
    # orders is a FACT (~1/4 of lineitem rows): broadcasting it would
    # OOM at the scale this plan targets, so it is bucketed on its own
    # order key — equal bucket counts make the lateness join a
    # co-located SMJ with no exchange on either side
    o = (ensure_bucketed_table(
            spark, sf_dir, "orders",
            ["o_orderkey", "o_orderdate", "o_orderstatus"], "o_orderkey",
            buckets=_BUCKETS)
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    late = (li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate") > F.date_add("o_orderdate", 90))
            .select("l_orderkey", "l_suppkey").distinct())
    other = li.select(F.col("l_orderkey").alias("o_k"),
                      F.col("l_suppkey").alias("o_s")).distinct()
    has_other = late.join(
        other.hint("merge"), (late.l_orderkey == other.o_k)
        & (late.l_suppkey != other.o_s), "left_semi")
    late2 = late.select(F.col("l_orderkey").alias("t_k"),
                        F.col("l_suppkey").alias("t_s"))
    blamed = has_other.join(
        late2.hint("merge"), (has_other.l_orderkey == late2.t_k)
        & (has_other.l_suppkey != late2.t_s), "left_anti")
    s = load_table(spark, sf_dir, "supplier")
    # supplier grows with sf — no hint; AQE broadcasts while it fits
    return (blamed.join(s, blamed.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20))


@register(
    "basket_pairs_bucketed",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT p1, p2, support FROM pairs
    ORDER BY support DESC, p1, p2
    LIMIT 50
    """,
    description="market-basket pair mining on a BUCKETED lineitem "
                "layout (pre-written maintenance table): the items-"
                "distinct and the per-order self-join both consume "
                "co-located buckets exchange-free; the ONLY remaining "
                "shuffle is the (p1,p2) support count (plan-asserted "
                "single Exchange)",
    tags=("join", "agg", "topk", "scale"),
)
def basket_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = ensure_bucketed_table(
        spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"],
        "l_orderkey", buckets=_BUCKETS)
    items = li.distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (a.join(b.hint("merge"),
                   (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .groupBy(F.col("a.l_partkey").alias("p1"),
                     F.col("b.l_partkey").alias("p2"))
            .agg(F.count(F.lit(1)).alias("support"))
            .orderBy(F.desc("support"), "p1", "p2")
            .limit(50))


def _pagerank_bucketed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge census of the nation trade graph on BUCKETED lineitem and
    orders layouts — the registered answer to the 1000x probe's named
    cause for graph_pagerank_trade (PROBE_r06_1000x.json: 112x of the
    304 s is the lineitem JOIN orders shuffle; the 10 rank iterations
    touch only the 25-node graph).

    One at-scale move vs graph_plans._trade_edges: the fact-fact
    orderkey join reads co-located, bucket-SORTED layouts — no
    exchange AND no sort on either side (write_bucketed's
    one-file-per-bucket layout + the bucketed-scan ordering conf in
    session.py). Everything downstream is kept IDENTICAL to the
    shuffle form: nation maps broadcast onto customer/supplier, plain
    keyed joins (customer/supplier are facts at target scale, never
    broadcast), and one (src, dst) fold whose map-side partials
    reduce to at most 25x25 rows per task.

    Measured dead end, kept as a warning: a first cut pre-aggregated
    revenue by (custkey, suppkey) before the nation maps "to shrink
    the join inputs" — but in TPC-H shape that key is nearly unique
    per lineitem row (~1.1 rows/pair), so the "shrink" was a full
    extra 60M-row exchange for nothing and the twin LOST to the
    shuffle form at 100x (14.1 s vs 11.1 s). Pre-aggregation below a
    join only pays when the group key is genuinely coarser than the
    row grain. Kept as a separate frame so the plan lint and the
    exchange asserts see the census, not the post-checkpoint
    iteration tail."""
    li = ensure_bucketed_table(
        spark, sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        "l_orderkey", buckets=_BUCKETS)
    o = ensure_bucketed_table(
        spark, sf_dir, "orders", ["o_orderkey", "o_custkey"],
        "o_orderkey", buckets=_BUCKETS)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = n.select(F.col("n_nationkey").alias("_ck"),
                  F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("_sk"),
                  F.col("n_name").alias("dst"))
    cust_n = (c.join(F.broadcast(cn), c.c_nationkey == F.col("_ck"))
              .select("c_custkey", "src"))
    supp_n = (s.join(F.broadcast(sn), s.s_nationkey == F.col("_sk"))
              .select("s_suppkey", "dst"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
            .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
            .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
            .groupBy("src", "dst")
            .agg((F.sum(F.round(rev * 1_000_000).cast("long"))
                  .cast("double") / 1_000_000).alias("weight")))


@register(
    "graph_pagerank_bucketed",
    # oracle: identical to graph_pagerank_trade — only the census
    # layout and fold order differ, both value-invariant
    oracle=_PAGERANK_SQL,
    description="weighted PageRank on the nation trade graph with the "
                "edge census on BUCKETED lineitem/orders layouts: the "
                "fact-fact orderkey join is a co-located sort-merge "
                "join over bucket-sorted one-file-per-bucket layouts "
                "(no exchange AND no sort on the bucketed key, "
                "plan-asserted) — the table-layout answer to the "
                "1000x probe's finding that the census shuffle is the "
                "whole PageRank cost; same unrolled-CTE oracle as "
                "graph_pagerank_trade",
    tags=("graph", "iterative", "scale"),
)
def graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # census on the bucketed layout; iterations via the same bounded-
    # alphabet fold as graph_pagerank_trade (r11 — values unchanged)
    from g1_etl_spark.operators.folded import bounded_graph_row
    from g1_etl_spark.plans.graph_plans import _folded_pagerank

    edges = _pagerank_bucketed_edges(spark, sf_dir)
    outw = (edges.groupBy("src")
            .agg((F.sum(F.round(F.col("weight") * 1_000_000)
                        .cast("long")).cast("double") / 1_000_000)
                 .alias("_ow")))
    e = edges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("_ow")).alias("frac"))
    n = load_table(spark, sf_dir, "nation")
    nodes = n.select(F.col("n_name").alias("nation"))
    nn = nodes.count()  # graph metadata scalar
    row = bounded_graph_row(nodes, "nation", e, ["src", "dst", "frac"])
    return (_folded_pagerank(row, nn)
            .select(F.col("_id").alias("nation"), "rank")
            .orderBy("nation"))


@register(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="salted skew join, driver-certified result-neutral: the "
                "lineitem side is fanned across 8 salt subkeys (xxhash64 "
                "of the whole row) and orders replicated 8 ways, then "
                "joined on (key, salt) — the explicit treatment for a "
                "single hot key bigger than one executor, where AQE's "
                "skew split can't help; the oracle is the PLAIN join, "
                "proving salting gains or loses no rows",
    tags=("join", "scale"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from g1_etl_spark.operators import scaling as SC

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    joined = SC.salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"), "k", salt=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 dsum("l_quantity", "sum_qty"))
            .orderBy("o_orderpriority"))
