"""Flagship analytical queries (TPC-H-shaped) over the testdata star schema.

These exercise the full relational surface the rebuilt engine must cover:
scan -> filter (pushed to parquet) -> broadcast/shuffle join -> partial+final
hash aggregation -> sort. The reference has no aggregation pipeline at all
(SURVEY.md §2.5) — this is the rebuild's superset query surface demanded by
BASELINE.json.

Scale notes (100 TB):
  - lineitem/orders are the facts. nation/region (and name/type-filtered
    part slices) are genuinely tiny and explicitly broadcast.
  - customer/supplier are FACT-sized at cluster scale (sf x 150k / 10k
    rows), so they are never broadcast-hinted: each is reduced against
    its tiny dim first, pruned to the needed columns, and joined
    un-hinted — AQE broadcasts while the reduced side fits and falls
    back to a shuffle join at scale instead of OOMing on a forced
    broadcast.
  - lineitem⋈orders is the one unavoidable fact-fact shuffle join; AQE
    handles skew.
  - Filters are expressed on the scan columns so Catalyst pushes them into
    the parquet reader (verify: PushedFilters in .explain("formatted")).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.plans._util import DEC, davg, dsum, sql_davg, sql_dsum
from g1_etl_spark.plans.registry import register


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1: pricing summary report (groupBy + 8 aggregates)",
    tags=("agg", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: top unshipped orders by revenue (3-way join + topk)",
    tags=("join", "agg", "topk", "flagship"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("date"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("date"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # segment-filtered customer is still sf x 30k rows — fact-sized
        # at scale, so no broadcast hint; AQE decides
        .join(cust.select("c_custkey"),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    description="TPC-H Q5: local supplier volume (6-way join, broadcast dims)",
    tags=("join", "agg", "flagship"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date")))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # supplier reduced against the region-filtered nations (broadcast)
    # up front — only ASIA suppliers reach the big join; customer joins
    # un-hinted and keeps just (key, nationkey) for the local-supplier
    # match. Neither fact-sized side carries a broadcast hint.
    asia_n = (nation.join(F.broadcast(region),
                          nation.n_regionkey == region.r_regionkey)
              .select("n_nationkey", "n_name"))
    supp_asia = (supp.join(F.broadcast(asia_n),
                           supp.s_nationkey == F.col("n_nationkey"))
                 .select("s_suppkey", "s_nationkey", "n_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              orders.o_custkey == F.col("c_custkey"))
        .join(supp_asia,
              (li.l_suppkey == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume', 'revenue')}
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: bilateral shipping volume by year (nation "
                "self-join via two broadcast aliases; synthetic nation "
                "names NATION_1/NATION_2 so the pair actually matches)",
    tags=("join", "agg", "flagship"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    # the nation-pair predicate reduces customer and supplier to the
    # two named nations BEFORE the big joins (broadcast only the tiny
    # filtered nation dims) — the fact-fact joins carry no hints
    pair = ("NATION_1", "NATION_2")
    cust_n = (cust.join(
        F.broadcast(n2.filter(F.col("cust_nation").isin(*pair))),
        cust.c_nationkey == n2.c_nk)
        .select("c_custkey", "cust_nation"))
    supp_n = (supp.join(
        F.broadcast(n1.filter(F.col("supp_nation").isin(*pair))),
        supp.s_nationkey == n1.s_nk)
        .select("s_suppkey", "supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == F.col("c_custkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .filter(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-10-01'
      AND o_orderdate < DATE '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: top customers by returned-item revenue",
    tags=("join", "agg", "topk", "flagship"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date")))
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # customer joined un-hinted (fact-sized at scale) after a broadcast
    # nation reduction that carries only the columns the output needs
    cust_n = (cust.join(F.broadcast(nation),
                        cust.c_nationkey == nation.n_nationkey)
              .select("c_custkey", "c_name", "c_acctbal", "n_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
           {sql_dsum('l_quantity', 'total_qty')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 120)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    description="TPC-H Q18: large-quantity orders (agg-subquery semi "
                "filter + re-aggregation)",
    tags=("join", "agg", "flagship"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                .alias("tq"))
           .filter(F.col("tq") > 120)
           .select("l_orderkey"))
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        # fact-sized customer joins un-hinted (AQE decides), pruned to
        # the single column the output needs
        .join(cust.select("c_custkey"),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .select("c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "revenue_by_nation",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    description="Flagship: revenue by customer nation (scan→join→agg→sort)",
    tags=("join", "agg", "flagship"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # customer is fact-sized at cluster scale: reduce it against the
    # genuinely tiny nation dim first (broadcast), prune to
    # (join key, carried name), then join with NO hint — AQE broadcasts
    # while the pruned side fits and shuffle-joins at scale
    cust_n = (cust.join(F.broadcast(nation),
                        cust.c_nationkey == nation.n_nationkey)
              .select("c_custkey", "n_name"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 shape: priority counts for orders with a "
                "returned line (EXISTS -> left-semi join; the synthetic "
                "schema lacks commit/receipt dates, so the inner "
                "predicate is returnflag='R')",
    tags=("join", "agg", "flagship"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (o.filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
                     & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date")))
            .join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: forecasting revenue change — pure pushed-down "
                "filter + global aggregate, no join",
    tags=("agg", "flagship"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
             F.count(F.lit(1)).alias("n")))


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00
           * (CAST(SUM(CAST(round((CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
           / (CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount))
                 * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)
             AS promo_revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-03-01'
      AND l_shipdate < DATE '1997-04-01'
    """,
    description="TPC-H Q14: promo revenue share — broadcast part join, "
                "conditional aggregate ratio",
    tags=("join", "agg", "flagship"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))

    def dsum_col(c):
        return F.sum(F.round(c * 1_000_000).cast("long")).cast("double") / 1_000_000

    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date")))
        # part grows with sf — no hint; AQE broadcasts while it fits
        .join(p, li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum_col(promo) / dsum_col(disc_price))
             .alias("promo_revenue"),
             F.count(F.lit(1)).alias("n")))


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    description="TPC-H Q19 shape: disjunctive brand/size/quantity "
                "predicates over a broadcast part join (OR-of-ANDs "
                "residual on an equi-join, never a cartesian)",
    tags=("join", "agg", "flagship"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
            | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
            | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30)))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(pred)
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                      "revenue"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13: customer order-count distribution (left join "
                "preserving orderless customers, double aggregation)",
    tags=("join", "agg", "flagship"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    description="TPC-H Q15: top supplier by quarterly revenue (view + "
                "scalar max subquery, decorrelated to a broadcast join)",
    tags=("join", "agg", "flagship"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "total_revenue")))
    revenue.cache()
    mx = revenue.agg(F.max("total_revenue").alias("m"))
    return (s.join(revenue, s.s_suppkey == revenue.supplier_no)
            .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem li2
                        WHERE li2.l_partkey = lineitem.l_partkey)
    """,
    description="TPC-H Q17: small-quantity-order revenue — correlated "
                "per-part average decorrelated into a pre-aggregated "
                "join (one scan computes all per-part thresholds)",
    tags=("join", "agg", "flagship"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23")
    thresholds = (li.groupBy(F.col("l_partkey").alias("t_partkey"))
                  .agg((F.lit(0.2) * F.avg("l_quantity")).alias("thresh")))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(thresholds, li.l_partkey == thresholds.t_partkey)
            .filter(F.col("l_quantity") < F.col("thresh"))
            .agg((F.sum(F.round(F.col("l_extendedprice") * 1_000_000)
                        .cast("long")).cast("double") / 1_000_000 / 7.0)
                 .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000 AS totacctbal
    FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey))
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    description="TPC-H Q22 shape: high-balance customers with no orders "
                "(scalar avg subquery + anti join; cntrycode derived "
                "from nationkey — the synthetic schema has no phone)",
    tags=("join", "agg", "flagship"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 (F.sum(F.round(F.col("c_acctbal") * 1_000_000)
                        .cast("long")).cast("double") / 1_000_000)
                 .alias("totacctbal"))
            .orderBy("cntrycode"))


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           num / den AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CAST(round((CASE WHEN n2.n_name = 'NATION_3'
                    THEN l_extendedprice * (1 - l_discount)
                    ELSE 0 END) * 1000000) AS BIGINT)) AS DOUBLE)
               / 1000000 AS num,
             CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount))
                    * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS den
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
      GROUP BY 1)
    ORDER BY o_year
    """,
    description="TPC-H Q8 shape: national market share — 8-table join "
                "(tiny dims broadcast; customer/supplier dim-reduced and "
                "key-pruned, join strategy left to AQE since both are "
                "fact-sized at scale), per-year supplier-nation share",
    tags=("join", "agg", "flagship"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    # customer nations restricted to the AMERICA region (semi via inner
    # join on a pre-reduced dim — stays broadcast at any corpus scale)
    amer = (n.join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
                   n.n_regionkey == r.r_regionkey)
            .select(F.col("n_nationkey").alias("cn_key")))
    n2 = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_vol = F.when(F.col("supp_nation") == "NATION_3", vol) \
        .otherwise(F.lit(0.0))
    # customer and supplier are FACT-sized at cluster scale (sf x 150k /
    # sf x 10k rows), so they are never explicitly broadcast: each is
    # first reduced against its genuinely tiny dim (region-filtered
    # nations / nation names, both broadcast) and pruned to the join key
    # (+ carried name), then joined with no hint — AQE picks broadcast
    # while the reduced side fits and falls back to a shuffle join at
    # scale instead of OOMing the driver on a forced broadcast.
    cust_amer = (c.join(F.broadcast(amer),
                        c.c_nationkey == F.col("cn_key"))
                 .select("c_custkey"))
    supp_n = (s.join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
              .select("s_suppkey", "supp_nation"))
    joined = (
        li.join(p.filter(F.col("p_type") == "ECONOMY"),
                li.l_partkey == p.p_partkey)
        .join(o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("date"))),
            li.l_orderkey == o.o_orderkey)
        .join(cust_amer, o.o_custkey == F.col("c_custkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
    )
    grouped = (joined
               .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
               .agg(dsum(share_vol, "num"), dsum(vol, "den")))
    return (grouped
            .select("o_year",
                    (F.col("num") / F.col("den")).alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "q21_late_supplier_blame",
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
    description="TPC-H Q21 shape: suppliers solely to blame for late "
                "multi-supplier orders — EXISTS -> left-semi and NOT "
                "EXISTS -> left-anti with mixed equi+inequality "
                "predicates, the double-decorrelation composition the "
                "rest of the suite doesn't exercise (lateness adapted "
                "to the synthetic schema: shipped > 90 days after "
                "order date)",
    tags=("join", "agg", "flagship"),
)
def q21_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    s = load_table(spark, sf_dir, "supplier")
    late = (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate") > F.date_add("o_orderdate", 90))
            .select("l_orderkey", "l_suppkey").distinct())
    # EXISTS another supplier on the order (late or not) -> left-semi;
    # the suppkey inequality rides the equi-join as a residual predicate
    other = li.select(F.col("l_orderkey").alias("o_k"),
                      F.col("l_suppkey").alias("o_s")).distinct()
    has_other = late.join(
        other, (late.l_orderkey == other.o_k)
        & (late.l_suppkey != other.o_s), "left_semi")
    # NOT EXISTS another LATE supplier on the order -> left-anti
    late2 = late.select(F.col("l_orderkey").alias("t_k"),
                        F.col("l_suppkey").alias("t_s"))
    blamed = has_other.join(
        late2, (has_other.l_orderkey == late2.t_k)
        & (has_other.l_suppkey != late2.t_s), "left_anti")
    return (blamed.join(s, blamed.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(20))


@register(
    "q9_profit_by_nation",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
    FROM (SELECT n_name AS nation,
                 EXTRACT(year FROM o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - p_retailprice * 0.4 * l_quantity AS amount
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN orders   ON o_orderkey = l_orderkey
          WHERE p_name LIKE '%green%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 shape: nation-year profit (schema has no "
                "partsupp, so supply cost is proxied as 40% of "
                "p_retailprice — same 6-way join + derived-column agg "
                "mechanics). Name-filtered part broadcast; supplier "
                "dim-reduced, fact joins un-hinted",
    tags=("join", "agg", "flagship"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%green%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp_n = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .select("s_suppkey", F.col("n_name").alias("nation")))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * 0.4 * F.col("l_quantity"))
    return (
        li.join(p.select("p_partkey", "p_retailprice"),
                li.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(supp_n, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation",
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dsum(amount, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="TPC-H Q12 shape: priority shipment accounting (schema "
                "has no l_shipmode, so lines group by return flag — "
                "same join + dual conditional-count mechanics). One "
                "fact-fact shuffle join; counts fold map-side",
    tags=("join", "agg"),
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
             .alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).cast("long")
             .alias("low_line_count"))
        .orderBy("l_returnflag")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND p_type NOT LIKE 'MEDIUM%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="TPC-H Q16 shape: supplier variety per part attribute "
                "(lineitem stands in for partsupp; negative-balance "
                "suppliers play the complaints exclusion) — NOT IN "
                "subquery decorrelated to a broadcast anti-join, then "
                "COUNT DISTINCT per attribute triple",
    tags=("join", "agg"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        & ~F.col("p_type").like("MEDIUM%"))
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p.select("p_partkey", "p_brand", "p_type", "p_size"),
                li.l_partkey == F.col("p_partkey"))
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_excess_shipments",
    oracle="""
    WITH promo_ship AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(round(l_quantity * 1000000) AS BIGINT))
                  AS DOUBLE) / 1000000 AS total_qty,
             CAST(SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                            AND l_shipdate < DATE '1997-01-01'
                           THEN CAST(round(l_quantity * 1000000) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) / 1000000 AS qty_1996
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey, l_partkey),
    hot AS (
      SELECT DISTINCT l_suppkey FROM promo_ship
      WHERE qty_1996 > 0.5 * total_qty)
    SELECT s_name, CAST(s_suppkey AS BIGINT) AS s_suppkey
    FROM supplier JOIN hot ON s_suppkey = l_suppkey
    ORDER BY s_name
    """,
    description="TPC-H Q20 shape: suppliers concentrating PROMO-part "
                "shipments into one year (no partsupp availqty; the "
                "0.5x-of-total threshold plays its role) — aggregate "
                "subquery, semi-join reduction, dim join for names",
    tags=("join", "agg"),
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    y96 = ((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
           & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date")))
    ship = (li.join(p.select("p_partkey"),
                    li.l_partkey == F.col("p_partkey"))
            .groupBy("l_suppkey", "l_partkey")
            .agg(dsum("l_quantity", "total_qty"),
                 dsum(F.when(y96, F.col("l_quantity")).otherwise(0.0),
                      "qty_1996")))
    hot = (ship.filter(F.col("qty_1996") > 0.5 * F.col("total_qty"))
           .select("l_suppkey").distinct())
    return (s.join(hot, s.s_suppkey == F.col("l_suppkey"), "left_semi")
            .select("s_name", F.col("s_suppkey").cast("long"))
            .orderBy("s_name"))


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
      FROM lineitem
      WHERE l_suppkey IN (SELECT s_suppkey FROM eu_supp)
      GROUP BY l_partkey, l_suppkey),
    min_cost AS (
      SELECT l_partkey AS mc_partkey, MIN(supplycost) AS mc_cost
      FROM supply GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
    FROM supply
    JOIN min_cost ON l_partkey = mc_partkey AND supplycost = mc_cost
    JOIN part ON p_partkey = l_partkey
    JOIN eu_supp ON s_suppkey = l_suppkey
    WHERE p_size = 15 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2 shape: minimum-cost supplier per part in one "
                "region (no partsupp in the schema — supply cost is the "
                "cheapest observed lineitem price per part x supplier; "
                "size/type play the part filter). The correlated MIN "
                "subquery decorrelates to an aggregate + equi-join on "
                "(part, cost); supplier is fact-sized so its reduced "
                "slice joins un-hinted (AQE decides), only the genuinely "
                "tiny nation x region dim is broadcast. The sort keys "
                "(s_name, p_partkey) form a total order, so the LIMIT "
                "boundary is deterministic across engines",
    tags=("join", "agg", "flagship"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))

    eu_nation = (n.join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                        n.n_regionkey == r.r_regionkey)
                 .select("n_nationkey", "n_name"))
    eu_supp = (s.join(F.broadcast(eu_nation),
                      s.s_nationkey == F.col("n_nationkey"))
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))

    # cheapest observed price per (part, supplier), European suppliers
    # only — the per-part MIN then needs just this pre-aggregated slice.
    # r12 (guide §2.4/§7.2): the min-cost decorrelation used to be a
    # second aggregate + equi-join on (part, cost) — and because the
    # (part, supplier) aggregate needs NO exchange (the semi-join's
    # l_suppkey partitioning already clusters it), there was nothing
    # for ReusedExchange to reuse: the plan ran the lineitem scan +
    # semi-join + aggregate TWICE (two SortMergeJoin LeftSemi in the
    # before-plan). A per-part min window + filter computes the same
    # keep-ties minimum in ONE pass — one added exchange on the
    # aggregated (part, supplier) slice instead of a duplicated
    # data-sized subtree.
    supply = (li.join(eu_supp.select("s_suppkey"),
                      li.l_suppkey == F.col("s_suppkey"), "left_semi")
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min("l_extendedprice").alias("supplycost")))
    cheapest = (supply.withColumn(
        "_mc", F.min("supplycost").over(W.partitionBy("l_partkey")))
        .filter(F.col("supplycost") == F.col("_mc")).drop("_mc"))
    return (cheapest
            .join(p.select("p_partkey", "p_brand"),
                  cheapest.l_partkey == F.col("p_partkey"))
            .join(eu_supp, cheapest.l_suppkey == eu_supp.s_suppkey)
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_brand", "supplycost")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


@register(
    "q11_important_stock",
    oracle=f"""
    WITH part_value AS (
      SELECT l_partkey, {sql_dsum('l_extendedprice', 'value')}
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7')
      GROUP BY l_partkey),
    total AS (SELECT {sql_dsum('value', 'tot')} FROM part_value)
    SELECT l_partkey, value
    FROM part_value, total
    WHERE value > 0.001 * tot
    ORDER BY value DESC, l_partkey
    """,
    description="TPC-H Q11 shape: parts holding an outsized share of "
                "one nation's supply value (no partsupp — value is the "
                "summed lineitem revenue through that nation's "
                "suppliers). The HAVING-vs-global-scalar compare is a "
                "broadcast of a 1-row aggregate; sums are quantized "
                "identically on both engines so share thresholds cannot "
                "drift on float association",
    tags=("join", "agg", "flagship"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n7 = (s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
                 s.s_nationkey == n.n_nationkey)
          .select("s_suppkey"))
    part_value = (li.join(n7, li.l_suppkey == F.col("s_suppkey"),
                          "left_semi")
                  .groupBy("l_partkey")
                  .agg(dsum("l_extendedprice", "value")))
    total = part_value.agg(dsum("value", "tot"))
    return (part_value.join(F.broadcast(total))
            .filter(F.col("value") > 0.001 * F.col("tot"))
            .select("l_partkey", "value")
            .orderBy(F.desc("value"), "l_partkey"))
