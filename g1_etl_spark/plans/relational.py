"""Core relational operator queries — one per operator family in
SURVEY.md §2, each with a DuckDB oracle twin.

Reference parity map (citations into /root/reference/):
  proj_cut            → P1  etl.cut               (mmj/entities/menu_items.py:70-71)
  proj_positional     → P2  cut by position       (mmj/entities/menu_items.py:307-310)
  proj_drop           → P3  etl.cutout            (mmj/entities/menu_items.py:115)
  proj_addfield       → P4  etl.addfield          (mmj/entities/menu_items.py:73-80)
  proj_fieldmap       → P6  etl.fieldmap          (mmj/entities/members.py:63-100)
  proj_rename         → P7  etl.rename            (mmj/entities/settings.py:83-106)
  filter_pushdown     → F1  source-SQL WHERE      (mmj/utilities/utils.py:28-30)
  filter_lambda       → F2  etl.select            (mmj/entities/menu_items.py:111-113)
  join_inner          → J1  SQL inner join        (mmj/utilities/utils.py:35-37)
  join_sorted         → J2  join + ORDER BY desc  (mmj/utilities/utils.py:42-47)
  join_lookup         → J4  etl.lookup broadcast  (mmj/entities/menu_items.py:229-234)
  join_semi           → J5  existence test        (mmj/entities/menu_items.py:237-251)
  join_anti           → J5 complement (NOT EXISTS)
  join_left           → J6  nested-loop left join (mmj/entities/menu_items.py:111-116)
  join_full_outer     → superset (no reference analog; SURVEY §2.4 note)
  last_row_wins       → A3/W2 last-wins folds     (mmj/entities/settings.py:169-204)
  first_per_key       → A2  lookup(...)[0]        (mmj/entities/menu_items.py:234)
  distinct_rows       → A1  SELECT DISTINCT       (mmj/entities/menu_items.py:242-244)
  agg_basic / rollup / cube / grouping_sets / pivot / unpivot
                      → SURVEY §2.5 superset agg surface
  setop_*             → SURVEY §2.7 (reference has none; superset)
  sort_limit_topk     → W1 + superset top-k
  window_analytics    → W2 superset (row_number/rank/lag/lead/running)
  scalar_subquery     → J8 correlated-subquery decorrelation pattern

All are stock DataFrame API — zero UDFs (SURVEY §4 conclusion). Scale
notes: dimension joins broadcast; fact-fact joins shuffle on join keys
with AQE; window queries partition by their key (no global windows except
the deliberately tiny ones over dimension tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from g1_etl_spark.catalog import load_table
from g1_etl_spark.plans._util import DEC, davg, dsum, sql_davg, sql_dsum
from g1_etl_spark.plans.registry import register


# --------------------------------------------------------------------------
# Projections
# --------------------------------------------------------------------------

@register(
    "proj_cut",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
    description="P1: keep listed columns (etl.cut)",
    tags=("projection",),
)
def proj_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice")


@register(
    "proj_positional",
    oracle="SELECT n_nationkey, n_name FROM nation",
    description="P2: projection by column position (etl.cut(*range))",
    tags=("projection",),
)
def proj_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "nation")
    return df.select(*df.columns[0:2])


@register(
    "proj_drop",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer",
    description="P3: drop a column (etl.cutout)",
    tags=("projection",),
)
def proj_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").drop("c_acctbal")


@register(
    "proj_addfield",
    oracle="""
    SELECT s_suppkey, s_name,
           CAST(NULL AS VARCHAR) AS note,
           CAST(1 AS BIGINT) AS flag
    FROM supplier
    """,
    description="P4: append constant/null columns (etl.addfield)",
    tags=("projection",),
)
def proj_addfield(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_name")
        .withColumn("note", F.lit(None).cast("string"))
        .withColumn("flag", F.lit(1).cast("long"))
    )


@register(
    "proj_fieldmap",
    oracle="""
    SELECT s_suppkey AS supplier_id,
           s_name AS supplier_name,
           UPPER(s_name) AS name_upper,
           CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS balance_cents,
           s_nationkey + 100 AS shifted_nation
    FROM supplier
    """,
    description="P6: fieldmap — renames + computed columns in one select",
    tags=("projection", "scalar"),
)
def proj_fieldmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("supplier_id"),
        F.col("s_name").alias("supplier_name"),
        F.upper("s_name").alias("name_upper"),
        F.floor(F.col("s_acctbal") * 100).cast("long").alias("balance_cents"),
        (F.col("s_nationkey") + 100).alias("shifted_nation"),
    )


@register(
    "proj_rename",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS part_name, p_brand AS brand,
           p_type AS type_name, p_size AS size, p_retailprice AS retail_price
    FROM part
    """,
    description="P7: bulk column renames (etl.rename)",
    tags=("projection",),
)
def proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    renames = {
        "p_partkey": "part_id", "p_name": "part_name", "p_brand": "brand",
        "p_type": "type_name", "p_size": "size", "p_retailprice": "retail_price",
    }
    df = load_table(spark, sf_dir, "part")
    return df.withColumnsRenamed(renames)


# --------------------------------------------------------------------------
# Filters
# --------------------------------------------------------------------------

@register(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-07-01'
      AND l_quantity > 45
    """,
    description="F1: conjunctive predicates pushed into the parquet scan",
    tags=("filter",),
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "filter_lambda",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'P')
      AND o_orderpriority LIKE '1-%'
      AND o_totalprice BETWEEN 1000 AND 100000
    """,
    description="F2: row-predicate filter (IN / LIKE / BETWEEN)",
    tags=("filter",),
)
def filter_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "P")
            & F.col("o_orderpriority").like("1-%")
            & F.col("o_totalprice").between(1000, 100000)
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "join_inner",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    description="J1: inner equi-join, dimension broadcast",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name")
    )


@register(
    "join_sorted",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey DESC
    LIMIT 100
    """,
    description="J2: join + ORDER BY id DESC (load_membership_prices shape)",
    tags=("join", "sort"),
)
def join_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        # customer grows with sf — no hint; AQE broadcasts while it fits
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy(F.desc("o_orderkey"))
        .limit(100)
    )


@register(
    "join_lookup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, p_name, p_retailprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_linenumber = 1
    """,
    description="J4/J8: etl.lookup → broadcast hash join (decorrelated N+1)",
    tags=("join",),
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    part = load_table(spark, sf_dir, "part")
    return (
        # part grows with sf — no hint; AQE broadcasts while it fits
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_name",
                "p_retailprice")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    description="J5: left-semi join (existence test, _wm_integration shape)",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    description="left-anti join (NOT EXISTS)",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderdate >= DATE '2000-01-01'
    GROUP BY c_custkey, c_name
    """,
    description="J6: left outer join preserving unmatched rows + count",
    tags=("join", "agg"),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderdate >= F.lit("2000-01-01").cast("date")),
            "left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH a AS (SELECT o_custkey, COUNT(*) AS n1996 FROM orders
               WHERE o_orderdate >= DATE '1996-01-01'
                 AND o_orderdate < DATE '1997-01-01' GROUP BY o_custkey),
         b AS (SELECT o_custkey, COUNT(*) AS n1997 FROM orders
               WHERE o_orderdate >= DATE '1997-01-01'
                 AND o_orderdate < DATE '1998-01-01' GROUP BY o_custkey)
    SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
           COALESCE(n1996, 0) AS n1996, COALESCE(n1997, 0) AS n1997
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    """,
    description="full outer join of two yearly aggregates",
    tags=("join", "agg"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date")))
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = year_counts(1996, "n1996")
    b = year_counts(1997, "n1997").withColumnRenamed("o_custkey", "bk")
    return (
        a.join(b, a.o_custkey == b.bk, "full_outer")
        .select(
            F.coalesce(a.o_custkey, b.bk).alias("custkey"),
            F.coalesce("n1996", F.lit(0)).alias("n1996"),
            F.coalesce("n1997", F.lit(0)).alias("n1997"),
        )
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    description="cross join of two tiny sets",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


# --------------------------------------------------------------------------
# Per-key first/last (lookup[0] and last-row-wins folds)
# --------------------------------------------------------------------------

@register(
    "first_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey,
           CAST(o_orderdate AS DATE) AS first_orderdate
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    description="A2: first value per key (lookup(...)[0] → window rn=1)",
    tags=("window",),
)
def first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").cast("date").alias("first_orderdate"),
        )
    )


@register(
    "last_row_wins",
    oracle="""
    SELECT l_orderkey, l_linenumber AS last_line, l_extendedprice AS last_price
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber DESC,
                                             l_extendedprice DESC) AS rn
          FROM lineitem)
    WHERE rn = 1
    """,
    description="A3/W2: last-row-wins fold (settings.py:169-204) as window",
    tags=("window",),
)
def last_row_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_linenumber is NOT unique per order in the synthetic data, so the
    # ordering must be total over every output-affecting column — otherwise
    # Spark and the oracle may break ties differently.
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        F.desc("l_linenumber"), F.desc("l_extendedprice"))
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("last_line"),
            F.col("l_extendedprice").alias("last_price"),
        )
    )


# --------------------------------------------------------------------------
# Distinct / aggregation surface
# --------------------------------------------------------------------------

@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    description="A1: SELECT DISTINCT",
    tags=("agg",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus").distinct()


@register(
    "agg_basic",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {sql_dsum('o_totalprice', 'total')},
           {sql_davg('o_totalprice', 'avg_price')},
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    description="groupBy with count/count-distinct/sum/avg/min/max",
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice", "total"),
            davg("o_totalprice", "avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity', 'qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="rollup (hierarchical subtotals)",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "qty"))
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity', 'qty')}
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="cube (all grouping combinations)",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", "qty"))
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_extendedprice', 'price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    description="explicit grouping sets",
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "gs_lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, {sql_dsum('l_extendedprice', 'price')}
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@register(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", '"O"')},
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", '"F"')}
    FROM lineitem GROUP BY l_returnflag
    """,
    description="pivot linestatus into columns",
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS value FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
    description="unpivot/melt wide columns to rows",
    tags=("agg",),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal"),
        F.col("s_nationkey").cast("double").alias("s_nationkey_d"))
    return s.unpivot(
        "s_suppkey", ["s_acctbal", "s_nationkey_d"], "metric", "value"
    ).select(
        "s_suppkey",
        F.when(F.col("metric") == "s_acctbal", "acctbal")
        .otherwise("nationkey").alias("metric"),
        "value",
    )


@register(
    "approx_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    description="distinct-count per group (exact twin of approx_count_distinct; "
                "approx variant asserted within 5% in tests/test_relational_extras.py)",
    tags=("agg",),
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle-checked output is the exact count; approx_count_distinct is
    # engine-specific (HLL++ seeds differ from DuckDB) so it is test-asserted
    # to be within 5% rather than hash-compared.
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact_parts"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def _custkeys_building(spark, sf_dir):
    return (load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))


def _custkeys_with_urgent_orders(spark, sf_dir):
    return (load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_custkey").alias("c_custkey")))


_SETOP_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SETOP_B = ("SELECT o_custkey AS c_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT'")


@register(
    "setop_union",
    oracle=f"SELECT c_custkey FROM (({_SETOP_A}) UNION ({_SETOP_B}))",
    description="UNION (distinct)",
    tags=("setop",),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_building(spark, sf_dir).union(
        _custkeys_with_urgent_orders(spark, sf_dir)).distinct()


@register(
    "setop_union_all",
    oracle=f"({_SETOP_A}) UNION ALL ({_SETOP_B})",
    description="UNION ALL (bag semantics)",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_building(spark, sf_dir).union(
        _custkeys_with_urgent_orders(spark, sf_dir))


@register(
    "setop_intersect",
    oracle=f"({_SETOP_A}) INTERSECT ({_SETOP_B})",
    description="INTERSECT (distinct)",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_building(spark, sf_dir).intersect(
        _custkeys_with_urgent_orders(spark, sf_dir))


@register(
    "setop_except",
    oracle=f"({_SETOP_A}) EXCEPT ({_SETOP_B})",
    description="EXCEPT (distinct)",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_building(spark, sf_dir).exceptAll(
        _custkeys_with_urgent_orders(spark, sf_dir)).distinct()


# --------------------------------------------------------------------------
# Sort / limit / top-k / windows
# --------------------------------------------------------------------------

@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    description="W1 + top-k: global sort with deterministic tie-break + limit",
    tags=("sort",),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    description="top-3 orders per customer (window row_number)",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_analytics",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           LAG(o_orderkey)  OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="window suite: row_number/rank/dense_rank/lag/lead/running sum",
    tags=("window",),
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(wsum)
        .cast("double").alias("running_total"),
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(*) * 1.8
           FROM orders)
    """,
    description="J8 decorrelation: filter vs scalar aggregate subquery "
                "(factor 1.8: the synthetic uniform price distribution "
                "tops out below 2x the mean, which made the result "
                "vacuously empty)",
    tags=("join", "agg"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    threshold = orders.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
         / F.count(F.lit(1)) * 1.8).alias("t"))
    return (
        orders.join(F.broadcast(threshold))
        .filter(F.col("o_totalprice") > F.col("t"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "orders_basket_pairs",
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
    description="market-basket co-occurrence mining: top-50 part pairs "
                "by order-level support — per-order self-join (group "
                "size bounded by basket size, never corpus size), one "
                "count shuffle, deterministic top-k",
    tags=("join", "agg", "topk"),
)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the self-join keys on the ORDER, so each join group
    is basket-sized (TPC-H ~4 items) regardless of corpus size — the
    classic trick that makes pair mining linear in orders rather than
    quadratic in items. Pair counts fold map-side before the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .groupBy(F.col("a.l_partkey").alias("p1"),
                     F.col("b.l_partkey").alias("p2"))
            .agg(F.count(F.lit(1)).alias("support"))
            .orderBy(F.desc("support"), "p1", "p2")
            .limit(50))


@register(
    "window_analytics_extended",
    oracle="""
    SELECT o_orderkey, o_custkey,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="window suite 2: ntile/percent_rank/cume_dist/"
                "first_value/last_value/nth_value (distribution and "
                "positional analytics; last/nth over the full frame — "
                "the default running frame would make them trivially "
                "equal to the current/first row)",
    tags=("window",),
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@register(
    "orders_basket_triples",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT o_custkey,
             date_trunc('month', o_orderdate) AS mon,
             p_brand
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey),
    freq AS (SELECT p_brand FROM baskets
             GROUP BY p_brand HAVING COUNT(*) >= 2),
    fb AS (SELECT b.o_custkey, b.mon, b.p_brand
           FROM baskets b JOIN freq USING (p_brand)),
    tri AS (
      SELECT a.p_brand AS b1, b.p_brand AS b2, c.p_brand AS b3,
             COUNT(*) AS support
      FROM fb a
      JOIN fb b ON a.o_custkey = b.o_custkey AND a.mon = b.mon
               AND a.p_brand < b.p_brand
      JOIN fb c ON b.o_custkey = c.o_custkey AND b.mon = c.mon
               AND b.p_brand < c.p_brand
      GROUP BY 1, 2, 3)
    SELECT b1, b2, b3, support FROM tri WHERE support >= 2
    ORDER BY support DESC, b1, b2, b3
    LIMIT 50
    """,
    description="market-basket TRIPLE mining with the A-PRIORI prune, "
                "over (customer, month) brand baskets — the itemset "
                "alphabet is the 25-brand dim, so basket size is "
                "bounded by a CONSTANT at any corpus scale (raw "
                "part-level triples go degenerate: random 4-item "
                "baskets never repeat a part triple past tiny sf); "
                "pass-1 downward-closure cut drops infrequent brands "
                "before any pair work, then ordered b1<b2<b3 "
                "enumeration via two basket-keyed self-joins (each "
                "join group basket-sized), map-side-combined count, "
                "support >= 2, deterministic top-50",
    tags=("join", "agg", "topk", "scale"),
)
def orders_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §2.4): the two basket-keyed self-joins (each an
    # exchange of the full basket stream plus a join) are replaced by
    # ONE groupBy(cust, mon) collect_set — safe here because the brand
    # alphabet caps every set at 25 elements, unlike the gram-set case
    # source_overlap documents — and an in-expression ordered-triple
    # fan-out over the sorted set. Per basket the enumerated triples
    # are exactly the rows the self-joins produced (sorted distinct
    # brands, b1 < b2 < b3), so the support counts are identical. The
    # old pass-1 a-priori brand prune is dropped as RESULT-NEUTRAL
    # rather than moved: any triple surviving support >= 2 sits in >= 2
    # baskets, so each of its brands does too (downward closure) — the
    # prune could never change the output, it only cut the self-join
    # fan-out, and the in-set enumeration is alphabet-capped without
    # it. Whole query = one exchange to group baskets + one bounded
    # count exchange; 8 Exchange nodes -> 2, no checkpoint, no
    # mid-build action.
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    sets = (li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                    li.l_orderkey == F.col("o_orderkey"))
            .join(p.select("p_partkey", "p_brand"),
                  li.l_partkey == F.col("p_partkey"))
            .select("o_custkey",
                    F.date_trunc("month", "o_orderdate").alias("mon"),
                    "p_brand")
            .groupBy("o_custkey", "mon")
            .agg(F.sort_array(F.collect_set("p_brand")).alias("bs")))
    tri = F.expr(
        "flatten(flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), (y, j) -> "
        "transform(slice(bs, i + j + 3, size(bs)), z -> "
        "named_struct('b1', x, 'b2', y, 'b3', z))))))")
    return (sets.select(F.explode(tri).alias("t"))
            .groupBy(F.col("t.b1").alias("b1"),
                     F.col("t.b2").alias("b2"),
                     F.col("t.b3").alias("b3"))
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= 2)
            .orderBy(F.desc("support"), "b1", "b2", "b3")
            .limit(50))


@register(
    "orders_rule_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT o_custkey,
             date_trunc('month', o_orderdate) AS mon, p_brand
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey),
    n AS (SELECT COUNT(*) AS n_baskets
          FROM (SELECT DISTINCT o_custkey, mon FROM baskets)),
    supp AS (SELECT p_brand, COUNT(*) AS cnt FROM baskets GROUP BY 1),
    pairs AS (SELECT a.p_brand AS b1, b.p_brand AS b2, COUNT(*) AS c_ab
              FROM baskets a JOIN baskets b
                ON a.o_custkey = b.o_custkey AND a.mon = b.mon
               AND a.p_brand < b.p_brand
              GROUP BY 1, 2),
    dirs AS (SELECT b1 AS antecedent, b2 AS consequent, c_ab FROM pairs
             UNION ALL
             SELECT b2, b1, c_ab FROM pairs)
    SELECT antecedent, consequent, CAST(c_ab AS BIGINT) AS pair_support,
           CAST(c_ab AS DOUBLE) / sa.cnt AS confidence,
           CAST(c_ab * n_baskets AS DOUBLE) / (sa.cnt * sb.cnt) AS lift
    FROM dirs JOIN supp sa ON antecedent = sa.p_brand
              JOIN supp sb ON consequent = sb.p_brand
              CROSS JOIN n
    WHERE c_ab >= 20
    ORDER BY lift DESC, antecedent, consequent LIMIT 50
    """,
    description="association rules over (customer, month) brand "
                "baskets: confidence = supp(A,B)/supp(A) and lift = "
                "supp(A,B)*N / (supp(A)*supp(B)) for both rule "
                "directions, support floor 20, top-50 by lift — the "
                "market-basket layer ABOVE the pair/triple miners "
                "(orders_basket_pairs/_triples). Every statistic is a "
                "ratio of exact BIGINT counts (one float division "
                "each), so the ranking is bit-deterministic. Scale "
                "shape: the self-join keys on the basket (group size "
                "~items-per-basket, constant 25-brand alphabet caps "
                "the pair space at 300), supports are one groupBy, N "
                "is a one-row scalar cross",
    tags=("join", "agg", "scale"),
)
def orders_rule_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    # r12 (guide §2.4, same restructure as orders_basket_triples): ONE
    # groupBy(cust, mon) collect_set (bounded: 25-brand alphabet caps
    # every set) replaces the distinct + basket-keyed self-join; pairs,
    # per-brand supports and the basket count N all derive from the
    # grouped frame. No checkpoint, as before: all three consumers sit
    # in ONE action plan, so the planner emits ReusedExchange for the
    # identical groupBy subtree — the shuffle runs once without pinning
    # ~|baskets| rows in block storage (an eager checkpoint here
    # heap-OOMed the 1000x probe; exchange reuse costs nothing).
    sets = (li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                    li.l_orderkey == F.col("o_orderkey"))
            .join(p.select("p_partkey", "p_brand"),
                  li.l_partkey == F.col("p_partkey"))
            .select("o_custkey",
                    F.date_trunc("month", "o_orderdate").alias("mon"),
                    "p_brand")
            .groupBy("o_custkey", "mon")
            .agg(F.sort_array(F.collect_set("p_brand")).alias("bs")))
    n = sets.agg(F.count(F.lit(1)).alias("n_baskets"))
    supp = (sets.select(F.explode("bs").alias("p_brand"))
            .groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt")))
    pair_fan = F.expr(
        "flatten(transform(bs, (x, i) -> "
        "transform(slice(bs, i + 2, size(bs)), y -> "
        "named_struct('b1', x, 'b2', y))))")
    pairs = (sets.select(F.explode(pair_fan).alias("pr"))
             .groupBy(F.col("pr.b1").alias("b1"),
                      F.col("pr.b2").alias("b2"))
             .agg(F.count(F.lit(1)).alias("c_ab")))
    dirs = (pairs.select("c_ab", F.explode(F.array(
        F.struct(F.col("b1").alias("antecedent"),
                 F.col("b2").alias("consequent")),
        F.struct(F.col("b2").alias("antecedent"),
                 F.col("b1").alias("consequent")))).alias("r"))
        .select("r.antecedent", "r.consequent", "c_ab"))
    sa = supp.select(F.col("p_brand").alias("antecedent"),
                     F.col("cnt").alias("c_a"))
    sb = supp.select(F.col("p_brand").alias("consequent"),
                     F.col("cnt").alias("c_b"))
    return (dirs.join(sa, "antecedent").join(sb, "consequent")
            .crossJoin(F.broadcast(n))
            .filter(F.col("c_ab") >= 20)
            .select("antecedent", "consequent",
                    F.col("c_ab").cast("long").alias("pair_support"),
                    (F.col("c_ab").cast("double") / F.col("c_a"))
                    .alias("confidence"),
                    ((F.col("c_ab") * F.col("n_baskets")).cast("double")
                     / (F.col("c_a") * F.col("c_b"))).alias("lift"))
            .orderBy(F.desc("lift"), "antecedent", "consequent")
            .limit(50))
