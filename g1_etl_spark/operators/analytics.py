"""Pareto/skyline analytics as distributed prefix aggregation.

No reference analog (superset scope). The classic 2-D skyline
("minimize x, maximize y": keep every row no other row beats on both
axes) is usually written as the quadratic NOT EXISTS self-join — which
is exactly what the DuckDB oracle runs. The Spark form here is EXACT
but linear: dominance in 2-D reduces to two aggregates,

    dominated(r)  <=>  max(y | x <  r.x) >= r.y     (strictly-cheaper)
                    OR max(y | x == r.x) >  r.y     (same-x, bigger-y)

so the whole skyline is (1) a per-x group max, (2) a STRICT prefix max
over the x-ordered group table, (3) one equi-join back on x. No
pairwise comparisons anywhere, no prune-then-verify residue.

The strict prefix max follows the repo's distributed total-order shape
(retrieval.global_rank / curation.budget_fill): range-repartition the
group table on x, take each partition's local strictly-preceding
running max with a per-partition window, and fold in the (partition-
count-sized, driver-held) max of all earlier partitions. Exact
duplicates — two rows with identical (x, y) — dominate neither and are
both kept, matching the strict-in-one NOT EXISTS semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, min_col: str, max_col: str,
               partitions: int | None = None) -> DataFrame:
    """Rows on the Pareto front of (minimize `min_col`, maximize
    `max_col`), all input columns preserved. Exact — see module doc.
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    pm = (df.groupBy(F.col(min_col).alias("_p"))
          .agg(F.max(max_col).alias("_gmax")))
    parts = (pm.repartitionByRange(n, F.col("_p"))
             .withColumn("_pid", F.spark_partition_id())
             .localCheckpoint())  # freeze pid assignment
    pmax = {r["_pid"]: r["m"] for r in
            parts.groupBy("_pid").agg(F.max("_gmax").alias("m"))
            .collect()}
    best = None
    offsets = []
    for pid in sorted(pmax):
        offsets.append((pid, best))
        best = pmax[pid] if best is None else max(best, pmax[pid])
    # explicit schema: offsets may be empty / all-NULL (first partition
    # has no predecessor) — same idiom as retrieval.global_rank
    field = df.schema[max_col].dataType.simpleString()
    off_df = spark.createDataFrame(offsets, f"_pid INT, _off {field}")
    lw = (W.partitionBy("_pid").orderBy("_p")
          .rowsBetween(W.unboundedPreceding, -1))
    prefix = (parts.withColumn("_lm", F.max("_gmax").over(lw))
              .join(F.broadcast(off_df), "_pid")
              # greatest skips NULLs; NULL result = nothing cheaper
              .select("_p", "_gmax",
                      F.greatest("_lm", "_off").alias("_strict")))
    joined = df.join(prefix, df[min_col] == F.col("_p"))
    dominated = ((F.col("_strict").isNotNull()
                  & (F.col("_strict") >= F.col(max_col)))
                 | (F.col("_gmax") > F.col(max_col)))
    return joined.filter(~dominated).select(*df.columns)


def global_prefix_sum(df: DataFrame, order_cols: list, value_col: str,
                      out_col: str = "cum",
                      partitions: int | None = None) -> DataFrame:
    """Inclusive running SUM of `value_col` (an integer column) over a
    TOTAL order — the distributed prefix-sum shape shared by pareto_abc
    and curation.budget_fill, factored out: range-repartition on the
    sort key, per-partition local running sum, driver-held offsets
    (one per PARTITION, bounded and tiny). No single-partition window
    anywhere. `order_cols` must be a total order (caller tie-breaks);
    exclusive form = out_col - value_col at the call site."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    parts = (df.repartitionByRange(n, *order_cols)
             .withColumn("_pid", F.spark_partition_id())
             .localCheckpoint())  # freeze pid assignment
    sizes = {r["_pid"]: r["t"] for r in
             parts.groupBy("_pid").agg(F.sum(value_col).alias("t"))
             .collect()}
    offset = 0
    offsets = []
    for pid in sorted(sizes):
        offsets.append((pid, offset))
        offset += int(sizes[pid] or 0)
    off_df = spark.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = (W.partitionBy("_pid").orderBy(*order_cols)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (parts.withColumn("_cl", F.sum(value_col).over(w))
            .join(F.broadcast(off_df), "_pid")
            .withColumn(out_col,
                        (F.col("_cl") + F.col("_off")).cast("long"))
            .drop("_pid", "_cl", "_off"))


def pareto_abc(df: DataFrame, key_col: str, value_col,
               a_pct: int = 70, b_pct: int = 90,
               partitions: int | None = None) -> DataFrame:
    """ABC / Pareto analysis: rank keys by a value (revenue) and class
    them by CUMULATIVE share — A while the running total is within
    a_pct% of the grand total, B within b_pct%, C after. The inventory/
    assortment staple ("which 20% of parts carry 80% of revenue").

    `value_col` must be an exact LONG (pre-scaled money; see
    plans/_util). The running total is the distributed prefix-sum shape
    of curation.budget_fill (range-repartition on the sort key, local
    running sum, driver-held per-partition offsets — one entry PER
    PARTITION), and the class thresholds compare pure integers, so
    there is no float anywhere and any engine agrees bit-for-bit. The
    thresholds are precomputed on the driver with Python bigints
    (thr = total * pct // 100 — exactly equivalent to the oracle's
    cum * 100 <= total * pct for integer cum) so the executor-side
    comparison is a plain cum <= lit(thr) with full int64 headroom:
    no cum*100 blow-up, the operator is safe to the same ~9.2e18
    scaled-value bound as every other scaled-long sum in the repo.

    Returns (key, value, cum_value, cum_share, abc_class), descending
    value order with key tie-break.
    """
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    base = df.select(F.col(key_col).alias("k"),
                     F.col(value_col).cast("long").alias("v"),
                     (-F.col(value_col).cast("long")).alias("_negv"))
    parts = (base.repartitionByRange(n, "_negv", "k")
             .withColumn("_pid", F.spark_partition_id())
             .localCheckpoint())  # freeze pid assignment
    sizes = {r["_pid"]: r["t"] for r in
             parts.groupBy("_pid").agg(F.sum("v").alias("t")).collect()}
    offset = 0
    offsets = []
    for pid in sorted(sizes):
        offsets.append((pid, offset))
        offset += int(sizes[pid] or 0)
    total = offset
    off_df = spark.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = (W.partitionBy("_pid").orderBy("_negv", "k")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (parts.withColumn("_cl", F.sum("v").over(w))
           .join(F.broadcast(off_df), "_pid")
           .withColumn("cum_value",
                       (F.col("_cl") + F.col("_off")).cast("long")))
    # Python-bigint thresholds; cum <= total*pct//100  ⟺  cum*100 <=
    # total*pct for integer cum, without the int64 overflow at cum*100.
    thr_a = total * a_pct // 100
    thr_b = total * b_pct // 100
    cls = (F.when(F.col("cum_value") <= F.lit(thr_a), "A")
           .when(F.col("cum_value") <= F.lit(thr_b), "B")
           .otherwise("C"))
    return (cum.select(F.col("k").alias(key_col),
                       F.col("v").alias("value"),
                       "cum_value",
                       (F.col("cum_value").cast("double")
                        / F.lit(float(total))).alias("cum_share"),
                       cls.alias("abc_class")))
