"""Feature-engineering operators for ML training pipelines: per-group
normalization and equi-depth binning.

Scale design:
  - `zscore_per_group` / `minmax_per_group`: one hash-shuffle aggregate
    to a tiny per-group stats frame, broadcast-joined back — the fact
    table itself is never shuffled. Moments use the sorted-sequential-
    sum trick from plans/stats_plans.py so Spark and DuckDB produce
    bit-identical doubles (collect_list per group is bounded by group
    size; for billion-row groups switch the sums to the scaled-long
    path of plans/_util.py, which loosens nothing here because z-scores
    only need mean/std, not full lists, at that point).
  - `equidepth_bins`: a global NTILE is a single-partition window at
    scale, so bins come from the distributed total-order rank
    (operators/retrieval.global_rank) via the explicit formula
    ``bin = floor((rank-1)·n_bins / N) + 1``. Note this is NOT SQL
    NTILE's remainder layout (NTILE front-loads the larger buckets);
    the formula is stated in the oracle too, so both engines agree by
    construction.

No reference analog; superset operators per SURVEY.md §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g1_etl_spark.operators.retrieval import global_rank


def _sortsum(expr) -> F.Column:
    """Order-insensitive double sum: sort the values, fold sequentially
    — the same operation order DuckDB's list_sum(list_sort(...)) uses."""
    return F.aggregate(F.array_sort(F.collect_list(expr)),
                       F.lit(0.0), lambda acc, x: acc + x)


def zscore_per_group(df: DataFrame, value_col: str,
                     group_cols: list[str],
                     out_col: str = "z") -> DataFrame:
    """Adds group mean, sample stddev and z-score columns.

    Single-value groups (std undefined) and zero-variance groups yield
    NULL z — both engines agree because the sqrt argument is the
    identical double.
    """
    x = F.col(value_col)
    stats = (df.groupBy(*group_cols)
             .agg(F.count(F.lit(1)).cast("double").alias("_n"),
                  _sortsum(x).alias("_sx"),
                  _sortsum(x * x).alias("_sxx")))
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    var = (sxx - sx * sx / n) / (n - 1)
    stats = stats.select(
        *group_cols, (sx / n).alias("grp_mean"),
        F.when(n > 1, F.sqrt(var)).alias("grp_std"))
    return (df.join(F.broadcast(stats), group_cols)
            .withColumn(out_col,
                        F.when(F.col("grp_std") > 0,
                               (x - F.col("grp_mean")) / F.col("grp_std"))))


def minmax_per_group(df: DataFrame, value_col: str,
                     group_cols: list[str],
                     out_col: str = "scaled") -> DataFrame:
    """Adds (x - min)/(max - min) per group; constant groups yield NULL."""
    x = F.col(value_col)
    stats = (df.groupBy(*group_cols)
             .agg(F.min(x).alias("grp_min"), F.max(x).alias("grp_max")))
    rng = F.col("grp_max") - F.col("grp_min")
    return (df.join(F.broadcast(stats), group_cols)
            .withColumn(out_col,
                        F.when(rng > 0, (x - F.col("grp_min")) / rng)))


def equidepth_bins(df: DataFrame, value_col: str, tie_cols: list[str],
                   n_bins: int = 10, out_col: str = "bin") -> DataFrame:
    """Assigns each row an equi-depth bin 1..n_bins by ascending value.

    ``bin = floor((rank-1)·n_bins / N) + 1`` over the distributed
    total-order rank; `tie_cols` must complete a total order. Bin sizes
    differ by at most 1.
    """
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in tie_cols]
    ranked = global_rank(df, order, rank_col="_rank")
    total = ranked.agg(F.count(F.lit(1)).alias("_total"))
    return (ranked.crossJoin(F.broadcast(total))
            .withColumn(out_col,
                        (F.floor((F.col("_rank") - 1) * n_bins
                                 / F.col("_total")) + 1).cast("int"))
            .drop("_rank", "_total"))
