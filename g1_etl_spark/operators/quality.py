"""Data-quality validation operators — declarative "expectations" over a
frame, evaluated in ONE aggregate pass (no per-check scans), plus
referential-integrity checks between tables.

The reference's analog is its per-entity validation counters (the
valid/invalid summary the payload assembler emits; see
entities/assemble.py:69-73 and /root/reference/mmj/etl_import.py) —
this module generalizes that to arbitrary column expectations the way
production pipelines gate data before training runs.

Scale design: `profile` folds every metric into a single groupBy-less
agg — one scan, map-side partial aggregation, a one-row result. RI
checks are left-anti joins keyed on the FK (broadcast when the parent
key set is small; at 100 TB prefer the bloom-prefilter then exact
anti-join). Nothing here ever collects data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-row frame of per-column quality metrics: ``<col>_nulls`` and
    ``<col>_distinct`` for each column, plus ``n_rows``. Single scan."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
    return df.agg(*aggs)


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., n_dup): key tuples appearing more than once."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_dup"))
            .filter(F.col("n_dup") > 1))


def orphans(child: DataFrame, parent: DataFrame,
            fk: str, pk: str) -> DataFrame:
    """Child rows whose FK has no matching parent PK (NULL FKs are not
    orphans — SQL RI semantics)."""
    return (child.filter(F.col(fk).isNotNull())
            .join(parent.select(F.col(pk).alias(fk)).distinct(),
                  fk, "left_anti"))


def expect(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean expectations in one pass.

    Returns one row per check: (check, n_violations, pass) — a row
    FAILS a check when its expression is false or NULL. The whole
    suite is one aggregate over one scan however many checks there are.
    """
    aggs = [
        F.sum(F.when(expr, 0).otherwise(1)).alias(name)
        for name, expr in checks.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({n}, {pairs}) as (check, n_violations)".format(
            n=len(checks),
            pairs=", ".join(f"'{name}', {name}" for name in checks)))
    return stacked.select(
        "check", "n_violations",
        (F.col("n_violations") == 0).alias("pass"))


def key_skew_profile(df: DataFrame, key_col: str,
                     top: int = 20) -> DataFrame:
    """Hot-key diagnosis for a prospective join/groupBy key: the top-N
    heaviest keys with (cnt, share-of-rows, skew_factor = cnt / mean
    rows-per-key, hot_rank). skew_factor >> 1 on the head keys is the
    signal to salt the shuffle or lean on AQE skew-join before running
    the real job — the 100 TB failure mode this catches is one executor
    absorbing a power-law head key while the rest idle.

    Shape: groupBy(key) count (map-side partial agg) feeding a
    TakeOrderedAndProject for the top-N head, plus a second single-
    column census pass reduced to a ONE-row broadcast totals frame.
    The census is aggregated but never globally sorted or collected;
    the deliberate trade is two cheap column-pruned scans over caching
    the full key census (distinct-key-sized — unbounded at 100 TB).
    """
    from pyspark.sql import Window as W

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(F.sum("cnt").alias("_total"),
                        F.count(F.lit(1)).alias("_nkeys"))
    head = counts.orderBy(F.desc("cnt"), F.col(key_col)).limit(top)
    w = W.orderBy(F.desc("cnt"), F.col(key_col))
    return (head.join(F.broadcast(totals))
            .select(F.col(key_col),
                    F.col("cnt"),
                    (F.col("cnt").cast("double") / F.col("_total"))
                    .alias("share"),
                    (F.col("cnt").cast("double") * F.col("_nkeys")
                     / F.col("_total")).alias("skew_factor"))
            .withColumn("hot_rank",
                        F.row_number().over(w).cast("long")))


def observed(df: DataFrame, name: str,
             metrics: dict[str, Column]):
    """(frame, Observation): attach free pipeline telemetry via
    ``df.observe`` — the named aggregate metrics are folded into
    whatever action later consumes the frame, so you count
    rejects/nulls/totals WHILE writing, with zero extra scans
    (``expect``/``profile`` cost one dedicated pass; this costs none).

    After any action on the returned frame, ``observation.get`` yields
    the metrics dict (it blocks until an action ran). The same
    ``observe`` API powers streaming progress metrics — in a
    writeStream the values arrive per-batch in the
    StreamingQueryListener's progress events instead.
    """
    from pyspark.sql import Observation

    ob = Observation(name)
    return df.observe(ob, *[c.alias(n) for n, c in metrics.items()]), ob


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Dataset regression audit between two snapshots of the same
    table: one row per key that was ADDED, REMOVED, or CHANGED (plus
    how many compared columns differ) — unchanged keys emit nothing,
    so the output is delta-sized, not table-sized. The check a
    training-data pipeline runs before promoting a refreshed snapshot.

    Scale shape: ONE full-outer shuffle join on the key (each side
    hashed once); all column comparisons are null-safe equality inside
    the join's projection. No broadcast hint — snapshots are both
    table-sized by definition.
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]
    # presence keys off a constant marker (a data column being null is
    # not absence; only a failed outer-join match leaves the marker null)
    a = old.select(*keys, *[F.col(c).alias(f"_a_{c}") for c in cols],
                   F.lit(1).alias("_a_present"))
    b = new.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in cols],
                   F.lit(1).alias("_b_present"))
    j = a.join(b, keys, "full_outer")
    changed_flags = [
        (~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))).cast("int")
        for c in cols
    ]
    n_changed = sum(changed_flags[1:], changed_flags[0])
    status = (F.when(F.col("_a_present").isNull(), F.lit("added"))
              .when(F.col("_b_present").isNull(), F.lit("removed"))
              .when(n_changed > 0, F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(*keys, "status",
                    F.when(F.col("status") == "changed", n_changed)
                    .cast("long").alias("n_cols_changed")))


def distribution_drift(old: DataFrame, new: DataFrame, value_col: str,
                       n_bins: int = 16) -> DataFrame:
    """Distribution-drift audit between two table snapshots: equi-width
    histogram over the combined value range, per-bin shares from each
    snapshot, and the symmetric chi-square contribution
    (p-q)^2 / (p+q) — the drift statistic is the column sum; per-bin
    rows keep the audit explainable (WHICH part of the distribution
    moved). Chi-square rather than PSI deliberately: PSI's ln() is not
    bit-portable across engines, while this is pure arithmetic —
    divisions and squares per row, no cross-row float sums at all.

    Scale shape: one min/max scalar over both snapshots, one combined
    binning pass with map-side-combined counts (n_bins cells), totals
    folded from the tiny binned frame — two scans of the snapshots
    total, output is n_bins rows.
    """
    # NULLs are excluded up front, not silently binned: F.least skips
    # nulls, so floor(NULL) would otherwise land in the TOP bin
    # (least(n_bins-1, NULL) = n_bins-1) — and engines whose LEAST
    # propagates NULL would diverge. A drift audit over a column with
    # nulls should count them separately (dq_profile covers null
    # rates); here they are out of the distribution by contract, and
    # the oracle carries the same IS NOT NULL.
    tagged = (old.select(F.col(value_col).alias("x"),
                         F.lit(0).alias("is_new"))
              .unionByName(new.select(F.col(value_col).alias("x"),
                                      F.lit(1).alias("is_new")))
              .where(F.col("x").isNotNull()))
    rng = tagged.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / n_bins
    # degenerate range (constant column, e.g. a stuck sensor): width 0
    # makes the bin expression NaN, and the two engines disagree on
    # floor/LEAST over NaN — pin every row to bin 0 explicitly (the
    # oracle carries the same CASE)
    bin_expr = F.when(
        F.col("hi") > F.col("lo"),
        F.least(F.lit(n_bins - 1),
                F.floor((F.col("x") - F.col("lo")) / width))
    ).otherwise(F.lit(0))
    binned = (tagged.join(F.broadcast(rng))
              .select(bin_expr.cast("int").alias("bin"), "is_new")
              .groupBy("bin")
              .agg(F.sum(F.when(F.col("is_new") == 0, 1).otherwise(0))
                   .alias("n_old"),
                   F.sum(F.when(F.col("is_new") == 1, 1).otherwise(0))
                   .alias("n_new")))
    totals = binned.agg(F.sum("n_old").alias("t_old"),
                        F.sum("n_new").alias("t_new"))
    p = F.col("n_old").cast("double") / F.col("t_old")
    q = F.col("n_new").cast("double") / F.col("t_new")
    return (binned.join(F.broadcast(totals))
            .select("bin", "n_old", "n_new",
                    p.alias("p_old"), q.alias("p_new"),
                    ((p - q) * (p - q) / (p + q)).alias("contrib")))


def mad_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                 k: float = 5.0) -> DataFrame:
    """Robust per-group outlier flags via Median Absolute Deviation:
    flag |x - median| > k * MAD, with MAD = median(|x - median|). The
    z-score detector (see features.zscore_per_group) is itself skewed
    by the outliers it hunts — a single huge value inflates the std
    until nothing is 3 sigma out; median/MAD have a 50% breakdown
    point. Zero-MAD groups (over half the values identical) flag any
    deviation at all, the standard convention.

    Scale shape: two tiny per-group quantile aggregates (median, then
    MAD over the deviations), each broadcast back — the fact table is
    scanned twice, never shuffled. The medians are exact interpolated
    percentiles; at truly extreme group sizes swap in
    percentile_approx and keep the same plan shape.
    """
    x = F.col(value_col)
    med = (df.groupBy(*group_cols)
           .agg(F.percentile(value_col, 0.5).alias("grp_median")))
    dev = (df.join(F.broadcast(med), group_cols)
           .withColumn("_adev", F.abs(x - F.col("grp_median"))))
    mad = (dev.groupBy(*group_cols)
           .agg(F.percentile("_adev", 0.5).alias("grp_mad")))
    return (dev.join(F.broadcast(mad), group_cols)
            .select(*df.columns, "grp_median", "grp_mad",
                    F.when(F.col("grp_mad") > 0,
                           F.col("_adev") > k * F.col("grp_mad"))
                    .otherwise(F.col("_adev") > 0)
                    .alias("is_outlier")))
