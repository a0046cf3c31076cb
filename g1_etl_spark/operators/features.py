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


def winsorize_per_group(df: DataFrame, value_col: str,
                        group_cols: list[str],
                        lo: float = 0.05, hi: float = 0.95,
                        out_col: str = "winsorized") -> DataFrame:
    """Adds the group's exact interpolated [lo, hi] quantiles (p_lo,
    p_hi) and the value clipped into that band — the standard outlier
    treatment before z-scoring heavy-tailed features. Same scale shape
    as the other normalizers: tiny per-group stats frame broadcast
    back, the fact table never shuffled. Clip values are copies of the
    quantile doubles, so both engines agree bit-for-bit (proven for
    percentile/quantile_cont by agg_percentiles).
    """
    x = F.col(value_col)
    stats = (df.groupBy(*group_cols)
             .agg(F.percentile(value_col, lo).alias("p_lo"),
                  F.percentile(value_col, hi).alias("p_hi")))
    return (df.join(F.broadcast(stats), group_cols)
            .withColumn(out_col,
                        F.greatest(F.least(x, F.col("p_hi")),
                                   F.col("p_lo"))))


def ols_per_group(df: DataFrame, x_col: str, y_col: str,
                  group_cols: list[str]) -> DataFrame:
    """Per-group simple linear regression y = slope*x + intercept from
    one pass of sufficient statistics — the canonical \"ML at SQL
    scale\" aggregate (regr_slope/regr_intercept/regr_r2 in ANSI SQL):
    all five moment sums are algebraic, so they partial-aggregate
    map-side and merge by addition; no second pass, no residual join.
    Moments use the sorted-sequential-sum trick (see module docstring)
    so the oracle's list_sum(list_sort(...)) folds the identical
    doubles in the identical order. Groups with n < 2 or zero x-
    variance yield NULL slope/intercept/r2 in both engines.
    """
    x, y = F.col(x_col), F.col(y_col)
    base = (df.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).cast("double").alias("n"),
                 _sortsum(x).alias("_sx"), _sortsum(x * x).alias("_sxx"),
                 _sortsum(y).alias("_sy"), _sortsum(y * y).alias("_syy"),
                 _sortsum(x * y).alias("_sxy")))
    n = F.col("n")
    sx, sxx = F.col("_sx"), F.col("_sxx")
    sy, syy, sxy = F.col("_sy"), F.col("_syy"), F.col("_sxy")
    cov_n = n * sxy - sx * sy          # n^2 * covariance
    varx_n = n * sxx - sx * sx         # n^2 * variance(x)
    vary_n = n * syy - sy * sy
    slope = cov_n / varx_n
    ok = (n > 1) & (varx_n > 0)
    return base.select(
        *group_cols, n,
        F.when(ok, slope).alias("slope"),
        F.when(ok, (sy - slope * sx) / n).alias("intercept"),
        F.when(ok & (vary_n > 0),
               cov_n * cov_n / (varx_n * vary_n)).alias("r2"))


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


# quantization scales for the power-iteration sums (see pca_top_component)
_PCA_SU = 1_000_000_000_000   # per-row dot products (64 terms, O(1) each)
_PCA_SW = 1_000_000_000       # per-component sums over all rows
_PCA_SN = 1_000_000_000_000   # norm accumulation over 64 components


def _half_up(y: float) -> int:
    """Driver-side twin of SQL round-half-up for non-negative values."""
    import math
    return int(math.floor(y + 0.5))


def _pca_xc(vec_col: str, mu: list[float]) -> F.Column:
    """Centered vector as one array expression (HOFs, not 64 unrolled
    columns — keeps generated code tiny and IDENTICAL across power
    iterations, so Janino compiles once instead of once per round)."""
    mu_lit = F.array(*[F.lit(m) for m in mu])
    return F.zip_with(F.col(vec_col), mu_lit,
                      lambda x, m: x.cast("double") - m)


def _pca_dot_v(xc_arr: F.Column, v: list[float]) -> F.Column:
    """<xc_row, v> through the exact long accumulation (term order
    free): sum_i round(xc_i * v_i * 1e12) as int64, then /1e12."""
    v_lit = F.array(*[F.lit(x) for x in v])
    terms = F.zip_with(xc_arr, v_lit,
                       lambda x, vv: F.round(x * vv * _PCA_SU)
                       .cast("long"))
    return (F.aggregate(terms, F.lit(0).cast("long"),
                        lambda a, b: a + b).cast("double") / _PCA_SU)


def pca_power_direction(df: DataFrame, vec_col: str = "embedding",
                        dim: int = 64, iters: int = 6,
                        return_frame: bool = False):
    """(mu, v, n): centering means, unit principal direction after
    `iters` power-iteration rounds, and the row count — the bounded
    driver-state model artifact (see pca_top_component for the
    exactness and scale discussion). With ``return_frame=True``
    returns (mu, v, n, frame): the repartitioned+checkpointed input,
    so consumers (pca_project) project from the materialized frame
    instead of rescanning the source — a small parquet file scans as
    ONE task and would serialize the final projection otherwise."""
    # spread + materialize once: a small parquet file scans as ONE task,
    # which would serialize every iteration's (interpreted-HOF) matvec;
    # the checkpoint also stops each round re-reading the source.
    # Order-free integer sums make the repartition value-neutral.
    spread = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(spread).localCheckpoint(eager=True)
    cast_arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mu_rows = (df.select(cast_arr.alias("_xd"))
               .select(F.posexplode("_xd").alias("i", "x"))
               .groupBy("i")
               .agg(F.sum(F.round(F.col("x") * _PCA_SW).cast("long"))
                    .alias("mq"),
                    F.count(F.lit(1)).alias("n"))
               .collect())
    if not mu_rows:
        raise ValueError("pca_power_direction: empty input corpus")
    # ragged guard: every component index must appear with the SAME
    # count (a short vector drops out of high components and would
    # silently skew their means), and no vector may be longer than dim
    # (mu[i] below would raise IndexError mid-collect otherwise)
    over = sorted(r["i"] for r in mu_rows if r["i"] >= dim)
    if over:
        raise ValueError(
            f"pca_power_direction: vectors longer than dim={dim} "
            f"(component indexes {over[:5]}...)")
    counts = {r["n"] for r in mu_rows}
    if len(counts) != 1 or len(mu_rows) != dim:
        raise ValueError(
            f"pca_power_direction: ragged {vec_col} — expected every "
            f"row to carry exactly dim={dim} components, saw "
            f"{len(mu_rows)} components with counts {sorted(counts)}")
    n = mu_rows[0]["n"]
    mu = [0.0] * dim
    for r in mu_rows:
        # float() FIRST: the oracle computes CAST(sum AS DOUBLE)/scale,
        # i.e. long->double rounding before the divide; python int/int
        # true division rounds only once and diverges by 1 ulp past
        # 2^53 (scaled sums reach that at ~9e6 rows)
        mu[r["i"]] = (float(r["mq"]) / _PCA_SW) / n
    v = [1.0 / dim ** 0.5] * dim
    for _ in range(iters):
        xc = _pca_xc(vec_col, mu)
        # one narrow explode + 64-key aggregate (map-side partials
        # collapse each task to 64 rows before the exchange); u and xc
        # are projected below the generate so the exploded rows carry
        # attribute references, not re-evaluated HOF trees (Catalyst
        # may still collapse the projection — the hot-path win above
        # came from the spread+checkpoint, measured 31s -> ~3s warm
        # at sf0.1)
        pre = df.select(_pca_dot_v(xc, v).alias("u"), xc.alias("_xc"))
        w_rows = (pre.select("u", F.posexplode("_xc").alias("i", "xv"))
                  .groupBy("i")
                  .agg(F.sum(F.round(F.col("xv") * F.col("u") * _PCA_SW)
                             .cast("long")).alias("wq"))
                  .collect())
        # pre-scale by N before normalizing (direction-invariant):
        # keeps the norm accumulator O(dim * 1e14) regardless of corpus
        # size instead of overflowing int64 at |w| ~ N
        wn = [0.0] * dim
        for r in w_rows:
            wn[r["i"]] = (float(r["wq"]) / _PCA_SW) / n  # cast-first, see mu
        norm = (float(sum(_half_up(wi * wi * _PCA_SN) for wi in wn))
                / _PCA_SN) ** 0.5  # cast-first, see mu
        v = [wi / norm for wi in wn]
    if return_frame:
        return mu, v, n, df
    return mu, v, n


def pca_project(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", dim: int = 64,
                iters: int = 6) -> DataFrame:
    """(id, score): every vector's projection onto the learned
    principal direction — the distributed consumer of the power
    iteration (this is what feeds whitening / outlier trims /
    curriculum sorts downstream). One narrow scan; the direction rides
    along as 64 literals."""
    mu, v, _, frame = pca_power_direction(df, vec_col, dim, iters,
                                          return_frame=True)
    xc = _pca_xc(vec_col, mu)
    # project from the checkpointed frame the trainer already built —
    # one source scan total, not one per phase
    return frame.select(F.col(id_col),
                        _pca_dot_v(xc, v).alias("score"))


def pca_top_component(df: DataFrame, vec_col: str = "embedding",
                      dim: int = 64, iters: int = 6) -> DataFrame:
    """Distributed PCA, dominant component, by power iteration on the
    centered Gram matrix: v_{k+1} = normalize(Xc^T (Xc v_k)), v_0
    uniform. Returns (idx, loading) — the unit principal direction.

    Engine-exactness: every sum that crosses rows or components goes
    through the scaled-long idiom (per-row dots at 1e12, component
    sums at 1e9, the norm at 1e12), and the remaining ops (subtract,
    multiply, divide, sqrt) are IEEE-deterministic — so the whole
    iteration is bit-identical in any engine and the DuckDB twin can
    unroll it as chained CTEs, like PageRank and the BPE trainer.

    Scale shape: centering means and the per-iteration matvecs are
    single-pass aggregations over the corpus (64 partial sums per
    task, map-side combined); the 64-float direction vector is driver
    state (same bounded-metadata class as k-means centroids), rebound
    as literals each round, so no iteration ever shuffles the corpus —
    each is one scan + one 64-column reduce. Driver-side divisions cast
    the long sums to double FIRST (mirroring the oracle's CAST) so
    exactness holds past 2^53-sized sums; rescale _PCA_SW beyond
    ~1e8 rows to keep the int64 accumulators in range.
    """
    _, v, _n = pca_power_direction(df, vec_col, dim, iters)
    return df.sparkSession.createDataFrame(
        [(i + 1, v[i]) for i in range(dim)],
        "idx int, loading double")


def whiten_per_group(df: DataFrame, group_col: str = "label",
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     eps: float = 1e-6) -> DataFrame:
    """Per-group ZCA whitening of embedding vectors — the grouped-map
    (applyInPandas) member of the UDF surface: each group's covariance
    eigendecomposition is genuine per-group linear algebra that no
    Column-expression composition reaches (which is exactly when the
    grouped-map path is warranted; everything cheaper in this repo
    stays in codegen'd expressions). W = U diag(1/sqrt(l+eps)) U^T on
    the centered group matrix; groups larger than memory don't fit this
    pattern — shard them upstream or fall back to the global PCA path.

    Eigendecomposition is numerically engine-specific, so this operator
    is unit-tested (output covariance ~ I) rather than oracle-hashed.
    """
    import numpy as np
    import pandas as pd  # noqa: F401 — applyInPandas contract

    def _whiten(pdf):
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xc = X - X.mean(axis=0, keepdims=True)
        cov = (Xc.T @ Xc) / max(len(Xc) - 1, 1)
        lam, U = np.linalg.eigh(cov)
        W = U @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)) @ U.T
        out = Xc @ W
        return pdf[[group_col, id_col]].assign(
            whitened=[r.tolist() for r in out])

    # carry the ACTUAL input types for the passthrough columns — a
    # string group key (e.g. lang) must not be redeclared as int
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = (f"{group_col} {in_types[group_col]}, "
              f"{id_col} {in_types[id_col]}, whitened array<double>")
    return df.groupBy(group_col).applyInPandas(_whiten, schema)
