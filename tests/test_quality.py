"""Unit tests for operators/quality (registered queries get oracle
parity via test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from g1_etl_spark.operators import quality as Q


def test_profile_counts_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["k", "v"])
    row = Q.profile(df, ["v"]).first()
    assert (row["n_rows"], row["v_nulls"], row["v_distinct"]) == (4, 1, 2)


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w"), (3, "v"), (3, "u")],
        ["k", "v"])
    got = {r["k"]: r["n_dup"] for r in Q.duplicate_keys(df, ["k"]).collect()}
    assert got == {1: 2, 3: 3}


def test_orphans_ignore_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], ["id", "fk"])
    parent = spark.createDataFrame([(10,)], ["pk"])
    got = [r["id"] for r in Q.orphans(child, parent, "fk", "pk").collect()]
    assert got == [2]  # null FK is not an orphan


def test_expect_null_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], ["k", "x"])
    rows = {r["check"]: (r["n_violations"], r["pass"])
            for r in Q.expect(df, {
                "x_positive": F.col("x") > 0,
                "k_not_null": F.col("k").isNotNull(),
            }).collect()}
    assert rows["x_positive"] == (2, False)  # -1 and NULL both fail
    assert rows["k_not_null"] == (0, True)


def test_observed_metrics_free_telemetry(spark, tmp_path):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.quality import observed

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        .alias("v"))
    obs, ob = observed(df, "writeside", {
        "n_rows": F.count(F.lit(1)),
        "n_null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
        "sum_id": F.sum("id"),
    })
    # the consuming action is a WRITE — metrics ride along with it
    obs.write.format("noop").mode("overwrite").save()
    assert ob.get == {"n_rows": 1000, "n_null_v": 100,
                      "sum_id": 999 * 1000 // 2}


def test_snapshot_diff_classifies(spark):
    from g1_etl_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),            # unchanged -> absent from output
         (2, "B", 25.0),            # changed (2 cols)
         (4, "d", 40.0)],           # added; 3 removed
        "k long, s string, v double")
    got = {r["k"]: (r["status"], r["n_cols_changed"])
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: ("changed", 2), 3: ("removed", None),
                   4: ("added", None)}
    # null-vs-value counts as a change, null-vs-null does not
    old2 = spark.createDataFrame([(1, None)], "k long, v double")
    new2 = spark.createDataFrame([(1, 5.0)], "k long, v double")
    rows = snapshot_diff(old2, new2, ["k"]).collect()
    assert [(r["status"], r["n_cols_changed"]) for r in rows] \
        == [("changed", 1)]


def test_distribution_drift_identical_snapshots_zero(spark):
    from g1_etl_spark.operators.quality import distribution_drift

    d = spark.createDataFrame([(float(i),) for i in range(100)],
                              "x double")
    rows = distribution_drift(d, d, "x", n_bins=8).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_old"] == r["n_new"]
        assert r["contrib"] == 0.0


def test_distribution_drift_shift_localizes(spark):
    """Old uniform on [0,100), new uniform on [100,200): every bin is
    fully one-sided, so each contrib is (p-q)^2/(p+q) = p or q."""
    from g1_etl_spark.operators.quality import distribution_drift

    old = spark.createDataFrame([(float(i),) for i in range(100)],
                                "x double")
    new = spark.createDataFrame([(float(i + 100),) for i in range(100)],
                                "x double")
    rows = {r["bin"]: r for r in
            distribution_drift(old, new, "x", n_bins=4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0]["n_new"] == 0 and rows[3]["n_old"] == 0
    total = sum(r["contrib"] for r in rows.values())
    assert abs(total - 2.0) < 1e-12  # full separation: sum p + sum q


def test_distribution_drift_constant_column_pins_bin0(spark):
    """Degenerate range (stuck sensor): every row must land in bin 0
    with zero drift, not NaN-binned garbage."""
    from g1_etl_spark.operators.quality import distribution_drift

    d = spark.createDataFrame([(42.0,)] * 10, "x double")
    rows = distribution_drift(d, d, "x", n_bins=8).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0
    assert rows[0]["n_old"] == 10 and rows[0]["contrib"] == 0.0


def test_mad_outliers_flags_planted_and_resists_masking(spark):
    """One huge value is flagged by MAD but would survive a 3-sigma
    z-test (it inflates the std it's measured against) — the masking
    case the robust detector exists for. Zero-MAD groups flag any
    deviation."""
    from g1_etl_spark.operators.quality import mad_outliers

    base = [("g", float(v)) for v in range(1, 22)]   # 1..21, median 11
    # three co-conspiring outliers: each inflates the std the others
    # are measured against (a single one always sits at z ~ sqrt(n))
    planted = [("g", 1e6), ("g", 1.1e6), ("g", 0.9e6)]
    df = spark.createDataFrame(base + planted + [("z", 5.0)] * 9
                               + [("z", 6.0)],
                               "grp STRING, x DOUBLE")
    got = {(r.grp, r.x): r.is_outlier
           for r in mad_outliers(df, "x", ["grp"], k=5.0).collect()}
    assert all(got[p] is True for p in planted)
    assert all(not got[("g", float(v))] for v in range(1, 22))
    # z-score masking check: none of the planted points is 3 sigma out
    import statistics
    vals = [v for _, v in base + planted]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert all((v - mu) / sd < 3.0 for _, v in planted)
    # zero-MAD group: majority value 5.0 -> MAD 0; the lone 6.0 flags
    assert got[("z", 6.0)] is True and got[("z", 5.0)] is False
