"""Unit tests for operators/merge (oracle parity for the registered
query runs in test_oracle_parity.py)."""

from __future__ import annotations

from g1_etl_spark.operators.merge import merge_scd1, upsert


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "amt"])


def test_upsert_update_insert_passthrough(spark):
    upd = spark.createDataFrame(
        [(2, "B2", 99.0), (4, "d", 40.0)], ["k", "name", "amt"])
    got = {r["k"]: (r["name"], r["amt"])
           for r in upsert(_base(spark), upd, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 99.0),
                   3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_plan_broadcasts_and_skips_base_shuffle(spark):
    upd = spark.createDataFrame([(2, "B2", 99.0)], ["k", "name", "amt"])
    plan = (upsert(_base(spark), upd, ["k"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_merge_scd1_partial_columns(spark):
    # NULL amt on k=2 keeps the old value; k=4 inserts with NULL name
    upd = spark.createDataFrame(
        [(2, "B2", None), (4, None, 40.0)], ["k", "name", "amt"])
    got = {r["k"]: (r["name"], r["amt"])
           for r in merge_scd1(_base(spark), upd, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 20.0),
                   3: ("c", 30.0), 4: (None, 40.0)}


def test_merge_partial_aggregates_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.operators.merge import merge_partial_aggregates

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    spec = {"n": "count", "s": "sum", "lo": "min", "hi": "max"}

    def rollup(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("lo"), F.max("v").alias("hi"))

    base, delta = df.filter("v < 600"), df.filter("v >= 600")
    merged = merge_partial_aggregates(
        rollup(base), rollup(delta), ["k"], spec)
    full = rollup(df)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, full.collect()))
    # keys present only in the delta still appear (group 'new' regions)
    only_delta = merge_partial_aggregates(
        rollup(base.filter("k < 3")), rollup(delta), ["k"], spec)
    assert only_delta.filter("k >= 3").count() == 4


def test_incremental_join_delta_equivalence(spark):
    """base⋈base plus the three delta terms must equal the full join
    of the unioned tables — the delta rule's defining identity."""
    from g1_etl_spark.operators.merge import incremental_join_delta

    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, va string")
    da = spark.createDataFrame([(2, "a2b"), (3, "a3")], "k long, va string")
    b = spark.createDataFrame([(1, "b1"), (3, "b3")], "k long, vb string")
    db = spark.createDataFrame([(2, "b2"), (3, "b3b")], "k long, vb string")

    delta = incremental_join_delta(a, da, b, db, on="k")
    incremental = sorted(map(tuple, a.join(b, "k").unionByName(delta)
                             .collect()))
    full = sorted(map(tuple,
                      a.unionByName(da).join(b.unionByName(db), "k")
                      .collect()))
    # k=1: 1x1, k=2: 2 a-side rows x 1, k=3: 1 x 2 b-side rows
    assert incremental == full and len(full) == 5
