"""asof_join / range_join unit semantics: tie inclusivity, direction,
missing matches, bucket boundaries."""

from __future__ import annotations

import datetime

from g1_etl_spark.operators.temporal import asof_join, range_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (1, _ts(5), "early"),
         (2, _ts(30), "c"), (3, _ts(30), "nomatch")],
        "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(25), 250.0)],
        "k long, ts timestamp, v double")
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    out = {r["tag"]: r for r in
           asof_join(left, right, on="k").collect()}
    assert out["a"]["r_v"] == 100.0          # tie: rt == lt matches
    assert out["b"]["r_v"] == 150.0          # latest at-or-before
    assert out["early"]["r_v"] is None       # nothing before
    assert out["c"]["r_v"] == 250.0
    assert out["nomatch"]["r_v"] is None     # key absent on right
    assert out["b"]["r_ts"] == _ts(15)


def test_asof_forward_semantics(spark):
    left, right = _frames(spark)
    out = {r["tag"]: r for r in
           asof_join(left, right, on="k", direction="forward").collect()}
    assert out["a"]["r_v"] == 100.0          # tie matches forward too
    assert out["early"]["r_v"] == 100.0      # next at-or-after
    assert out["b"]["r_v"] is None           # nothing after 20 for k=1
    assert out["c"]["r_v"] is None


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts(0), "on_start"), (1, _ts(14), "inside"),
         (1, _ts(15), "on_end"), (1, _ts(16), "after"),
         (2, _ts(5), "other_key")],
        "k long, ts timestamp, tag string")
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(15))], "k long, start_ts timestamp, end_ts timestamp")
    got = {r["tag"] for r in
           range_join(points, intervals, on="k",
                      bucket="5 minutes").collect()}
    assert got == {"on_start", "inside"}  # [start, end) and key-scoped


def test_range_join_interval_longer_than_bucket(spark):
    """Intervals spanning many buckets still match every inner point."""
    points = spark.createDataFrame(
        [(1, _ts(m), f"p{m}") for m in range(0, 50, 7)],
        "k long, ts timestamp, tag string")
    intervals = spark.createDataFrame(
        [(1, _ts(3), _ts(45))], "k long, start_ts timestamp, end_ts timestamp")
    got = {r["tag"] for r in
           range_join(points, intervals, on="k", bucket="5 minutes").collect()}
    assert got == {f"p{m}" for m in range(0, 50, 7) if 3 <= m < 45}


def test_scd2_collapses_consecutive_and_closes_intervals(spark):
    from g1_etl_spark.operators.temporal import scd2_intervals

    rows = [
        # key 1: A A B A -> three intervals (the repeat A collapses)
        (1, 10, "A", 100), (1, 20, "A", 101), (1, 30, "B", 102),
        (1, 40, "A", 103),
        # key 2: single state -> one open interval
        (2, 15, "X", 200),
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "state", "eid"])
    out = sorted(
        ((r["k"], r["state"], r["valid_from"], r["valid_to"],
          r["is_current"]) for r in
         scd2_intervals(df, "k", "ts", "state", "eid").collect()))
    assert out == [
        (1, "A", 10, 30, False),
        (1, "A", 40, None, True),
        (1, "B", 30, 40, False),
        (2, "X", 15, None, True),
    ]


def test_scd2_same_ts_ties_deterministic(spark):
    from g1_etl_spark.operators.temporal import scd2_intervals

    rows = [(1, 10, "A", 2), (1, 10, "B", 1)]  # same ts, tie on eid
    df = spark.createDataFrame(rows, ["k", "ts", "state", "eid"])
    out = sorted(
        ((r["state"], r["valid_to"] is None) for r in
         scd2_intervals(df, "k", "ts", "state", "eid").collect()))
    # eid=1 (B) sorts first, A closes it -> A is current
    assert out == [("A", True), ("B", False)]


def test_hll_sketch_rollup_accuracy(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.operators.temporal import hll_sketch_rollup

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    est = {(r["event_type"], r["window_start"]): r["approx_users"]
           for r in hll_sketch_rollup(ev).collect()}
    exact = {(r["event_type"], r["w"]["start"]): r["n"] for r in
             ev.groupBy("event_type", F.window(
                 F.date_trunc("day", "ts"), "1 week").alias("w"))
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for k, v in exact.items():
        # default HLL lgConfigK=12 -> ~1.6% relative error; allow 5%
        assert abs(est[k] - v) <= max(2, 0.05 * v), (k, est[k], v)


def test_interval_overlap_pairs_vs_naive(spark):
    import datetime as dt
    import itertools

    from g1_etl_spark.operators.temporal import interval_overlap_pairs

    d = dt.date
    rows = [
        # key 1: chain of overlapping + one disjoint; spans bucket edges
        (1, 1, d(2024, 1, 1), d(2024, 1, 10)),
        (1, 2, d(2024, 1, 9), d(2024, 1, 20)),   # overlaps 1 by 1 day
        (1, 3, d(2024, 1, 10), d(2024, 1, 12)),  # touches 1 (no overlap)
        (1, 4, d(2024, 3, 1), d(2024, 3, 5)),    # disjoint
        # key 2: long interval spanning many buckets overlaps short one
        (2, 5, d(2024, 1, 1), d(2024, 2, 15)),
        (2, 6, d(2024, 2, 10), d(2024, 2, 11)),
        # key separation: same dates as key 1 but different key
        (3, 7, d(2024, 1, 1), d(2024, 1, 10)),
    ]
    df = spark.createDataFrame(rows, ["k", "id", "s", "e"])
    got = sorted((r["k"], r["id_a"], r["id_b"], r["overlap_days"])
                 for r in interval_overlap_pairs(
                     df, "k", "id", "s", "e", bucket_days=7).collect())
    # naive reference: all same-key pairs with s<e overlap (half-open)
    want = sorted(
        (a[0], a[1], b[1], (min(a[3], b[3]) - max(a[2], b[2])).days)
        for a, b in itertools.combinations(rows, 2)
        if a[0] == b[0] and a[2] < b[3] and b[2] < a[3])
    assert got == want
    # the 1-day overlap and the cross-bucket long-interval pair made it
    assert (1, 1, 2, 1) in got and (2, 5, 6, 1) in got


def test_session_documents_assembly(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.operators.temporal import session_documents

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = session_documents(ev).collect()
    assert out
    for r in out:
        toks = r["doc"].split(" ")
        assert len(toks) == r["n_events"], "doc must hold one token per event"
        assert r["duration_us"] >= 0
    # session count matches the sessionization operator's split
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("us", "event_id")
    base = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    gap = F.col("us") - F.lag("us").over(w)
    n_sessions = (base.withColumn("n", F.when(gap > 1800 * 1_000_000, 1)
                                  .otherwise(0))
                  .groupBy("user_id").agg((F.sum("n") + 1).alias("k"))
                  .agg(F.sum("k")).collect()[0][0])
    assert len(out) == n_sessions


def test_histogram_percentile_rollup_bounds(spark):
    from pyspark.sql import functions as F

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.operators.temporal import histogram_percentile_rollup

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    roll = histogram_percentile_rollup(ev).collect()
    assert roll
    # merged totals must equal raw per-(type, week) counts — the merge
    # lost nothing
    want = {(r["event_type"], r["w"]["start"]): r["n"] for r in
            ev.groupBy("event_type",
                       F.window(F.date_trunc("day", "ts"), "1 week")
                       .alias("w"))
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in roll:
        assert r["p_hi"] - r["p_lo"] == 10.0
        assert want[(r["event_type"], r["window_start"])] == r["n_rows"]
    # exactly one estimate row per (type, week)
    keys = [(r["event_type"], r["window_start"]) for r in roll]
    assert len(keys) == len(set(keys)) == len(want)


def test_hll_intersection_contract_on_engineered_overlap(spark):
    """Partial/disjoint overlaps (unlike the all-overlap sf corpus):
    inclusion-exclusion must land within the contract bound, and pairs
    with an empty exact intersection must not appear."""
    import datetime

    from g1_etl_spark.plans import REGISTRY

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    # A: users 0..99; B: users 50..149 (overlap 50); C: users 200..219
    # (disjoint from both)
    for u in range(100):
        rows.append((len(rows), t0, u, "A", 1.0, "{}"))
    for u in range(50, 150):
        rows.append((len(rows), t0, u, "B", 1.0, "{}"))
    for u in range(200, 220):
        rows.append((len(rows), t0, u, "C", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, "
              "event_type STRING, value DOUBLE, props STRING")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {(r.type_a, r.type_b): r
               for r in REGISTRY["events_hll_intersection"]
               .fn(spark, d).collect()}
    assert set(out) == {("A", "B")}  # C-pairs have empty intersections
    r = out[("A", "B")]
    assert r.exact_both == 50 and r.exact_union == 150 and r.err_ok


def test_twap_constant_series_equals_value_and_bounds(spark):
    """TWAP of a constant series is the constant regardless of
    spacing; for any series it lies within [min, max] of the values."""
    from g1_etl_spark.plans import REGISTRY
    import pyspark.sql.functions as F

    rows = [(i, _ts(m), 7, "view", 42.5, "{}")
            for i, m in enumerate([0, 1, 5, 6, 30])]
    rows += [(10 + i, _ts(m), 9, "view", float(v), "{}")
             for i, (m, v) in enumerate([(0, 10), (2, 30), (3, 20),
                                         (10, 50)])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.createOrReplaceTempView("_twap_ev")
    # reuse the registered plan's logic by pointing it at a temp table
    # is not possible (it loads parquet), so restate the operator shape
    w = __import__("pyspark.sql", fromlist=["Window"]).Window \
        .partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    seg = (df.select("user_id", "value", t.alias("t_us"),
                     F.lead(t).over(w).alias("nxt_us"))
           .filter(F.col("nxt_us").isNotNull())
           .withColumn("dt", (F.col("nxt_us") - F.col("t_us"))
                       .cast("double") / 1e6))
    out = (seg.groupBy("user_id")
           .agg((F.sum(F.col("value") * F.col("dt"))
                 / F.sum("dt")).alias("twap")).collect())
    got = {r.user_id: r.twap for r in out}
    assert abs(got[7] - 42.5) < 1e-9
    assert 10.0 <= got[9] <= 50.0
    # hand-check user 9: segments (10,2min),(30,1min),(20,7min)
    expect = (10 * 120 + 30 * 60 + 20 * 420) / 600
    assert abs(got[9] - expect) < 1e-9


def test_attribution_conserves_conversions(spark):
    """Every purchase lands in exactly one channel bucket ('none' when
    no prior touch), and a purchase never self-attributes."""
    from pyspark.sql import Window as W
    import pyspark.sql.functions as F

    rows = [
        (1, _ts(0), 1, "click", 0.0, "{}"),
        (2, _ts(1), 1, "purchase", 10.0, "{}"),   # -> click
        (3, _ts(2), 1, "purchase", 5.0, "{}"),    # still click
        (4, _ts(0), 2, "purchase", 7.0, "{}"),    # cold -> none
        (5, _ts(1), 2, "error", 0.0, "{}"),       # error is not a touch
        (6, _ts(2), 2, "purchase", 3.0, "{}"),    # still none
        (7, _ts(0), 3, "view", 0.0, "{}"),
        (8, _ts(1), 3, "signup", 0.0, "{}"),
        (9, _ts(2), 3, "purchase", 1.0, "{}"),    # last touch: signup
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    touch = F.when(F.col("event_type").isin("click", "view", "signup"),
                   F.col("event_type"))
    conv = (df.select("user_id", "event_type", "value",
                      F.last(touch, ignorenulls=True).over(w)
                      .alias("channel"))
            .filter(F.col("event_type") == "purchase")
            .select(F.coalesce("channel", F.lit("none")).alias("channel"),
                    "value"))
    got = {r.channel: (r.n, r.rev) for r in
           conv.groupBy("channel")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev"))
           .collect()}
    assert got == {"click": (2, 15.0), "none": (2, 10.0),
                   "signup": (1, 1.0)}
    assert sum(n for n, _ in got.values()) == 5


def test_markov_stationary_is_a_distribution_and_near_fixed(spark):
    """The 10-iteration result sums to ~1 and one more application of
    the transition matrix moves it by < 1e-3 total variation — i.e.
    the power iteration actually converged on the driver data."""
    from pyspark.sql import functions as F
    from g1_etl_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    dist = {r.state: r.stationary_p
            for r in REGISTRY["events_markov_stationary"]
            .fn(spark, sf).collect()}
    assert abs(sum(dist.values()) - 1.0) < 1e-6
    from g1_etl_spark.catalog import load_table
    from pyspark.sql import Window as W
    ev = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("i"),
                       F.lead("event_type").over(w).alias("j"))
             .filter(F.col("j").isNotNull()))
    mat = {(r.i, r.j): r.c for r in
           pairs.groupBy("i", "j").agg(F.count(F.lit(1)).alias("c"))
           .collect()}
    tot = {i: sum(c for (a, _), c in mat.items() if a == i)
           for i in dist}
    nxt = {j: sum(dist[i] * mat.get((i, j), 0) / tot[i] for i in dist)
           for j in dist}
    tv = 0.5 * sum(abs(nxt[s] - dist[s]) for s in dist)
    assert tv < 1e-3
