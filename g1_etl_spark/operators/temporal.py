"""Temporal join operators Spark lacks natively: as-of join and
range (interval) join — superset surface for event-stream analytics
(no reference analog; DuckDB's native ASOF JOIN provides the oracle).

Both are compositions of built-in DataFrame ops with one shuffle on the
equi-key — no O(|L|·|R|) stage:

  asof_join    union the two sides, sort within each key partition by
               (ts, side), carry the last-seen right row forward with
               last(ignorenulls) — each left row picks up the latest
               right row at-or-before it. One window pass; at 100 TB
               this is a single hash shuffle on the join key.
  range_join   points join intervals through time buckets: intervals
               explode to the buckets they cover, points join their own
               bucket, the exact BETWEEN predicate filters inside the
               bucket. Join fan-out is bounded by interval_len/bucket
               instead of |points|·|intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_prefix: str = "r_",
              direction: str = "backward") -> DataFrame:
    """Left as-of join: each left row gains the closest right row
    at-or-before (backward) / at-or-after (forward) its timestamp,
    per `on` key. Left rows with no match keep NULLs.

    Ties: a right row at exactly the left timestamp matches (inclusive),
    which requires the right row to sort before (backward) / after
    (forward) left rows at equal timestamps — encoded in `_side`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    r_cols = [c for c in right.columns if c != on]
    payload = F.struct(*[F.col(c) for c in r_cols])

    backward = direction == "backward"
    l_tagged = left.select(
        F.col(on), F.col(left_ts).alias("_t"),
        F.lit(1 if backward else 0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(payload.alias("_r")).schema["_r"].dataType)
        .alias("_r"))
    r_tagged = right.select(
        F.col(on), F.col(right_ts).alias("_t"),
        F.lit(0 if backward else 1).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])
                        .alias("_l")).schema["_l"].dataType).alias("_l"),
        payload.alias("_r"))

    unioned = l_tagged.unionByName(r_tagged)
    if backward:
        w = (W.partitionBy(on).orderBy("_t", "_side")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        w = (W.partitionBy(on).orderBy("_t", "_side")
             .rowsBetween(W.currentRow, W.unboundedFollowing))
        matched = F.first("_r", ignorenulls=True).over(w)

    out = (unioned.withColumn("_m", matched)
           .filter(F.col("_l").isNotNull()))
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in r_cols]
    return out.select(*sel)


def range_join(points: DataFrame, intervals: DataFrame, on: str,
               point_ts: str = "ts", start_col: str = "start_ts",
               end_col: str = "end_ts",
               bucket: str = "15 minutes") -> DataFrame:
    """Inner join of points to the intervals containing them
    (start <= t < end), per `on` key, bucketed so the join is an
    equi-join on (key, time bucket) — never a cross product.

    `bucket` should be >= the typical interval length: an interval
    explodes to ceil(len/bucket)+1 bucket rows; each point joins
    exactly its own bucket.
    """
    unit_us = {"second": 1_000_000, "seconds": 1_000_000,
               "minute": 60_000_000, "minutes": 60_000_000,
               "hour": 3_600_000_000, "hours": 3_600_000_000}
    qty, unit = bucket.split()
    step = int(qty) * unit_us[unit.lower()]

    # integer `div`: epoch micros (~1.7e18) exceed double's 2^53 exact
    # range, so a float divide could misassign bucket boundaries
    iv = intervals.select(
        "*",
        F.explode(F.sequence(
            F.expr(f"unix_micros({start_col}) div {step}"),
            F.expr(f"unix_micros({end_col}) div {step}"),
        )).alias("_bk"))
    pt = points.select(
        "*", F.expr(f"unix_micros({point_ts}) div {step}").alias("_bk"))
    return (pt.join(iv, [on, "_bk"])
            .filter((F.col(point_ts) >= F.col(start_col))
                    & (F.col(point_ts) < F.col(end_col)))
            .drop("_bk"))


def scd2_intervals(updates: DataFrame, key_col: str, ts_col: str,
                   state_col: str, tie_col: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log:
    collapse consecutive identical states per key, emit one validity
    interval per real change — (key, state, valid_from, valid_to,
    is_current), half-open [valid_from, valid_to).

    Classic warehouse ETL the reference's update flows imply but never
    materialize (mmj/etl_import.py re-imports full snapshots).

    Two window passes over ONE hash partitioning on the key: pass 1
    drops rows whose state equals the previous row's (lag), pass 2
    closes each surviving interval with the next change's timestamp
    (lead). Sort order is (ts, tie) so same-timestamp updates resolve
    identically in any engine. At scale this is a single shuffle;
    both windows reuse the same exchange.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, tie_col)
    changes = (updates
               .withColumn("_prev", F.lag(state_col).over(w))
               .filter(F.col("_prev").isNull()
                       | (F.col(state_col) != F.col("_prev"))))
    w2 = W.partitionBy(key_col).orderBy(ts_col, tie_col)
    return (changes
            .select(key_col, state_col,
                    F.col(ts_col).alias("valid_from"),
                    F.lead(ts_col).over(w2).alias("valid_to"))
            .withColumn("is_current", F.col("valid_to").isNull()))


def hll_sketch_rollup(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "user_id",
                      group_col: str = "event_type",
                      fine: str = "1 day",
                      coarse: str = "1 week") -> DataFrame:
    """(group, window_start, n_fine_buckets, approx_users): mergeable
    HLL-sketch pre-aggregation — THE pattern for distinct-counting at
    100 TB. COUNT(DISTINCT) over a month cannot reuse daily results
    (distinct doesn't add), but HLL sketches union losslessly: sketch
    once per (group, day) at ingest, then any coarser rollup (week,
    month, arbitrary range) is a cheap merge of the tiny fixed-size
    sketch blobs — no rescan of the raw events.

    Stage 1 groups by (group, fine window) building binary sketches
    (map-side partial merge keeps the shuffle at sketch-count rows);
    stage 2 re-windows the fine starts into the coarse bucket and
    merges with hll_union_agg. Estimates are deterministic for fixed
    input (HLL is a pure hash construction) but engine-specific, so the
    driver records a rows-only check; tests assert the estimate lands
    within HLL error bounds of the exact count.
    """
    fine_b = (events.groupBy(
        F.col(group_col), F.window(ts_col, fine).alias("_fw"))
        .agg(F.hll_sketch_agg(key_col).alias("_sk")))
    return (fine_b.groupBy(
        F.col(group_col),
        F.window(F.col("_fw.start"), coarse).alias("_cw"))
        .agg(F.count(F.lit(1)).alias("n_fine_buckets"),
             F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk")))
             .alias("approx_users"))
        .select(group_col, F.col("_cw.start").alias("window_start"),
                "n_fine_buckets", "approx_users"))


def interval_overlap_pairs(df: DataFrame, key_col: str, id_col: str,
                           start_col: str, end_col: str,
                           bucket_days: int = 7) -> DataFrame:
    """(key, id_a, id_b, overlap_days): same-key pairs of half-open date
    intervals [start, end) that overlap — the interval×interval join
    primitive (conflicting bookings, concurrent sessions, overlapping
    validity ranges) that neither equi-join nor as-of join expresses.

    A naive theta-join (key equality + range predicates) degenerates to
    a per-key cross join. Instead each interval explodes into the
    bucket_days-wide epoch buckets it covers, candidates meet via an
    EQUI-join on (key, bucket) — shuffle-partitionable, Catalyst picks
    a hash join — and the exact overlap predicate filters candidates
    before a distinct on (key, id_a, id_b) collapses multi-bucket
    meetings. Bucket width tunes candidate fan-out: ~the typical
    interval length, so each interval lands in O(1) buckets while
    buckets stay narrow enough to keep per-(key, bucket) groups small.
    Long-interval skew (one interval covering thousands of buckets) is
    the knob to watch at scale — cap explode width by splitting
    outliers into a separate broadcast pass, as with max_df in
    ngram_jaccard_pairs.
    """
    epoch = F.datediff(F.col("_s"), F.lit("1970-01-01").cast("date"))
    epoch_e = F.datediff(F.col("_e"), F.lit("1970-01-01").cast("date"))
    first_b = F.floor(epoch / bucket_days).cast("long")
    last_b = F.floor((epoch_e - 1) / bucket_days).cast("long")
    base = df.select(
        F.col(key_col).alias("_k"), F.col(id_col).alias("_id"),
        F.col(start_col).alias("_s"), F.col(end_col).alias("_e"))
    bucketed = base.select(
        "_k", "_id", "_s", "_e",
        F.explode(F.sequence(first_b, last_b)).alias("_b"))
    a = bucketed.select(F.col("_k"), F.col("_id").alias("id_a"),
                        F.col("_s").alias("s_a"), F.col("_e").alias("e_a"),
                        "_b")
    b = bucketed.select(F.col("_k"), F.col("_id").alias("id_b"),
                        F.col("_s").alias("s_b"), F.col("_e").alias("e_b"),
                        "_b")
    overlap = (F.col("s_a") < F.col("e_b")) & (F.col("s_b") < F.col("e_a"))
    return (a.join(b, ["_k", "_b"])
            .filter((F.col("id_a") < F.col("id_b")) & overlap)
            .select(F.col("_k").alias(key_col), "id_a", "id_b",
                    F.datediff(F.least("e_a", "e_b"),
                               F.greatest("s_a", "s_b"))
                    .cast("long").alias("overlap_days"))
            .distinct())


def session_documents(events: DataFrame, gap_us: int = 1800 * 1_000_000,
                      user_col: str = "user_id", ts_col: str = "ts",
                      id_col: str = "event_id",
                      token_col: str = "event_type") -> DataFrame:
    """Assemble one training 'document' per session: split each user's
    timeline on `gap_us` silence (lag + cumsum, same mechanics as
    events_sessionization), then concatenate the session's tokens in
    (time, id) order — the events-to-text step that turns interaction
    logs into sequence-model training data (chat threading, clickstream
    LM corpora).

    Scale shape: ONE exchange on the user key serves the lag window,
    the cumsum window, and the final per-session fold (all three key on
    user_id). The collect is bounded by SESSION length — the gap split
    caps it regardless of how long a user's total history is; the
    struct sort is in-memory per session. array_sort on
    (us, id, token) structs gives a deterministic total order, so the
    assembled string is engine-exact (oracle: string_agg ORDER BY).
    """
    w = W.partitionBy(user_col).orderBy("us", id_col)
    ws = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    base = events.select(F.col(user_col), F.col(id_col),
                         F.col(token_col).alias("_tok"),
                         F.unix_micros(F.col(ts_col)).alias("us"))
    gap = F.col("us") - F.lag("us").over(w)
    sess = (base
            .withColumn("_new", F.when(gap > gap_us, 1).otherwise(0))
            .withColumn("session_id", F.sum("_new").over(ws)))
    ordered = F.array_sort(
        F.collect_list(F.struct("us", F.col(id_col).alias("_id"),
                                "_tok")))
    return (sess.groupBy(user_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max("us") - F.min("us")).alias("duration_us"),
                 F.array_join(
                     F.transform(ordered, lambda x: x["_tok"]), " ")
                 .alias("doc")))


def histogram_percentile_rollup(events: DataFrame,
                                value_col: str = "value",
                                ts_col: str = "ts",
                                group_col: str = "event_type",
                                bin_width: float = 10.0,
                                fine: str = "1 day",
                                coarse: str = "1 week",
                                p: float = 0.5) -> DataFrame:
    """Mergeable-histogram percentile rollup — the quantile sibling of
    hll_sketch_rollup. Exact percentiles, like exact distincts, do not
    add across windows; fixed-width bin counts DO. Stage 1 sketches
    (group, fine-window, bin) counts at ingest; stage 2 merges fine
    sketches into the coarse window with a plain SUM — no rescan of raw
    events — and reads the percentile off the merged histogram: the
    estimate brackets the k-th smallest value (k = ceil(p*N)) inside
    the bin whose cumulative count crosses k, an error bounded by one
    bin width by construction.

    Integer counts + integer bin ids end-to-end (the only doubles are
    the bin edges, exact products of small ints), so any engine agrees
    bit-for-bit. Returns (group, window_start, n_rows, p_lo, p_hi).
    """
    b = F.floor(F.col(value_col) / bin_width).cast("long")
    fine_b = (events
              .groupBy(F.col(group_col), F.window(ts_col, fine).alias("_fw"),
                       b.alias("_bin"))
              .agg(F.count(F.lit(1)).alias("_n")))
    merged = (fine_b
              .groupBy(F.col(group_col),
                       F.window(F.col("_fw.start"), coarse).alias("_cw"),
                       "_bin")
              .agg(F.sum("_n").alias("_n")))
    wcum = (W.partitionBy(group_col, "_cw").orderBy("_bin")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wtot = W.partitionBy(group_col, "_cw")
    return (merged
            .withColumn("_cum", F.sum("_n").over(wcum))
            .withColumn("_total", F.sum("_n").over(wtot))
            .withColumn("_k", F.ceil(F.col("_total") * p).cast("long"))
            .filter((F.col("_cum") >= F.col("_k"))
                    & (F.col("_cum") - F.col("_n") < F.col("_k")))
            .select(F.col(group_col),
                    F.col("_cw.start").alias("window_start"),
                    F.col("_total").cast("long").alias("n_rows"),
                    (F.col("_bin") * bin_width).cast("double")
                    .alias("p_lo"),
                    ((F.col("_bin") + 1) * bin_width).cast("double")
                    .alias("p_hi")))
