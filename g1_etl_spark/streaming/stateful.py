"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for semantics windowed aggregation can't express
(running per-key counters with timeout-driven emission).

Pattern: groupBy(key).applyInPandasWithState(fn, outputSchema,
stateSchema, outputMode, timeoutConf). State lives per key in the state
store; the watermark/timeout bounds it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = ("user_id long, total_events long, total_value double, "
               "batch_events long")
_STATE_SCHEMA = "total_events long, total_value double"


def _update_user_totals(key, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    total_events, total_value = (
        state.get if state.exists else (0, 0.0))
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame({
        "user_id": [user_id],
        "total_events": [total_events],
        "total_value": [total_value],
        "batch_events": [batch_events],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches (arbitrary stateful
    processing; emits one row per user per batch)."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_OUT = "user_id long, funnel_depth int, t1_us long, t2_us long, t3_us long"
_FUNNEL_STATE = "depth int, t1 long, t2 long, t3 long"


def _advance_funnel(key, pdfs, state):
    """Per-user funnel state machine: step k+1 counts only when its
    event arrives strictly after step k's recorded time (same ordering
    rule as the batch events_funnel plan). Progress is monotone, so
    state is four scalars per user regardless of event volume."""
    import pandas as pd

    (user_id,) = key
    depth, t1, t2, t3 = state.get if state.exists else (0, None, None, None)
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("us")
        for etype, us in zip(pdf["event_type"], pdf["us"]):
            us = int(us)
            if depth == 0 and etype == _FUNNEL_STEPS[0]:
                depth, t1 = 1, us
            elif depth == 1 and etype == _FUNNEL_STEPS[1] and us > t1:
                depth, t2 = 2, us
            elif depth == 2 and etype == _FUNNEL_STEPS[2] and us > t2:
                depth, t3 = 3, us
    state.update((depth, t1, t2, t3))
    rows.append({"user_id": user_id, "funnel_depth": depth,
                 "t1_us": t1, "t2_us": t2, "t3_us": t3})
    yield pd.DataFrame(rows)


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch events_funnel: per-user view->click->
    purchase progression maintained across micro-batches with
    applyInPandasWithState (one depth/timestamps tuple per user; emits
    the current funnel row for each user seen in the batch).

    Caveat vs batch: the batch plan takes the EARLIEST qualifying chain;
    the streaming state machine advances greedily in arrival order, so
    on in-order streams (or per-batch sorted input, as here) the depths
    agree but intermediate timestamps may differ when a user re-enters
    a step — acceptable for monitoring, and asserted against the batch
    plan's depths in tests.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_funnel,
                outputStructType=_FUNNEL_OUT,
                stateStructType=_FUNNEL_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_PAT_STEPS = ("view", "click", "purchase")
_PAT_OUT = "user_id long, start_us long, end_us long, duration_us long"
# buffered events awaiting watermark closure (types + event times + ids
# for a total order on timestamp ties)
_PAT_STATE = "types array<string>, uss array<long>, ids array<long>"
_PAT_MAX_GAP_US = 86_400_000_000  # 24h, matches the batch plan


def _match_pattern(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct strict-sequence matcher. Buffer the user's
    events in state; a triple (i, i+1, i+2) is CLOSED once the
    watermark passes us[i+2] — no late event can land inside it
    anymore, because any not-yet-arrived event has ts > watermark >=
    us[i+2]. Emit matches among closed triples only, keep the last two
    closed events plus everything open, and arm an event-time timeout
    so the tail flushes when the watermark advances past it even if
    the user never appears in another batch."""
    (user_id,) = key
    types, uss, ids = (list(state.get[0]), list(state.get[1]),
                       list(state.get[2])) if state.exists else ([], [], [])
    if not state.hasTimedOut:
        for pdf in pdfs:
            types.extend(pdf["event_type"])
            uss.extend(int(u) for u in pdf["us"])
            ids.extend(int(i) for i in pdf["event_id"])
    order = sorted(range(len(uss)), key=lambda i: (uss[i], ids[i]))
    types = [types[i] for i in order]
    uss = [uss[i] for i in order]
    ids = [ids[i] for i in order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    rows = []
    # last index whose triple-closing position the watermark PASSED.
    # Strictly below: an event with ts exactly at the watermark can
    # still arrive (only ts < watermark is guaranteed dropped), so a
    # triple closing at the boundary stays open one more advance.
    closed = sum(1 for u in uss if u < wm_us)
    for i in range(max(0, closed - 2)):
        if (types[i] == _PAT_STEPS[0] and types[i + 1] == _PAT_STEPS[1]
                and types[i + 2] == _PAT_STEPS[2]
                and uss[i + 2] - uss[i] <= _PAT_MAX_GAP_US):
            rows.append({"user_id": user_id, "start_us": uss[i],
                         "end_us": uss[i + 2],
                         "duration_us": uss[i + 2] - uss[i]})
    # retain the last two closed events (possible prefix of an open
    # triple) and every open one
    keep_from = max(0, closed - 2)
    types, uss, ids = types[keep_from:], uss[keep_from:], ids[keep_from:]
    if types:
        state.update((types, uss, ids))
        # arm a flush timeout ONLY while something is still open (a
        # fully-closed <=2-event leftover can only ever emit when a NEW
        # event arrives, which re-invokes this function anyway), and arm
        # it at the EARLIEST open event: the next watermark advance past
        # it seals new positions, so each firing does real emission work
        # and the tail drains progressively. An arm at max(uss) can
        # exceed the final watermark and strand the last user's
        # sealed-but-unemitted matches forever.
        open_us = [u for u in uss if u >= wm_us]
        if open_us:
            # (min//1000, wm+1): fires at the FIRST watermark that
            # strictly passes the event; the former outer +1 could
            # strand a terminal event one watermark-granule longer
            state.setTimeoutTimestamp(
                max(min(open_us) // 1000,
                    state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows, columns=["user_id", "start_us", "end_us",
                                      "duration_us"])


_TRANS_OUT = "user_id long, from_type string, to_type string, n long"
_TRANS_STATE = "types array<string>, uss array<long>, ids array<long>"


def _emit_transitions(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct bigram counter (the pairs version of
    _match_pattern): buffer the user's events; the adjacent pair
    (i, i+1) is CLOSED once the watermark passes us[i+1] — no late
    event can land between them anymore. Emit each closed pair's
    (from, to) delta exactly once, trim everything before the last
    closed event (it may still pair with a future arrival), and arm an
    event-time timeout so the tail flushes on quiet users."""
    (user_id,) = key
    types, uss, ids = (list(state.get[0]), list(state.get[1]),
                       list(state.get[2])) if state.exists else ([], [], [])
    if not state.hasTimedOut:
        for pdf in pdfs:
            types.extend(pdf["event_type"])
            uss.extend(int(u) for u in pdf["us"])
            ids.extend(int(i) for i in pdf["event_id"])
    order = sorted(range(len(uss)), key=lambda i: (uss[i], ids[i]))
    types = [types[i] for i in order]
    uss = [uss[i] for i in order]
    ids = [ids[i] for i in order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    # ts == watermark can still arrive; only ts < watermark is sealed
    closed = sum(1 for u in uss if u < wm_us)
    from collections import Counter

    pairs: Counter = Counter()
    for i in range(max(0, closed - 1)):
        pairs[(types[i], types[i + 1])] += 1
    rows = [{"user_id": user_id, "from_type": f, "to_type": t, "n": n}
            for (f, t), n in sorted(pairs.items())]
    keep_from = max(0, closed - 1)
    types, uss, ids = types[keep_from:], uss[keep_from:], ids[keep_from:]
    if types:
        state.update((types, uss, ids))
        open_us = [u for u in uss if u >= wm_us]
        if open_us:
            # arm at the EARLIEST open event: the next watermark advance
            # past it seals at least one new pair, so each firing does
            # real emission work and the tail drains progressively (an
            # arm at max(uss) can exceed the final watermark and strand
            # the last user's sealed-but-unemitted pairs forever)
            # (min//1000, wm+1): fires at the FIRST watermark that
            # strictly passes the event; the former outer +1 could
            # strand a terminal event one watermark-granule longer
            state.setTimeoutTimestamp(
                max(min(open_us) // 1000,
                    state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows, columns=["user_id", "from_type", "to_type",
                                      "n"])


def streaming_transition_matrix(events: DataFrame,
                                delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_transition_matrix: per-user
    (event, next event) bigram DELTAS, watermark-correct under
    out-of-order arrival (pairs seal when the watermark passes the
    second element, exactly mirroring LEAD over the total order).

    Emits deltas rather than the folded matrix because Spark allows one
    arbitrary-stateful operator per query: the consumer folds them with
    SUM(n) GROUP BY (from_type, to_type) — in deployment a foreachBatch
    MERGE into the matrix table, in tests a sum over the memory sink.
    Delta rows are tiny (bounded by |types|^2 per user per batch), so
    the downstream fold touches no raw events — the same
    sketch-then-merge economics as the HLL rollup."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id", "event_type",
                        F.unix_micros("ts").alias("us"), "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _emit_transitions,
                outputStructType=_TRANS_OUT,
                stateStructType=_TRANS_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_WEEK_US = 7 * 86_400 * 1_000_000
_COHORT_OUT = ("user_id long, cohort_week_us long, act_week_us long, "
               "week_offset long, emit_seq long")
_COHORT_STATE = "cohort_us long, act_weeks array<long>, seq long"


def _update_cohort(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user cohort state: first-seen epoch-aligned week + the set
    of distinct activity weeks (bounded by the observation span in
    weeks, not event volume). Emits (cohort_week, act_week, offset)
    rows for NEW activity weeks; if a late-arriving earlier event moves
    the user's cohort week, every week is re-emitted under the
    corrected cohort with a higher emit_seq — consumers keep each
    user's rows at max emit_seq's cohort (latest-correction-wins)."""
    (user_id,) = key
    cohort, weeks, seq = ((state.get[0], list(state.get[1]), state.get[2])
                          if state.exists else (None, [], 0))
    new_min = None
    batch_weeks: set[int] = set()
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        mn = int(pdf["us"].min())
        new_min = mn if new_min is None else min(new_min, mn)
        batch_weeks.update(int(u) // _WEEK_US * _WEEK_US
                           for u in pdf["us"])
    old_cohort = cohort
    if new_min is not None:
        c_week = new_min // _WEEK_US * _WEEK_US
        cohort = c_week if cohort is None else min(cohort, c_week)
    fresh = sorted(batch_weeks - set(weeks))
    weeks = sorted(set(weeks) | batch_weeks)
    seq += 1
    emit = weeks if cohort != old_cohort else fresh
    rows = [{"user_id": user_id, "cohort_week_us": cohort,
             "act_week_us": w, "week_offset": (w - cohort) // _WEEK_US,
             "emit_seq": seq} for w in emit]
    state.update((cohort, weeks, seq))
    yield pd.DataFrame(rows, columns=["user_id", "cohort_week_us",
                                      "act_week_us", "week_offset",
                                      "emit_seq"])


def streaming_cohort_retention(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch events_cohort_retention: per-user
    (cohort week, activity week) pairs maintained incrementally. The
    consumer folds COUNT(DISTINCT user) by (cohort_week, offset) —
    deployment: foreachBatch MERGE; tests: SQL over the memory sink.

    Correctness contract mirrors streaming_funnel's: on in-order
    streams the folded output equals the batch plan exactly; under
    out-of-order arrival a cohort-moving late event triggers a full
    re-emit with a higher emit_seq, so latest-correction-wins consumers
    converge to the batch answer for all events inside the watermark."""
    from pyspark.sql import functions as F

    prepared = events.select("user_id", F.unix_micros("ts").alias("us"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_cohort,
                outputStructType=_COHORT_OUT,
                stateStructType=_COHORT_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_pattern_seq(events: DataFrame,
                          delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_pattern_seq: strict
    view->click->purchase adjacency per user within 24h, detected with
    buffered arbitrary-stateful processing. Unlike the greedy funnel,
    this is ORDER-CORRECT under out-of-order arrival: events buffer in
    state until the event-time watermark closes their triple, so the
    emitted matches equal the batch plan's on any arrival order (for
    events inside the watermark). EventTimeTimeout flushes users the
    stream stops mentioning."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id", "event_type",
                        F.unix_micros("ts").alias("us"), "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _match_pattern,
                outputStructType=_PAT_OUT,
                stateStructType=_PAT_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_HOUR_US = 3_600_000_000
_ANOM_OUT = ("event_type string, hr_us long, cnt long, z double, "
             "is_anomaly boolean")
_ANOM_STATE = "hrs array<long>, cnts array<long>, n_emitted int"


def _flag_rate_anomalies(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-type hourly-rate z-score flags, watermark-correct: an hour
    SEALS once the watermark passes its end (no event inside it can
    still arrive), and a sealed hour's z-score uses the trailing <=24
    SEALED hourly rows — exactly the batch plan's ROWS 24 PRECEDING
    frame, because hours seal in order under a monotone watermark.
    State is the trailing history plus open buckets (bounded: 24 rows +
    open hours inside the watermark delay). Late events for an
    already-emitted hour are dropped — the flag is immutable once
    emitted (document consumers rely on that)."""
    (etype,) = key
    hrs, cnts, n_emitted = ((list(state.get[0]), list(state.get[1]),
                             state.get[2]) if state.exists else ([], [], 0))
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us in pdf["us"]:
                hr = int(us) // _HOUR_US * _HOUR_US
                if n_emitted and hr <= hrs[n_emitted - 1]:
                    continue  # sealed-and-emitted hour: immutable
                try:
                    i = hrs.index(hr, n_emitted)
                    cnts[i] += 1
                except ValueError:
                    j = len(hrs)
                    while j > n_emitted and hrs[j - 1] > hr:
                        j -= 1
                    hrs.insert(j, hr)
                    cnts.insert(j, 1)
    wm_us = state.getCurrentWatermarkMs() * 1000
    rows = []
    while n_emitted < len(hrs) and hrs[n_emitted] + _HOUR_US <= wm_us:
        i = n_emitted
        prev = cnts[max(0, i - 24):i]
        n = len(prev)
        if n >= 12:
            s = float(sum(prev))
            ss = float(sum(c * c for c in prev))
            var = (ss - s * s / n) / (n - 1)
            if var > 0:
                z = (cnts[i] - s / n) / var ** 0.5
                rows.append({"event_type": etype, "hr_us": hrs[i],
                             "cnt": cnts[i], "z": z,
                             "is_anomaly": abs(z) > 3.0})
        n_emitted += 1
    # trim history the 24-row frame can no longer reach
    cut = max(0, n_emitted - 24)
    if cut:
        hrs, cnts, n_emitted = hrs[cut:], cnts[cut:], n_emitted - cut
    if hrs:
        state.update((hrs, cnts, n_emitted))
        if n_emitted < len(hrs):
            # arm so the timer fires at the FIRST watermark >= the
            # bucket end: ts_ms = (end-1)//1000 fires at wm_ms >=
            # end//1000 (buckets are ms-aligned). An arm at end//1000+1
            # strands a bucket whose end equals the terminal watermark.
            state.setTimeoutTimestamp(
                max((hrs[n_emitted] + _HOUR_US - 1) // 1000,
                    state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows, columns=["event_type", "hr_us", "cnt", "z",
                                      "is_anomaly"])


def streaming_rate_anomaly(events: DataFrame,
                           delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_rate_anomaly: |z| > 3 flags
    on hourly per-type rates against the trailing <=24 sealed hours.
    Emits each hour's flag exactly once, when the watermark seals it —
    the alerting shape, where a flag must be final when it fires."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("event_type", F.unix_micros("ts").alias("us"),
                        "ts"))
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _flag_rate_anomalies,
                outputStructType=_ANOM_OUT,
                stateStructType=_ANOM_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_SCD2_OUT = ("user_id long, state string, valid_from_us long, "
             "valid_to_us long")
_SCD2_STATE = ("cur_state string, cur_from long, "
               "uss array<long>, ids array<long>, sts array<string>")


def _maintain_scd2(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct SCD2 maintenance (the CDC shape): buffer the
    key's change log; events with ts < watermark are SEALED — nothing
    can land between them anymore — so the sealed prefix collapses
    consecutive duplicates and every interval whose CLOSING change is
    sealed emits exactly once, already final. The open tail interval
    (is_current in the batch plan) lives in two state scalars and never
    emits — on an unbounded stream 'current' is a query against state,
    not an append event."""
    (user_id,) = key
    cur_state, cur_from, uss, ids, sts = (
        (state.get[0], state.get[1], list(state.get[2]),
         list(state.get[3]), list(state.get[4]))
        if state.exists else (None, None, [], [], []))
    if not state.hasTimedOut:
        for pdf in pdfs:
            uss.extend(int(u) for u in pdf["us"])
            ids.extend(int(i) for i in pdf["event_id"])
            sts.extend(pdf["event_type"])
    order = sorted(range(len(uss)), key=lambda i: (uss[i], ids[i]))
    uss = [uss[i] for i in order]
    ids = [ids[i] for i in order]
    sts = [sts[i] for i in order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    sealed = sum(1 for u in uss if u < wm_us)
    rows = []
    for i in range(sealed):
        if sts[i] != cur_state:
            if cur_state is not None:
                rows.append({"user_id": user_id, "state": cur_state,
                             "valid_from_us": cur_from,
                             "valid_to_us": uss[i]})
            cur_state, cur_from = sts[i], uss[i]
    uss, ids, sts = uss[sealed:], ids[sealed:], sts[sealed:]
    if uss or cur_state is not None:
        state.update((cur_state, cur_from, uss, ids, sts))
        if uss:
            state.setTimeoutTimestamp(
                max(min(uss) // 1000,
                    state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows, columns=["user_id", "state",
                                      "valid_from_us", "valid_to_us"])


def streaming_scd2(events: DataFrame,
                   delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_scd2_intervals: half-open
    validity intervals per user maintained from the live change log;
    each interval emits exactly once, when the watermark seals its
    closing change — matching the batch plan's closed intervals on any
    arrival order (for events inside the watermark)."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id", "event_type",
                        F.unix_micros("ts").alias("us"), "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _maintain_scd2,
                outputStructType=_SCD2_OUT,
                stateStructType=_SCD2_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_GF_OUT = ("user_id long, bucket_us long, n long, locf_value double")
_GF_STATE = ("carry long, has_carry boolean, next_bucket long, "
             "bks array<long>, ns array<long>, svals array<long>")
_GF_SCALE = 1_000_000


def _fill_gaps(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct LOCF gap fill: hourly buckets accumulate in
    state (value sums as scaled longs — the repo's engine-exact dsum
    idiom); when an OBSERVED bucket seals, the fillers since the
    previous observation emit with the carried value, then the bucket
    itself. Trailing fillers after the newest observation never emit —
    whether they belong to the grid depends on whether a later
    observation ever arrives, so emitting them would be a guess, and
    append output must be final."""
    (user_id,) = key
    carry, has_carry, next_bucket, bks, ns, svals = (
        (state.get[0], state.get[1], state.get[2], list(state.get[3]),
         list(state.get[4]), list(state.get[5]))
        if state.exists else (0, False, None, [], [], []))
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, val in zip(pdf["us"], pdf["value"]):
                b = int(us) // _HOUR_US * _HOUR_US
                sv = int(round(float(val) * _GF_SCALE))
                try:
                    i = bks.index(b)
                    ns[i] += 1
                    svals[i] += sv
                except ValueError:
                    bks.append(b)
                    ns.append(1)
                    svals.append(sv)
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bks)), key=lambda i: bks[i])
    rows = []
    done = []
    for i in order:
        if bks[i] + _HOUR_US > wm_us:
            break
        b, v = bks[i], svals[i] / _GF_SCALE
        if next_bucket is not None:
            g = next_bucket
            while g < b:
                rows.append({"user_id": user_id, "bucket_us": g, "n": 0,
                             "locf_value": carry / _GF_SCALE
                             if has_carry else None})
                g += _HOUR_US
        rows.append({"user_id": user_id, "bucket_us": b, "n": ns[i],
                     "locf_value": v})
        carry, has_carry, next_bucket = svals[i], True, b + _HOUR_US
        done.append(i)
    for i in sorted(done, reverse=True):
        del bks[i], ns[i], svals[i]
    if bks or has_carry:
        state.update((carry, has_carry, next_bucket, bks, ns, svals))
        if bks:
            # same boundary rule as the anomaly emitter: fire at the
            # first watermark that seals the earliest open bucket
            state.setTimeoutTimestamp(
                max((min(bks) + _HOUR_US - 1) // 1000,
                    state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows, columns=["user_id", "bucket_us", "n",
                                      "locf_value"])


def streaming_gapfill_locf(events: DataFrame,
                           delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_gapfill_locf: dense hourly
    grid per key with last-observation-carried-forward, emitted
    bucket-by-bucket as observations seal."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", F.unix_micros("ts").alias("us"),
                        "value", "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _fill_gaps,
                outputStructType=_GF_OUT,
                stateStructType=_GF_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_HH_OUT = ("event_type string, user_id long, est_count long, "
           "max_err long, emit_seq long")
_HH_STATE = ("keys array<long>, counts array<long>, errs array<long>, "
             "seq long")
_HH_K = 16


def _track_heavy_hitters(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Space-Saving sketch (Metwally et al. 2005) per group: at most
    _HH_K (key, count, err) counters regardless of stream length. A new
    key evicts the minimum counter and inherits its count as error
    bound; guarantees true_count <= est_count and est_count - max_err
    <= true_count, and any key with true frequency > N/k is present.
    The O(k) state is the whole point — exact per-user counts over an
    unbounded stream would grow state with the user universe."""
    (etype,) = key
    ks, cs, es, seq = ((list(state.get[0]), list(state.get[1]),
                        list(state.get[2]), state.get[3])
                       if state.exists else ([], [], [], 0))
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            uid = int(uid)
            try:
                i = ks.index(uid)
                cs[i] += 1
            except ValueError:
                if len(ks) < _HH_K:
                    ks.append(uid)
                    cs.append(1)
                    es.append(0)
                else:
                    m = min(range(len(cs)), key=lambda j: (cs[j], ks[j]))
                    ks[m], es[m] = uid, cs[m]
                    cs[m] += 1
    seq += 1
    state.update((ks, cs, es, seq))
    order = sorted(range(len(ks)), key=lambda i: (-cs[i], ks[i]))
    yield pd.DataFrame(
        [{"event_type": etype, "user_id": ks[i], "est_count": cs[i],
          "max_err": es[i], "emit_seq": seq} for i in order],
        columns=["event_type", "user_id", "est_count", "max_err",
                 "emit_seq"])


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Top user heavy hitters per event type over an unbounded stream
    with O(k) state per type (Space-Saving sketch). Emits the current
    sketch each batch in update mode; consumers keep each type's rows
    at max emit_seq. Arrival-order dependent like any sketch, but the
    count BOUNDS (est >= true >= est - err) and the guarantee that any
    key above N/k frequency is present hold on every emission — the
    tests pin both against exact batch counts."""
    from pyspark.sql import functions as F

    prepared = events.select("event_type", "user_id",
                             F.unix_micros("ts").alias("us"))
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _track_heavy_hitters,
                outputStructType=_HH_OUT,
                stateStructType=_HH_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_TW_OUT = ("user_id long, seg_start_us long, seg_end_us long, "
           "n_segments long, span_sec double, weighted_sum double, "
           "twap double")
_TW_STATE = ("last_us long, last_val double, has_last boolean, "
             "acc_num long, acc_den long, n_seg long, "
             "buf_us array<long>, buf_id array<long>, "
             "buf_val array<double>")
_TW_SCALE = 1_000_000


def _round_half_up(x: float) -> int:
    """Spark's F.round is HALF_UP (ties away from zero) while Python's
    round() is banker's — on the .5 ties the scaled products do hit
    (2-decimal values x micro-precise dt), the two disagree by 1 and
    the batch-equality contract breaks. Sign-aware: floor(x+0.5) for
    x >= 0, ceil(x-0.5) for x < 0, matching F.round on NEGATIVE
    value*dt products too (negative event values are legal input)."""
    import math

    return int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))


def _spark_mod(n: int, p: int) -> int:
    """Spark/SQL `%` keeps the sign of the DIVIDEND; Python's `%` is
    always non-negative for positive p. The streaming twins restate
    batch hash arithmetic in Python, so they must use THIS mod or the
    stream != batch for any negative key (latent until negative ids
    appear — the equality contract shouldn't depend on the dataset)."""
    r = abs(n) % p
    return r if n >= 0 else -r


def _advance_twap(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct running TWAP: unsealed events buffer in state;
    once the watermark passes an event, every (prev, next) segment it
    completes integrates value*dt into the scaled-long accumulators —
    the SAME arithmetic, in the same order, as the batch twin
    (events_time_weighted_avg), so the last emitted row per user equals
    the batch result over the sealed prefix. The newest sealed event is
    carried as the open segment's left edge."""
    (user_id,) = key
    (last_us, last_val, has_last, acc_num, acc_den, n_seg,
     bus, bid, bval) = (
        (state.get[0], state.get[1], state.get[2], state.get[3],
         state.get[4], state.get[5], list(state.get[6]),
         list(state.get[7]), list(state.get[8]))
        if state.exists else (0, 0.0, False, 0, 0, 0, [], [], []))
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, val in zip(pdf["us"], pdf["event_id"],
                                    pdf["value"]):
                bus.append(int(us))
                bid.append(int(eid))
                bval.append(float(val))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break  # not sealed yet; neither is anything after it
        us, val = bus[i], bval[i]
        if has_last:
            dt_sec = (us - last_us) / 1_000_000
            acc_num += _round_half_up((last_val * dt_sec) * _TW_SCALE)
            acc_den += _round_half_up(dt_sec * _TW_SCALE)
            n_seg += 1
            rows.append({
                "user_id": user_id, "seg_start_us": last_us,
                "seg_end_us": us, "n_segments": n_seg,
                "span_sec": float(acc_den) / _TW_SCALE,
                "weighted_sum": float(acc_num) / _TW_SCALE,
                "twap": (float(acc_num) / float(acc_den)
                         if acc_den else None)})
        last_us, last_val, has_last = us, val, True
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bval[i]
    state.update((last_us, last_val, has_last, acc_num, acc_den,
                  n_seg, bus, bid, bval))
    if bus:
        # wake when the watermark can seal the earliest buffered event
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(rows, columns=["user_id", "seg_start_us",
                                      "seg_end_us", "n_segments",
                                      "span_sec", "weighted_sum",
                                      "twap"])


def streaming_time_weighted(events: DataFrame,
                            delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_time_weighted_avg: per-user
    LOCF-weighted running average, one row per sealed segment, O(open
    buffer) state per user bounded by the watermark delay."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("us"), "value", "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_twap,
                outputStructType=_TW_OUT,
                stateStructType=_TW_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_KMV_OUT = ("event_type string, k_used long, kth_hash long, "
            "est double, emit_seq long")
_KMV_STATE = "hashes array<long>, seq long"
_KMV_P = 2_147_483_647
_KMV_A, _KMV_B = 1_103_515_245, 12_345
_KMV_STREAM_K = 256


def _track_kmv(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    """KMV bottom-k distinct sketch per group over an unbounded stream:
    state is the k smallest distinct LCG hashes seen — O(k) regardless
    of key cardinality, and ORDER-INDEPENDENT (the bottom-k set after
    any prefix permutation is identical), so unlike Space-Saving the
    final emission equals the batch sketch EXACTLY, not just within
    bounds. Hash arithmetic restates operators/sketches.kmv_hash
    verbatim so stream and batch agree bit-for-bit."""
    (etype,) = key
    hs, seq = ((sorted(state.get[0]), state.get[1])
               if state.exists else ([], 0))
    cur = set(hs)
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            h = _spark_mod(_KMV_A * _spark_mod(int(uid), _KMV_P)
                           + _KMV_B, _KMV_P)
            if h in cur:
                continue
            if len(hs) < _KMV_STREAM_K:
                cur.add(h)
                hs.append(h)
                hs.sort()
            elif h < hs[-1]:
                cur.discard(hs[-1])
                hs[-1] = h
                cur.add(h)
                hs.sort()
    seq += 1
    state.update((hs, seq))
    k_used = len(hs)
    kth = hs[-1] if hs else 0
    est = (float((k_used - 1) * _KMV_P) / float(kth)
           if k_used >= _KMV_STREAM_K else float(k_used))
    yield pd.DataFrame(
        [{"event_type": etype, "k_used": k_used, "kth_hash": kth,
          "est": est, "emit_seq": seq}],
        columns=["event_type", "k_used", "kth_hash", "est", "emit_seq"])


def streaming_kmv_distinct(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch KMV distinct sketch: per-event-type
    running distinct-user estimate with O(k) state. Emits one summary
    row per group per batch in update mode; consumers keep each type's
    row at max emit_seq — the final one equals
    operators/sketches.kmv_build + kmv_distinct_estimate over the same
    data bit-for-bit (order independence of bottom-k)."""
    return (events
            .select("event_type", "user_id")
            .groupBy("event_type")
            .applyInPandasWithState(
                _track_kmv,
                outputStructType=_KMV_OUT,
                stateStructType=_KMV_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


_EW_OUT = "user_id long, i long, ewma double"
_EW_STATE = ("y double, cnt long, buf_us array<long>, "
             "buf_id array<long>, buf_val array<double>")


def _advance_ewma(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct running EWMA (alpha = 1/2): unsealed events
    buffer in state; each event the watermark seals applies ONE fold
    step y = (x + y) / 2 — the exact op the batch twin
    (events_ewma_value) folds over the time-sorted array, so the row
    emitted at sealed position i equals the batch EWMA of that prefix
    BIT-FOR-BIT (same IEEE add, same exact halving — no tolerance).
    Carried state is (y, count) plus the watermark-bounded buffer."""
    (user_id,) = key
    y, cnt, bus, bid, bval = (
        (state.get[0], state.get[1], list(state.get[2]),
         list(state.get[3]), list(state.get[4]))
        if state.exists else (0.0, 0, [], [], []))
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, val in zip(pdf["us"], pdf["event_id"],
                                    pdf["value"]):
                bus.append(int(us))
                bid.append(int(eid))
                bval.append(float(val))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break  # not sealed yet; neither is anything after it
        x = bval[i]
        y = x if cnt == 0 else (x + y) / 2
        cnt += 1
        rows.append({"user_id": user_id, "i": cnt, "ewma": y})
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bval[i]
    state.update((y, cnt, bus, bid, bval))
    if bus:
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(rows, columns=["user_id", "i", "ewma"])


def streaming_ewma(events: DataFrame,
                   delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_ewma_value: per-user running
    EWMA (alpha = 1/2) in event-time order, one row per sealed event,
    O(1) committed state per user (y, count) + the watermark-bounded
    unsealed buffer. The last emitted row per user equals the batch
    fold over the same sealed prefix exactly — see _advance_ewma."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("us"), "value", "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_ewma,
                outputStructType=_EW_OUT,
                stateStructType=_EW_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# Event-time retention horizon for fully-drained per-user smoother
# state (r9 ADVICE): once a user's buffer drains, a timeout is set at
# watermark + this horizon; if it fires with nothing new buffered the
# state is dropped, bounding the store at O(active users) instead of
# O(all users ever seen). A user reappearing after the horizon
# restarts its fold — the documented retention contract.
_STATE_RETAIN_MS = 24 * 3600 * 1000

_HT_OUT = "user_id long, i long, level double, trend double"
_HT_STATE = ("l double, b double, cnt long, buf_us array<long>, "
             "buf_id array<long>, buf_val array<double>")


def _advance_holt(key, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct running Holt smoothing (alpha = beta = 1/2):
    unsealed events buffer in state; each sealed event applies the
    batch recursion l' = (x + (l + b)) / 2, b' = ((l' - l) + b) / 2 —
    the exact op sequence events_holt_forecast folds over the
    time-sorted array (and its oracle iterates as a recursive CTE),
    so the row emitted at sealed position i equals the batch (level,
    trend) of that prefix BIT-FOR-BIT. Carried state is (l, b, count)
    plus the watermark-bounded buffer — O(1) per user, the
    segment-merge form the batch docstring's SCALE BOUND points at."""
    (user_id,) = key
    l, b, cnt, bus, bid, bval = (
        (state.get[0], state.get[1], state.get[2], list(state.get[3]),
         list(state.get[4]), list(state.get[5]))
        if state.exists else (0.0, 0.0, 0, [], [], []))
    # a timeout firing with an ALREADY-empty buffer can only be the
    # retention timeout set below — a drain timeout always has
    # buffered rows to seal (r9 ADVICE: drained state previously
    # registered no timeout and lived forever, O(users) store growth)
    drained_on_entry = not bus
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, val in zip(pdf["us"], pdf["event_id"],
                                    pdf["value"]):
                bus.append(int(us))
                bid.append(int(eid))
                bval.append(float(val))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break  # not sealed yet; neither is anything after it
        x = bval[i]
        if cnt == 0:
            l, b = x, 0.0
        else:
            l2 = (x + (l + b)) / 2
            b = ((l2 - l) + b) / 2
            l = l2
        cnt += 1
        rows.append({"user_id": user_id, "i": cnt, "level": l,
                     "trend": b})
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bval[i]
    if bus:
        state.update((l, b, cnt, bus, bid, bval))
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    elif state.hasTimedOut and drained_on_entry:
        # retention timeout on fully-drained state: a user idle past
        # the horizon restarts its fold if it ever reappears — the
        # documented retention contract that bounds the state store
        state.remove()
    else:
        state.update((l, b, cnt, bus, bid, bval))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + _STATE_RETAIN_MS)
    yield pd.DataFrame(rows, columns=["user_id", "i", "level", "trend"])


def streaming_holt(events: DataFrame,
                   delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_holt_forecast: per-user
    running Holt level/trend in event-time order, one row per sealed
    event, O(1) committed state per user (l, b, count) + the
    watermark-bounded unsealed buffer. The last emitted row per user
    equals the batch fold over the same sealed prefix exactly — see
    _advance_holt."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("us"), "value", "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_holt,
                outputStructType=_HT_OUT,
                stateStructType=_HT_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_HW_OUT = ("user_id long, i long, level double, trend double, "
           "s_h double")
_HW_STATE = ("l double, b double, s array<double>, cnt long, "
             "buf_us array<long>, buf_id array<long>, "
             "buf_val array<double>, buf_h array<int>")


def _advance_holtwinters(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct running additive Holt-Winters (alpha = beta =
    gamma = 1/2, hour-of-day season m=24): the first MULTI-STATE
    streaming twin — committed state is (l, b, s[24], count) plus the
    watermark-bounded buffer, O(m) per user. Each sealed event applies
    the batch recursion l' = ((x - s[h]) + (l + b))/2,
    b' = ((l' - l) + b)/2, s'[h] = ((x - l') + s[h])/2 — the exact op
    sequence events_holtwinters folds over the time-sorted array (and
    its oracle iterates as a recursive CTE carrying a LIST column), so
    the row emitted at sealed position i equals the batch
    (level, trend, s[h]) of that prefix BIT-FOR-BIT."""
    (user_id,) = key
    if state.exists:
        g = state.get
        l, b, sea, cnt = g[0], g[1], list(g[2]), g[3]
        bus, bid, bval, bh = (list(g[4]), list(g[5]), list(g[6]),
                              list(g[7]))
    else:
        l, b, sea, cnt = 0.0, 0.0, [0.0] * 24, 0
        bus, bid, bval, bh = [], [], [], []
    drained_on_entry = not bus  # see _advance_holt (r9 ADVICE)
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, val, hh in zip(pdf["us"], pdf["event_id"],
                                        pdf["value"], pdf["h"]):
                bus.append(int(us))
                bid.append(int(eid))
                bval.append(float(val))
                bh.append(int(hh))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break  # not sealed yet; neither is anything after it
        x, h = bval[i], bh[i]
        if cnt == 0:
            l, b = x, 0.0
        else:
            l2 = ((x - sea[h]) + (l + b)) / 2
            b = ((l2 - l) + b) / 2
            sea[h] = ((x - l2) + sea[h]) / 2
            l = l2
        cnt += 1
        rows.append({"user_id": user_id, "i": cnt, "level": l,
                     "trend": b, "s_h": sea[h]})
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bval[i], bh[i]
    if bus:
        state.update((l, b, sea, cnt, bus, bid, bval, bh))
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    elif state.hasTimedOut and drained_on_entry:
        state.remove()  # retention horizon passed on drained state
    else:
        state.update((l, b, sea, cnt, bus, bid, bval, bh))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + _STATE_RETAIN_MS)
    yield pd.DataFrame(rows,
                       columns=["user_id", "i", "level", "trend", "s_h"])


def streaming_holtwinters(events: DataFrame,
                          delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_holtwinters: per-user running
    Holt-Winters (level, trend, hour-of-day seasonals) in event-time
    order, one row per sealed event, O(m=24) committed state per user.
    The last emitted row per user equals the batch fold over the same
    sealed prefix exactly — see _advance_holtwinters."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("user_id", "event_id",
                        F.unix_micros("ts").alias("us"),
                        F.hour("ts").cast("int").alias("h"),
                        "value", "ts"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _advance_holtwinters,
                outputStructType=_HW_OUT,
                stateStructType=_HW_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_ZS_OUT = ("event_type string, event_id long, value double, "
           "n_window long, zscore double")
_ZS_STATE = ("win_us array<long>, win_xs array<long>, "
             "win_xxs array<long>, run_n long, run_sx long, "
             "run_sxx long, buf_us array<long>, buf_id array<long>, "
             "buf_val array<double>")
_ZS_WIN_US = 3_599_999_999


def _advance_zscore(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct trailing-1h anomaly flags: unsealed events
    buffer in state; sealed events enter the trailing window in
    (us, event_id) order — all RANGE-frame peers (identical us) are
    admitted BEFORE any of them emits, matching the batch RANGE
    semantics — with the window kept as exact scaled-long running sums
    (integer add on entry, integer subtract on evict, the identical
    accumulators the batch twin sums per frame). The z expression is
    the same IEEE tree as events_anomaly_zscore, so every emitted flag
    equals the batch row over the same sealed prefix bit-for-bit.
    Committed state: the O(events-per-hour-per-type) trailing window +
    the watermark-bounded unsealed buffer — the inherent bound of ANY
    trailing-window stream operator. Like the other twins, equality
    assumes no post-watermark stragglers (delay chosen by the caller)."""
    import math

    (event_type,) = key
    if state.exists:
        (win_us, win_xs, win_xxs, run_n, run_sx, run_sxx,
         bus, bid, bval) = (
            list(state.get[0]), list(state.get[1]), list(state.get[2]),
            state.get[3], state.get[4], state.get[5],
            list(state.get[6]), list(state.get[7]), list(state.get[8]))
    else:
        win_us, win_xs, win_xxs = [], [], []
        run_n = run_sx = run_sxx = 0
        bus, bid, bval = [], [], []
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, val in zip(pdf["us"], pdf["event_id"],
                                    pdf["value"]):
                bus.append(int(us))
                bid.append(int(eid))
                bval.append(float(val))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    gi = 0
    while gi < len(order):
        if bus[order[gi]] > wm_us:
            break  # not sealed; neither is anything after it
        us = bus[order[gi]]
        group = []
        while gi < len(order) and bus[order[gi]] == us:
            group.append(order[gi])
            gi += 1
        # evict entries that fell out of [us - 3599999999, us]
        lo = us - _ZS_WIN_US
        k = 0
        while k < len(win_us) and win_us[k] < lo:
            run_n -= 1
            run_sx -= win_xs[k]
            run_sxx -= win_xxs[k]
            k += 1
        if k:
            del win_us[:k], win_xs[:k], win_xxs[:k]
        for i in group:  # peers enter before anyone emits
            xs = _round_half_up(bval[i] * 1_000_000)
            xxs = _round_half_up(bval[i] * bval[i] * 1_000_000)
            win_us.append(bus[i])
            win_xs.append(xs)
            win_xxs.append(xxs)
            run_n += 1
            run_sx += xs
            run_sxx += xxs
        for i in group:
            n = run_n
            if n < 30:
                continue
            sx_d = run_sx / 1_000_000.0
            sxx_d = run_sxx / 1_000_000.0
            var_num = sxx_d - sx_d * sx_d / n
            if not var_num > 0:
                continue
            z = (bval[i] - sx_d / n) / math.sqrt(var_num / (n - 1))
            if abs(z) > 3:
                rows.append({"event_type": event_type,
                             "event_id": bid[i], "value": bval[i],
                             "n_window": n, "zscore": z})
        consumed.extend(group)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bval[i]
    state.update((win_us, win_xs, win_xxs, run_n, run_sx, run_sxx,
                  bus, bid, bval))
    if bus:
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(rows, columns=["event_type", "event_id",
                                      "value", "n_window", "zscore"])


def streaming_zscore_anomaly(events: DataFrame,
                             delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_anomaly_zscore: per-type
    trailing-1h |z| > 3 flags in event-time order, exact scaled-long
    window sums carried as O(window) state — see _advance_zscore."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .select("event_type", "event_id",
                        F.unix_micros("ts").alias("us"), "value", "ts"))
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _advance_zscore,
                outputStructType=_ZS_OUT,
                stateStructType=_ZS_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_PH_OUT = ("event_type string, event_id long, us long, "
           "excursion_w long, alarm boolean")
_PH_STATE = ("m long, mmin long, n_sealed long, buf_us array<long>, "
             "buf_id array<long>, buf_dev array<long>")


def _advance_page_hinkley(key, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct streaming Page-Hinkley per event type: the
    committed state is the cumulative deviation m, its running minimum
    M over OBSERVED prefix sums, and the sealed-event count, plus the
    watermark-bounded unsealed buffer — O(1) per type. Each sealed
    event applies m += dev; M = m on the FIRST sealed event and
    min(M, m) after (the batch grouped-prefix MIN ranges over m_1..m_t
    only — no implicit m_0 = 0 — so the first sealed event's excursion
    is always 0; ADVICE r10 aligned this seed); excursion = m - M —
    pure integer arithmetic, so every emitted row equals the batch
    grouped-prefix form (events_page_hinkley's m/mm columns)
    BIT-FOR-BIT over the same sealed prefix. The reference mean arrives pre-joined on the input
    rows (stream-static join against a trained baseline — the
    deployment shape: the batch query LEARNS mu, the stream MONITORS
    with it)."""
    (event_type,) = key
    if state.exists:
        g = state.get
        m, mmin, n_sealed = g[0], g[1], g[2]
        bus, bid, bdev = list(g[3]), list(g[4]), list(g[5])
    else:
        m, mmin, n_sealed = 0, 0, 0
        bus, bid, bdev = [], [], []
    drained_on_entry = not bus  # retention pattern, see _advance_holt
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, dev in zip(pdf["us"], pdf["event_id"],
                                    pdf["dev"]):
                bus.append(int(us))
                bid.append(int(eid))
                bdev.append(int(dev))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break
        m += bdev[i]
        n_sealed += 1
        if n_sealed == 1 or m < mmin:
            mmin = m
        exc = m - mmin
        rows.append({"event_type": event_type, "event_id": bid[i],
                     "us": bus[i], "excursion_w": exc,
                     "alarm": exc > _PH_STREAM_LAMBDA_W})
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bdev[i]
    if bus:
        state.update((m, mmin, n_sealed, bus, bid, bdev))
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    elif state.hasTimedOut and drained_on_entry:
        state.remove()  # retention horizon passed on drained state
    else:
        state.update((m, mmin, n_sealed, bus, bid, bdev))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + _STATE_RETAIN_MS)
    yield pd.DataFrame(rows, columns=["event_type", "event_id", "us",
                                      "excursion_w", "alarm"])


_PH_STREAM_LAMBDA_W = 1_000_000_000  # 1000.0 scaled 1e6 (batch twin)


def streaming_page_hinkley(events: DataFrame,
                           mu: DataFrame,
                           delay: str = "0 seconds",
                           delta_w: int = 500_000) -> DataFrame:
    """Streaming twin of the batch events_page_hinkley: per-type
    running cumulative deviation + minimum in event-time order, one
    row per sealed event with its excursion and alarm flag. `mu` is a
    STATIC (event_type, muw) frame — the trained reference mean from
    the batch pass, joined stream-static so the detector monitors
    against a fixed baseline (the standard two-pass PH deployment).
    Committed state per type is two longs; the emitted excursion at
    sealed position i equals the batch grouped-prefix (m - mm) over
    the same prefix exactly (integer arithmetic end to end)."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .join(F.broadcast(mu), "event_type")
                .select("event_type", "event_id",
                        F.unix_micros("ts").alias("us"),
                        (F.round(F.col("value") * 1_000_000)
                         .cast("long") - F.col("muw")
                         - F.lit(delta_w)).alias("dev"), "ts"))
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _advance_page_hinkley,
                outputStructType=_PH_OUT,
                stateStructType=_PH_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_SAX_SEG = 8          # hours per PAA segment (batch twin constant)
_SAX_BP_W = 674490    # round(0.6745 * 1e6) — N(0,1) quartile breakpoints
_SAX_HOUR_US = 3_600_000_000
_SAX_OUT = ("seg long, seg_n long, paa_mean double, z double, "
            "symbol string")
_SAX_STATE = "seg_sv long, seal_us long, n long, sv long, svv long"


def _spark_half_up(x: float) -> int:
    """Bit-exact twin of Spark's round(double) -> long: Java BigDecimal
    HALF_UP on the double's exact decimal expansion. Python's Decimal
    constructor preserves the binary value exactly, so quantize
    HALF_UP reproduces the JVM decision at every boundary."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _advance_sax(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct streaming SAX per 8-hour PAA segment: the
    committed state is ONE long (the segment's event count — the PAA
    numerator, since zero-count grid hours add nothing to the sum)
    plus the precomputed seal timestamp and the trained whole-series
    moments riding along — O(1) per open segment (VERDICT r10 ask #6:
    the per-seg PAA fold is O(1) state, the events_page_hinkley
    pattern). A segment SEALS when the watermark passes its end (+1h
    float-edge slack, see streaming_sax): it emits exactly the batch
    events_sax_symbols row — paa_mean, the 1e-6-pinned z, and the
    quartile symbol, every float op replicated in batch expression
    order so the row is bit-for-bit equal — and drops its state."""
    (seg,) = key
    if state.exists:
        seg_sv, seal_us, n, sv, svv = state.get
    else:
        seg_sv, seal_us, n, sv, svv = 0, None, None, None, None
    if not state.hasTimedOut:
        for pdf in pdfs:
            seg_sv += len(pdf)
            if seal_us is None and len(pdf):
                seal_us = int(pdf["seal_us"].iloc[0])
                n = int(pdf["mn"].iloc[0])
                sv = int(pdf["msv"].iloc[0])
                svv = int(pdf["msvv"].iloc[0])
    wm_us = state.getCurrentWatermarkMs() * 1000
    if seal_us is not None and wm_us >= seal_us:
        # batch expression order: paa_mean = double(seg_sv)/double(8);
        # mu = double(sv)/double(n); std = sqrt((n*svv - sv*sv) /
        # (n*(n-1))); zw = round((paa_mean - mu)/std * 1e6)
        paa_mean = float(seg_sv) / float(_SAX_SEG)
        mu = float(sv) / float(n)
        std = ((float(n) * float(svv) - float(sv) * float(sv))
               / (float(n) * float(n - 1))) ** 0.5
        zw = _spark_half_up((paa_mean - mu) / std * 1_000_000.0)
        symbol = ("a" if zw < -_SAX_BP_W else
                  "b" if zw < 0 else
                  "c" if zw < _SAX_BP_W else "d")
        state.remove()
        yield pd.DataFrame(
            [{"seg": seg, "seg_n": _SAX_SEG, "paa_mean": paa_mean,
              "z": float(zw) / 1e6, "symbol": symbol}],
            columns=["seg", "seg_n", "paa_mean", "z", "symbol"])
        return
    state.update((seg_sv, seal_us, n, sv, svv))
    if seal_us is not None:
        state.setTimeoutTimestamp(max(seal_us // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(columns=["seg", "seg_n", "paa_mean", "z",
                                "symbol"])


def streaming_sax(events: DataFrame, moments: DataFrame,
                  delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the batch events_sax_symbols: PAA over 8-hour
    segments of the hourly event-count series, z-normalized against
    TRAINED whole-series moments, emitted as the 4-letter quartile
    symbol when the watermark seals the segment. `moments` is a STATIC
    single-row (tmin, n, sv, svv) frame — the batch pass learns the
    anchor and the series moments, the stream symbolizes against them
    (the same two-pass deployment shape as streaming_page_hinkley).

    hr/seg are computed with the IDENTICAL Spark expressions as the
    batch plan (double division + cast), so segment assignment can
    never diverge; the seal threshold adds one hour of slack so the
    float-edge case (an event at an exact segment boundary truncating
    down) can only DELAY a seal, never split a segment. Only FULL
    segments seal — the trailing partial segment has no end the stream
    can observe, so it stays open by design (the batch row carries it).

    Emitted rows are bit-for-bit equal to the batch rows for every
    sealed segment; committed state is O(1) per open segment."""
    from pyspark.sql import functions as F

    m = (moments.select(F.col("tmin").cast("long").alias("tmin"),
                        F.col("n").cast("long").alias("mn"),
                        F.col("sv").cast("long").alias("msv"),
                        F.col("svv").cast("long").alias("msvv"),
                        F.lit(1).alias("_k")))
    prepared = (events
                .withWatermark("ts", delay)
                .withColumn("_k", F.lit(1))
                .join(F.broadcast(m), "_k")
                .select(F.unix_micros("ts").alias("us"),
                        "tmin", "mn", "msv", "msvv", "ts"))
    hr = ((F.col("us") - F.col("tmin"))
          / F.lit(_SAX_HOUR_US)).cast("long")
    seg = (hr / _SAX_SEG).cast("long")
    prepared = prepared.select(
        seg.alias("seg"), "mn", "msv", "msvv",
        (F.col("tmin") + (seg + 1) * F.lit(_SAX_SEG * _SAX_HOUR_US)
         + F.lit(_SAX_HOUR_US)).alias("seal_us"), "ts")
    return (prepared
            .groupBy("seg")
            .applyInPandasWithState(
                _advance_sax,
                outputStructType=_SAX_OUT,
                stateStructType=_SAX_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


_CU_OUT = ("event_type string, event_id long, us long, "
           "cum_dev_w long, max_abs_w long")
_CU_STATE = ("m long, maxabs long, buf_us array<long>, "
             "buf_id array<long>, buf_dev array<long>")


def _advance_cusum(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Watermark-correct streaming CUSUM monitor per event type: the
    committed state is TWO scaled longs — the cumulative deviation m
    from the TRAINED mean and the running max of |m| — plus the
    watermark-bounded unsealed buffer, O(1) per type. Each sealed
    event applies m += dev; M = max(M, |m|) — pure integer
    arithmetic, so every emitted row equals a batch grouped-prefix
    fold over the same sealed prefix BIT-FOR-BIT (the
    events_cusum_drift statistic's per-position numerator against a
    fixed mean: the batch query's two-pass n*prefix - i*total form
    equals prefix - i*mu scaled by n when mu = total/n is what the
    stream was trained with). |m| seeds at the first sealed event
    (there is no implicit position 0), mirroring the Page-Hinkley
    seed convention (ADVICE r10)."""
    (event_type,) = key
    if state.exists:
        g = state.get
        m, maxabs = g[0], g[1]
        bus, bid, bdev = list(g[2]), list(g[3]), list(g[4])
    else:
        m, maxabs = 0, 0
        bus, bid, bdev = [], [], []
    drained_on_entry = not bus
    if not state.hasTimedOut:
        for pdf in pdfs:
            for us, eid, dev in zip(pdf["us"], pdf["event_id"],
                                    pdf["dev"]):
                bus.append(int(us))
                bid.append(int(eid))
                bdev.append(int(dev))
    wm_us = state.getCurrentWatermarkMs() * 1000
    order = sorted(range(len(bus)), key=lambda i: (bus[i], bid[i]))
    rows = []
    consumed = []
    for i in order:
        if bus[i] > wm_us:
            break
        m += bdev[i]
        a = m if m >= 0 else -m
        if a > maxabs:
            maxabs = a
        rows.append({"event_type": event_type, "event_id": bid[i],
                     "us": bus[i], "cum_dev_w": m,
                     "max_abs_w": maxabs})
        consumed.append(i)
    for i in sorted(consumed, reverse=True):
        del bus[i], bid[i], bdev[i]
    if bus:
        state.update((m, maxabs, bus, bid, bdev))
        state.setTimeoutTimestamp(max(min(bus) // 1000 + 1,
                                      state.getCurrentWatermarkMs() + 1))
    elif state.hasTimedOut and drained_on_entry:
        state.remove()
    else:
        state.update((m, maxabs, bus, bid, bdev))
        state.setTimeoutTimestamp(
            state.getCurrentWatermarkMs() + _STATE_RETAIN_MS)
    yield pd.DataFrame(rows, columns=["event_type", "event_id", "us",
                                      "cum_dev_w", "max_abs_w"])


def streaming_cusum(events: DataFrame, mu: DataFrame,
                    delay: str = "0 seconds") -> DataFrame:
    """Streaming twin of the events_cusum_drift monitoring shape: the
    batch pass LEARNS the per-type mean (muw, a pinned scaled long),
    the stream maintains the cumulative deviation from it and the
    running |max| in event-time order — emitting one row per sealed
    event with both integers. Committed state is two longs per type;
    every emitted value equals the batch grouped-prefix fold over the
    same sealed prefix exactly (integer arithmetic end to end). The
    change-POINT question (argmax position) stays batch; the stream
    answers the monitoring question ('how far has the level drifted
    from the trained baseline RIGHT NOW')."""
    from pyspark.sql import functions as F

    prepared = (events
                .withWatermark("ts", delay)
                .join(F.broadcast(mu), "event_type")
                .select("event_type", "event_id",
                        F.unix_micros("ts").alias("us"),
                        (F.round(F.col("value") * 1_000_000)
                         .cast("long") - F.col("muw")).alias("dev"),
                        "ts"))
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _advance_cusum,
                outputStructType=_CU_OUT,
                stateStructType=_CU_STATE,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
