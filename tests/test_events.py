

def test_burst_viterbi_detects_planted_burst(spark):
    """A user with 20 regular 10 s gaps, then 20 rapid 0.1 s gaps,
    then 20 regular again must be flagged with EXACTLY one burst (one
    0->1 transition on the optimal path), and a steady user with
    constant gaps with zero — cross-checked against an independent
    pure-Python Viterbi running the identical pinned recurrence."""
    import datetime
    import math

    from g1_etl_spark.plans.events_plans import events_burst_viterbi

    def mk_events(uid, gaps, eid0):
        t = datetime.datetime(2024, 1, 1)
        rows = [(uid, eid0, t, "view", 1.0, "{}")]
        for k, gp in enumerate(gaps):
            t = t + datetime.timedelta(seconds=gp)
            rows.append((uid, eid0 + k + 1, t, "view", 1.0, "{}"))
        return rows

    bursty_gaps = [10.0] * 20 + [0.1] * 20 + [10.0] * 20
    steady_gaps = [5.0] * 40
    rows = mk_events(1, bursty_gaps, 0) + mk_events(2, steady_gaps, 1000)
    df = spark.createDataFrame(
        [(e, t, u, ty, v, p) for (u, e, t, ty, v, p) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    import tempfile, shutil, os
    tmp = tempfile.mkdtemp()
    try:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
        got = {r.user_id: r for r in
               events_burst_viterbi(spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def ref(gaps):
        n_gaps = len(gaps)
        span = sum(gaps)
        a0 = n_gaps / span
        a1 = a0 * 2.0
        tau = round(math.log(n_gaps) * 1e6)
        INF = 10 ** 15
        c0, c1, b0, b1 = 0, INF, 0, 0
        for x in gaps:
            e0 = round((a0 * x - math.log(a0)) * 1e6)
            e1 = round((a1 * x - math.log(a1)) * 1e6)
            f01 = c0 + tau
            nc0 = min(c0, c1) + e0
            nb0 = b0 if c0 <= c1 else b1
            nc1 = min(f01, c1) + e1
            nb1 = b0 + 1 if f01 < c1 else b1
            c0, c1, b0, b1 = nc0, nc1, nb0, nb1
        return (b0 if c0 <= c1 else b1), min(c0, c1) / 1e6

    nb1, cost1 = ref(bursty_gaps)
    nb2, cost2 = ref(steady_gaps)
    assert nb1 == 1, "reference itself must see exactly one burst"
    assert got[1].n_bursts == nb1 == 1
    assert got[2].n_bursts == nb2 == 0
    assert abs(got[1].min_cost - cost1) < 1e-9
    assert abs(got[2].min_cost - cost2) < 1e-9
    assert got[1].in_burst_at_end is False


def test_markov_entropy_matches_python_reference(spark):
    """H(next|cur) and H(next) recomputed from the raw bigrams in
    plain Python (unpinned ln) must match the pinned integer folds to
    float tolerance, and conditioning can only reduce entropy:
    0 <= H(next|cur) <= H(next)."""
    import math
    from collections import Counter, defaultdict

    from g1_etl_spark.catalog import load_table
    from g1_etl_spark.plans.events_plans import events_markov_entropy
    from tests.conftest import SF_SMOKE

    got = events_markov_entropy(spark, SF_SMOKE).collect()[0]
    ev = (load_table(spark, SF_SMOKE, "events")
          .select("user_id", "ts", "event_id", "event_type").collect())
    series = defaultdict(list)
    for r in ev:
        series[r.user_id].append((r.ts, r.event_id, r.event_type))
    big = Counter()
    for s in series.values():
        s.sort(key=lambda t: (t[0], t[1]))
        for a, b in zip(s, s[1:]):
            big[(a[2], b[2])] += 1
    n = sum(big.values())
    row = Counter()
    for (f, _), o in big.items():
        row[f] += o
    h_cond = sum(o * math.log(row[f] / o) for (f, _), o in big.items()) / n
    h_marg = sum(r * math.log(n / r) for r in row.values()) / n
    assert got.n == n
    assert math.isclose(got.h_cond_nats, h_cond, rel_tol=1e-5)
    assert math.isclose(got.h_marginal_nats, h_marg, rel_tol=1e-5)
    assert 0.0 <= got.h_cond_nats <= got.h_marginal_nats + 1e-12
