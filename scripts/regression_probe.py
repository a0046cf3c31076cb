#!/usr/bin/env python3
"""Isolated re-probe of bench regressions (VERDICT_r9 ask #3).

BENCH_LOCAL_r09 showed three min-of-trials regressions above the 1.108x
host canary: q21_blame_bucketed 1.63x, corpus_decontaminate 1.55x,
dedup_ngram_jaccard 1.34x. Those numbers came from a 121-query combined
bench session (shared JVM, cache pressure, ambient load). This probe
applies the PROBE_r09_1000x_zscore methodology: each query runs as the
SOLE query of its own subprocess (fresh JVM), behind a quiet-host gate,
min-of-5 with cache drops between trials. The canary runs the same way
so host drift is separable from plan drift.

Writes PROBE_r10_regressions.json comparing the isolated min to the r8
and r9 combined-session mins.

Usage:
    python scripts/regression_probe.py                  # default set
    python scripts/regression_probe.py --queries a,b    # custom
    python scripts/regression_probe.py --single NAME    # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT = ["q1_pricing_summary",           # canary
           "q21_blame_bucketed", "corpus_decontaminate",
           "dedup_ngram_jaccard"]


def _session_prelude(spark, bench, skip: str, n: int = 40) -> float:
    """Age the JVM the way the combined bench does (VERDICT_r11 ask #8):
    run a deterministic sample of OTHER headline queries once each in
    this same session before timing the target, so the measurement sees
    the shared-JVM state (codegen cache population, GC pressure, py4j
    churn) instead of a fresh process. Returns the prelude wall time."""
    import time as _t

    sample = [q for q in bench.HEADLINE if q != skip]
    step = max(1, len(sample) // n)
    t0 = _t.perf_counter()
    for q in sample[::step][:n]:
        bench._force(bench.REGISTRY[q].fn(spark, bench.SF_DIR))
        bench._drop_cached(spark)
    return round(_t.perf_counter() - t0, 1)


def _single(name: str, trials: int, in_session: bool = False) -> None:
    """Run one query, min-of-N, in THIS process; print one JSON line."""
    import bench  # noqa: E402  (repo root on sys.path)
    from g1_etl_spark.plans import REGISTRY
    from g1_etl_spark.session import get_spark

    spark = get_spark(app_name=f"regression_probe_{name}")
    spark.sparkContext.setLogLevel("ERROR")
    fn = REGISTRY[name].fn
    prelude_sec = None
    if in_session:
        prelude_sec = _session_prelude(spark, bench, skip=name)
    # codegen warm at the smoke SF, same as bench
    bench._force(fn(spark, "/root/testdata/sf0.001"))
    bench._drop_cached(spark)
    warm = None
    if name in bench.WARM_FIRST:
        t0 = time.perf_counter()
        bench._force(fn(spark, bench.SF_DIR))
        warm = round(time.perf_counter() - t0, 3)
        bench._drop_cached(spark)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        bench._force(fn(spark, bench.SF_DIR))
        times.append(round(time.perf_counter() - t0, 3))
        bench._drop_cached(spark)
    print(json.dumps({"name": name, "times": times,
                      "min": min(times), "warm_sec": warm,
                      "prelude_sec": prelude_sec,
                      "load": round(os.getloadavg()[0], 2)}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT))
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--single", default=None)
    ap.add_argument("--out", default="PROBE_r10_regressions.json")
    ap.add_argument("--in-session", action="store_true",
                    help="age the JVM with a ~40-query headline prelude "
                         "in the same session before timing (the "
                         "combined-bench context), instead of a fresh-"
                         "JVM steady state — VERDICT_r11 ask #8: claims "
                         "should cite BOTH numbers")
    args = ap.parse_args()

    if args.single:
        _single(args.single, args.trials, in_session=args.in_session)
        return 0

    import bench
    load0, load_gate = bench._quiet_host_gate()
    prior = {}
    for rnd in (8, 9, 10):
        p = os.path.join(ROOT, f"BENCH_LOCAL_r{rnd:02d}.json")
        if not os.path.exists(p):
            p = os.path.join(ROOT, f"BENCH_LOCAL_r{rnd}.json")
        if os.path.exists(p):
            with open(p) as f:
                prior[rnd] = json.load(f).get("queries_min", {})

    results = {}
    for name in args.queries.split(","):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--single", name, "--trials", str(args.trials)]
        if args.in_session:
            cmd.append("--in-session")
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")][-1]
        row = json.loads(line)
        for rnd, mins in prior.items():
            base = mins.get(name)
            row[f"r{rnd}_min"] = base
            if base:
                row[f"isolated_vs_r{rnd}"] = round(row["min"] / base, 2)
        results[row.pop("name")] = row
        print(name, json.dumps(row))

    out = {"methodology": "one fresh JVM per query (subprocess), "
                          "quiet-host gate, codegen warm at sf0.001, "
                          f"min-of-{args.trials} at {bench.SF_DIR} with "
                          "cache drops between trials; canary "
                          "q1_pricing_summary measured identically"
                          + ("; IN-SESSION mode: each JVM first runs a "
                             "~40-query headline prelude to reproduce "
                             "combined-bench aging" if args.in_session
                             else ""),
           "load_avg_initial": load0, "load_avg_gate_cleared": load_gate,
           "queries": results}
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
