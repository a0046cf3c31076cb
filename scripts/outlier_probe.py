#!/usr/bin/env python3
"""Per-stage attribution of the two 100x-probe outliers (VERDICT r10
ask #3): graph_link_prediction read 23.3x and graph_mst_boruvka 12.2x
at 100x trade data (PROBE_r10_100x) vs 1.1-4.4x for family peers.

Both queries share the same structure: ONE data-sized stage (the
nation-level edge census over 100x lineitem/orders) feeding a
25-node-bounded algorithm (wedge scoring / driver union-find rounds).
This probe times the census stage and the full query separately at 1x
and 100x, so the ratio decomposes into

    total(nx) = census(nx) + fixed(nx)

with the expectation census ~ linear in data (exponent 1.0 — it is a
scan + one groupBy shuffle) and fixed ~ constant. If fixed(100x) >>
fixed(1x) something downstream really scales with data and needs a
rewrite; if census dominates, the "outlier" is just a query whose
FIXED part is small relative to its census (peers like betweenness
carry ~10 s of fixed round cost that masks the same census growth).

Reuses the scale_probe trade replicas (/tmp/scale_probe/trade_x{1,N}).
Writes PROBE_r11_outliers.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/tmp/scale_probe"
COPIES = 100
NX_PARTS = 64


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    from pyspark.sql import functions as F

    from g1_etl_spark.plans import REGISTRY
    from g1_etl_spark.plans.graph_plans import (_sparsified_top3,
                                                _trade_edges)
    from g1_etl_spark.session import get_spark

    spark = get_spark(app_name="outlier_probe")
    spark.sparkContext.setLogLevel("ERROR")
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def census_linkpred(sf_dir: str):
        # the plan's `und` frame, pre-checkpoint (graph_plans.py)
        return (_sparsified_top3(spark, sf_dir)
                .select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
                .distinct())

    def census_boruvka(sf_dir: str):
        # the plan's `undw` frame, pre-checkpoint
        edges = (_trade_edges(spark, sf_dir)
                 .filter(F.col("src") != F.col("dst")))
        return (edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.round(F.col("weight") * 1_000_000).cast("long")
            .alias("ww"))
            .groupBy("a", "b")
            .agg((F.sum("ww").cast("double") / 1e6).alias("w")))

    targets = {
        "graph_link_prediction": census_linkpred,
        "graph_mst_boruvka": census_boruvka,
    }
    results: dict = {}
    for name, census in targets.items():
        row: dict = {}
        for tag, sf_dir, parts in (
                ("x1", f"{BASE}/trade_x1", base_parts),
                (f"x{COPIES}", f"{BASE}/trade_x{COPIES}", NX_PARTS)):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                # warm the file cache once untimed, then interleave
                # full/census trials so neither side benefits from a
                # warmer cache than the other
                _force(census(sf_dir))
                tc, tf = [], []
                for _ in range(2):
                    t0 = time.perf_counter()
                    _force(REGISTRY[name].fn(spark, sf_dir))
                    tf.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    _force(census(sf_dir))
                    tc.append(time.perf_counter() - t0)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions",
                               str(base_parts))
                spark.catalog.clearCache()
                jsc = spark.sparkContext._jsc
                for r in jsc.getPersistentRDDs().values():
                    r.unpersist()
            row[tag] = {"census_sec": round(min(tc), 3),
                        "full_sec": round(min(tf), 3),
                        "fixed_sec": round(min(tf) - min(tc), 3),
                        "parts": parts}
            print(name, tag, row[tag], flush=True)
        c1, cn = row["x1"]["census_sec"], row[f"x{COPIES}"]["census_sec"]
        f1, fn = row["x1"]["fixed_sec"], row[f"x{COPIES}"]["fixed_sec"]
        row["census_ratio"] = round(cn / c1, 2) if c1 > 0 else None
        row["fixed_ratio"] = round(fn / f1, 2) if f1 > 0 else None
        results[name] = row

    out = {
        "copies": COPIES,
        "methodology": "stage split: census = the one data-sized frame "
                       "(pre-checkpoint edge aggregate), forced with "
                       "the noop sink, min-of-2; fixed = full - census "
                       "(the 25-node-bounded algorithm). Same replicas "
                       "and partition override as PROBE_r10_100x.",
        "queries": results,
    }
    path = os.path.join(ROOT, "PROBE_r11_outliers.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
