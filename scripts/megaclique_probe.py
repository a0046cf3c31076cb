#!/usr/bin/env python3
"""Mega-clique / pathological-topology probe (VERDICT_r9 asks #2 + #6).

Two skew classes the sf0.1 bench never exercises:

1. **Mega-clique canonical pick** — on a real corpus one boilerplate
   template becomes ONE connected component holding 10^5+ docs. The
   r9 implementation ranked it with `Window.partitionBy("component")`,
   which sorts the whole clique in a single task. The r10 rewrite is a
   min_by aggregate + join-back. This probe builds a synthetic
   (doc_id, component, weight) frame with one 10^5-doc component at
   100x background scale and times BOTH formulations head-to-head.

2. **Pathological component topologies** — a 10^5-node chain (diameter
   10^5: min-label propagation would need 10^5 rounds and the old
   max_iters=20 would have returned silently wrong labels) and a
   10^5-leaf star, through the r10 large-star/small-star contraction
   (O(log n) rounds on any topology).

Emits PROBE_r10_megaclique.json at the repo root.

Usage: python scripts/megaclique_probe.py [--clique 100000] [--bg 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_spark():
    from pyspark.sql import SparkSession
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
            .appName("megaclique_probe").getOrCreate())


def synth_components(spark, clique: int, bg: int):
    """(doc_id, component, weight): one `clique`-sized component 0 plus
    `bg` docs spread over bg/8-sized small components."""
    from pyspark.sql import functions as F
    mega = spark.range(clique).select(
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("component"),
        (F.xxhash64("id") % 1000 + 1000).alias("weight"))
    small = spark.range(clique, clique + bg).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % (bg // 8) + 1).cast("long").alias("component"),
        (F.xxhash64("id") % 1000 + 1000).alias("weight"))
    return mega.unionAll(small).repartition(64).localCheckpoint()


def canonical_window(j):
    """The r9 shape: component-partitioned rank window (kept here only
    as the probe's control arm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    win = Window.partitionBy("component").orderBy(
        F.desc("weight"), "doc_id")
    cw = Window.partitionBy("component")
    return (j.withColumn("rn", F.row_number().over(win))
            .withColumn("cluster_size",
                        F.count(F.lit(1)).over(cw).cast("long"))
            .select("doc_id", "component", "weight", "cluster_size",
                    (F.col("rn") == 1).alias("is_canonical")))


def canonical_minby(j):
    """The r10 shape: min_by aggregate + join-back (mirrors
    plans/dedup_plans.py dedup_canonical_keep)."""
    from pyspark.sql import functions as F
    canon = j.groupBy("component").agg(
        F.min_by("doc_id",
                 F.struct((-F.col("weight")).alias("nw"),
                          F.col("doc_id").alias("d"))).alias("canon_doc"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (j.join(canon, "component")
            .select("doc_id", "component", "weight", "cluster_size",
                    (F.col("doc_id") == F.col("canon_doc"))
                    .alias("is_canonical")))


def time_count(df) -> tuple[float, int]:
    # noop write forces FULL materialization of every column — a bare
    # count() lets Catalyst prune the Window operator entirely (it does
    # not change cardinality), which would time nothing
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    sec = round(time.time() - t0, 2)
    return sec, df.count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clique", type=int, default=100_000)
    ap.add_argument("--bg", type=int, default=10_000_000)
    ap.add_argument("--chain", type=int, default=100_000)
    ap.add_argument("--star", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from g1_etl_spark.operators import dedup as D

    spark = build_spark()
    out: dict = {"clique": args.clique, "bg": args.bg,
                 "chain": args.chain, "star": args.star,
                 "load_avg_initial": os.getloadavg()[0]}

    # -- 1: canonical pick over a mega-clique component -----------------
    j = synth_components(spark, args.clique, args.bg)
    sec_w, n_w = time_count(canonical_window(j))
    sec_a, n_a = time_count(canonical_minby(j))
    assert n_w == n_a == args.clique + args.bg
    # value equivalence on the canonical verdicts
    mism = (canonical_window(j).select("doc_id", "is_canonical")
            .exceptAll(canonical_minby(j)
                       .select("doc_id", "is_canonical")).count())
    out["canonical_pick"] = {
        "rows": n_a, "window_sec": sec_w, "minby_sec": sec_a,
        "speedup": round(sec_w / sec_a, 2) if sec_a else None,
        "verdict_mismatches": mism,
    }
    print(f"canonical pick  window={sec_w}s  min_by={sec_a}s  "
          f"mismatches={mism}")

    # -- 2: connected components on chain + star ------------------------
    chain = spark.range(1, args.chain).select(
        F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
    hub = 10_000_000
    star = spark.range(1, args.star + 1).select(
        F.lit(hub).cast("long").alias("d1"),
        (F.lit(hub) + F.col("id")).alias("d2"))
    pairs = chain.unionAll(star).localCheckpoint()
    nodes = (spark.range(1, args.chain + 1)
             .unionAll(spark.range(hub, hub + args.star + 1))
             .select(F.col("id").alias("doc_id")).localCheckpoint())
    t0 = time.time()
    comps = D.connected_components(pairs, nodes).localCheckpoint()
    cc_sec = round(time.time() - t0, 2)
    agg = {r["component"]: r["n"] for r in
           comps.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    assert agg == {1: args.chain, hub: args.star + 1}, agg
    out["connected_components"] = {
        "chain_nodes": args.chain, "star_nodes": args.star + 1,
        "sec": cc_sec, "components": len(agg), "correct": True,
    }
    print(f"star-contraction CC over {args.chain}-chain + "
          f"{args.star}-star: {cc_sec}s, labels exact")

    out["load_avg_final"] = os.getloadavg()[0]
    out["methodology"] = (
        "noop-write forced materialization (a bare count() lets "
        "Catalyst prune an unreferenced Window and times nothing); "
        "window arm = the r9 component-partitioned rank window kept "
        "as control; minby arm = the shipped r10 aggregate+join-back")
    path = os.path.join(ROOT, "PROBE_r10_megaclique.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
