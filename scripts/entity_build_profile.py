#!/usr/bin/env python3
"""Profile WHERE entity_org_payload_json's driver time goes (r12 ask #3).

Phases measured separately, fresh JVM:
  1. per-builder CONSTRUCTION time (py4j expression-tree building, no
     action) for each of the six entity folds;
  2. the same with cProfile so py4j socket wait vs Python self-time is
     attributable;
  3. full query end-to-end for reference.

Usage: python scripts/entity_build_profile.py [--cprofile]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from g1_etl_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="entity_build_profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the py4j path so first-call overheads don't pollute builder 1
    spark.range(10).selectExpr("sum(id)").collect()

    from g1_etl_spark.plans import entity_plans as ep

    names = ["settings", "employees", "members", "products", "vendors",
             "physicians"]

    def builders():
        from g1_etl_spark.entities import (employees as emp, members as mem,
                                           physicians as phys,
                                           vendors as vend)

        def fold(df, name):
            lst = F.sort_array(F.collect_list(F.struct(
                F.col("_id").alias("k"), F.col("doc").alias("d"))))
            return df.agg(F.transform(lst, lambda x: x["d"]).alias(name))

        return [
            lambda: fold(ep._settings_doc(spark, SF_DIR), "settings"),
            lambda: fold(emp.transform(ep._users_like(spark, SF_DIR),
                                       ep._dispensary_users_like(spark,
                                                                 SF_DIR),
                                       1, 420, fake_email=False,
                                       debug=False), "employees"),
            lambda: fold(mem.transform(ep._customers_like(spark, SF_DIR),
                                       1, 420), "members"),
            lambda: fold(ep._products_doc(spark, SF_DIR), "products"),
            lambda: fold(vend.transform(ep._vendors_like(spark, SF_DIR),
                                        1, 420), "vendors"),
            lambda: fold(phys.transform(ep._physicians_like(spark, SF_DIR),
                                        1, 420), "physicians"),
        ]

    # --- phase 1: per-builder construction (no action) ---
    for rep in range(2):  # rep 2 shows steady-state (classes loaded)
        t_all = time.perf_counter()
        for name, b in zip(names, builders()):
            t0 = time.perf_counter()
            b()
            print(f"rep{rep} construct {name:12s} "
                  f"{time.perf_counter() - t0:6.3f}s")
        print(f"rep{rep} construct TOTAL       "
              f"{time.perf_counter() - t_all:6.3f}s")

    # --- phase 1b: roundtrip wrapper construction ---
    t0 = time.perf_counter()
    rt = ep._org_payload_roundtrip(spark, SF_DIR)
    print(f"roundtrip full construct    {time.perf_counter() - t0:6.3f}s")

    # --- phase 2: optional cProfile of one full construction ---
    if "--cprofile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        ep._org_payload_roundtrip(spark, SF_DIR)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative")
        stats.print_stats(25)

    # --- phase 3: end-to-end (construction + jobs) ---
    from g1_etl_spark.plans import REGISTRY
    import bench

    for i in range(3):
        t0 = time.perf_counter()
        bench._force(REGISTRY["entity_org_payload_json"].fn(spark, SF_DIR))
        print(f"end-to-end trial {i}: {time.perf_counter() - t0:6.3f}s")
        bench._drop_cached(spark)


if __name__ == "__main__":
    main()
