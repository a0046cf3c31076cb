#!/usr/bin/env python3
"""Regenerate QUERIES.md from the live registry:

    python scripts/gen_query_catalog.py > QUERIES.md

One row per registered query (registration order = the order the driver
checks them), with its oracle status and description.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from g1_etl_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    print("# Query catalog\n")
    print("Auto-generated (`python scripts/gen_query_catalog.py > "
          "QUERIES.md`) from the registry behind `__spark_entry__.py`.")
    print(f"\n**{len(REGISTRY)} queries, {n_oracle} with exact DuckDB "
          "oracles** (the rest are genuinely non-SQL-expressible — "
          "iterative or hash-seeded — and carry rows-only driver checks "
          "plus local property tests). Row order = registration order = "
          "driver check order.\n")
    print("| # | query | oracle | tags | description |")
    print("|---|-------|--------|------|-------------|")
    for i, (name, spec) in enumerate(REGISTRY.items(), start=1):
        oracle = "exact SQL" if spec.oracle else "rows-only"
        tags = ", ".join(spec.tags)
        desc = " ".join(spec.description.split())
        print(f"| {i} | `{name}` | {oracle} | {tags} | {desc} |")


if __name__ == "__main__":
    main()
