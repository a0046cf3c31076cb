#!/usr/bin/env python3
"""Capture .explain('formatted') for named registered queries into
plans/r11/<query>_<tag>.txt (driver-judge evidence for the optimization
round). Usage:

    python scripts/explain_capture.py <tag> <query> [<query> ...]

Tag is 'before' or 'after'. SF dir from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from g1_etl_spark.plans import REGISTRY  # noqa: E402
from g1_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    os.environ.get("PLANS_ROUND", "r12"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"explain_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going; record the failure
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({tag})\n")
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
