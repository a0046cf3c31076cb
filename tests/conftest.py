from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from g1_etl_spark.session import get_spark

    spark = get_spark(app_name="g1_etl_spark_tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views
    (mirrors the driver's oracle setup) at sf0.001 for speed."""
    import duckdb

    from g1_etl_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_driver_scale():
    """DuckDB views at sf0.01 — the EXACT scale the grading driver
    compares at, so banked green rows can't silently rot between
    driver-window visits (sf0.001 parity alone misses data-dependent
    regressions that only appear with 10x rows)."""
    import duckdb

    from g1_etl_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()
