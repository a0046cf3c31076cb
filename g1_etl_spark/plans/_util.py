"""Cross-engine determinism helpers shared by plan modules.

IEEE double addition is not associative, and Spark's partial/final
aggregation order differs from DuckDB's single-node order — so a naive
``SUM(double)`` hash-mismatches the oracle. Every money/measure sum goes
through an exact decimal instead:

    Spark : F.sum(col.cast(DECIMAL(38, s))).cast("double")
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(38, s))) AS DOUBLE)

The per-row double -> decimal cast is deterministic (both engines see
bit-identical doubles and round to the same decimal — synthetic prices
have <= 2 fractional digits so scale-6 midpoint ties cannot occur), the
decimal sum is exact/associative, and the final decimal -> double cast is
exact for these magnitudes. Result: bit-identical aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive double sum (exact decimal accumulation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-insensitive double mean: exact decimal sum / bigint count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}")
