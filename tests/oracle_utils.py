"""Local replica of the driver's oracle compare.

The driver sorts columns by name, then hashes values order-insensitively.
We reproduce that (strictly: exact value equality after canonicalization),
so any query passing here passes any reasonable hash-based compare.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr is the shortest round-trip form — identical bits => identical text
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def compare(df, con, sql, name="query"):
    scols, srows = spark_result(df)
    dcols, drows = duck_result(con, sql)
    assert sorted(scols) == sorted(dcols), (
        f"{name}: column names differ\n spark={sorted(scols)}\n duck ={sorted(dcols)}")
    assert len(srows) == len(drows), (
        f"{name}: row count differs: spark={len(srows)} duck={len(drows)}")
    s = canon_rows(scols, srows)
    d = canon_rows(dcols, drows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(
            f"{name}: values differ; first diffs (spark vs duck): {diffs}")
