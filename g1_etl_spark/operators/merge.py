"""MERGE / upsert operators — the batch form of a Delta-style
``MERGE INTO`` for pipelines that maintain a continuously-updated corpus
or dimension snapshot (SCD type 1: update-in-place, no history; the
history-keeping SCD2 twin is operators/temporal.scd2_intervals).

Two physical shapes, chosen by update semantics:

  - `upsert` (whole-row updates): anti-join the base against the update
    keys, union the updates. The anti join is BROADCASTABLE when the
    update batch is small — the common case for incremental loads — so
    the big base table is never shuffled at all. This is the 100 TB
    shape: a day's update batch against a full-corpus snapshot costs one
    broadcast + one narrow scan.
  - `merge_scd1` (partial-column updates, NULL = keep old): full-outer
    join on the keys + per-column coalesce. A full outer join cannot
    broadcast (both sides may produce unmatched rows), so this one
    shuffles both sides on the key — use it only when updates genuinely
    carry partial rows.

No reference analog (the reference rebuilds payloads from scratch each
run); superset operator per SURVEY.md §2.11.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame,
           keys: list[str]) -> DataFrame:
    """Whole-row upsert: rows of `updates` win on key collision, base
    rows without a matching update pass through, new update keys insert.

    Equivalent SQL: ``SELECT * FROM updates UNION ALL SELECT b.* FROM
    base b ANTI JOIN updates u USING (keys)``.
    """
    survivors = base.join(F.broadcast(updates.select(*keys).distinct()),
                          keys, "left_anti")
    return survivors.unionByName(updates.select(*base.columns))


def merge_scd1(base: DataFrame, updates: DataFrame,
               keys: list[str]) -> DataFrame:
    """Partial-column merge: non-NULL update columns overwrite, NULLs
    keep the base value; unmatched update rows insert as-is.

    NOTE: a NULL in an update column means "keep old" under these
    semantics — callers who need to SET NULL must use `upsert`.
    """
    cols = base.columns
    non_keys = [c for c in cols if c not in keys]
    joined = base.alias("b").join(
        updates.alias("u"),
        reduce(lambda a, b: a & b,
               [F.col(f"b.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]),
        "full_outer")
    return joined.select(
        *[F.coalesce(F.col(f"b.{k}"), F.col(f"u.{k}")).alias(k)
          for k in keys],
        *[F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
          for c in non_keys])
