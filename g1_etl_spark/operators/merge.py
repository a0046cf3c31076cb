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


def merge_partial_aggregates(base_agg: DataFrame, delta_agg: DataFrame,
                             keys: list[str],
                             spec: dict[str, str]) -> DataFrame:
    """Incremental aggregate maintenance: combine a STORED aggregate
    with a fresh delta batch's aggregate — the materialized-view
    refresh that never rescans the base table. At 100 TB the nightly
    rollup is petabytes of scans; merging partial states makes each
    refresh cost O(delta + |agg|).

    `spec` maps measure column -> merge function: 'sum' and 'count'
    merge by adding (a count IS a sum of partial counts), 'min'/'max'
    by the extremum. Only algebraic aggregates merge this way — derive
    avg as merged_sum/merged_count downstream, and keep exactness by
    storing sums as scaled longs (plans/_util.py) in the stored agg.
    Non-algebraic exact aggregates (COUNT DISTINCT, MEDIAN) don't
    compose from partials — that is precisely what the mergeable-sketch
    rollup (operators/temporal.hll_sketch_rollup) is for.

    One union + one hash-agg on the (small) aggregate frames; the base
    TABLE is never touched.
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    bad = {c: f for c, f in spec.items() if f not in _MERGE}
    assert not bad, f"non-mergeable spec entries: {bad}"
    merged = base_agg.unionByName(delta_agg)
    return merged.groupBy(*keys).agg(
        *[_MERGE[f](c).alias(c) for c, f in spec.items()])


def incremental_join_delta(base_a: DataFrame, delta_a: DataFrame,
                           base_b: DataFrame, delta_b: DataFrame,
                           on, broadcast_deltas: bool = True) -> DataFrame:
    """Incremental maintenance of a stored inner-join view (the
    classic delta rule): with new rows dA and dB arriving on top of A
    and B, the stored A⋈B needs exactly

        dA ⋈ B  ∪  A ⋈ dB  ∪  dA ⋈ dB

    appended — (A∪dA)⋈(B∪dB) = A⋈B ∪ the three delta terms, provided
    the deltas are pure inserts. Returns the append set.

    Scale shape: this is the whole point at 100 TB — the stored view
    is NEVER rescanned and the big sides A and B are only ever joined
    against a delta. Deltas are batch-sized, so both cross terms are
    broadcast-hash joins against a fact scan, and dA⋈dB is
    broadcast-vs-broadcast; nothing shuffles A or B.
    """
    # deltas are batch-sized by contract (same rationale as
    # incremental_exact_flags broadcasting the batch side) — the
    # explicit hint keeps A and B un-shuffled even when size stats lag.
    # A large delta (e.g. a backfill replay) would turn the forced
    # broadcast into an opaque broadcast-size/OOM failure, so callers
    # replaying history pass broadcast_deltas=False to degrade to a
    # shuffle join instead of inheriting the batch-sized contract.
    hint = F.broadcast if broadcast_deltas else (lambda d: d)
    terms = [
        hint(delta_a).join(base_b, on),
        base_a.join(hint(delta_b), on),
        delta_a.join(hint(delta_b), on),
    ]
    return reduce(lambda x, y: x.unionByName(y), terms)
