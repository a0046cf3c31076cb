"""Mergeable frequency sketches (Count-Min) as pure DataFrame algebra.

No reference analog (superset scope): the reference has no sketch
surface. The Count-Min sketch here is the classic Cormode-Muthukrishnan
structure expressed as a (depth x width)-row TABLE rather than a
driver-held array: cell (j, b) holds the summed count of every key k
with h_j(k) = b. Because cell updates are plain SUMs, the sketch is a
map-side-combinable groupBy — partial sketches built per partition
merge by addition, which is exactly the property that makes CMS the
standard streaming/distributed frequency structure. Total state is
O(depth * width) regardless of key cardinality.

Engine-exactness: the row hashes are LCGs over pure int64 arithmetic —
``((a_j * k + b_j) % P) % width`` with P = 2^31 - 1 and a_j, b_j fixed
odd constants — so a SQL oracle computes bit-identical buckets,
identical cells, and identical estimates. (Spark's xxhash64 and
DuckDB's hash() disagree; arithmetic does not.) Products stay far
inside int64: a_j < 2^31 and k < 2^31 gives a_j * k < 2^62.

The point-estimate is the usual one-sided bound:

    est(k) = min_j cell(j, h_j(k))   with   est(k) >= true(k),

overcounting only from collisions (property-tested, never under).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
# (a, b) per hash row — classic LCG multipliers; any fixed odd a < P
# works, these are pinned so the oracle SQL can restate them verbatim.
CMS_HASHES = ((1_103_515_245, 12_345),
              (69_069, 362_437),
              (1_664_525, 1_013_904_223))


def _bucket(key, a: int, b: int, width: int):
    # key is reduced mod P BEFORE the multiply: (a*(k mod P) + b) mod P
    # == (a*k + b) mod P exactly, and a * (k mod P) < 2^62 stays inside
    # int64 for ANY long key — without the reduction a replicated key
    # space past ~8.4e9 overflows under ANSI (caught by the 10x probe)
    return ((F.lit(a) * (key.cast("long") % CMS_P) + F.lit(b))
            % CMS_P) % width


def cms_build(df: DataFrame, key_col: str, width: int = 256) -> DataFrame:
    """(j, bucket, c): the Count-Min table over an integer key column.

    One per-key pre-aggregation (map-side combinable) compacts the
    stream to distinct keys before the depth-way fanout, so the
    depth x rows explode happens on |keys| rows, not |stream| rows;
    the final (j, bucket) groupBy is the sketch merge itself. The
    fanout is ONE explode, not a depth-way unionByName — union
    branches get no common-subexpression elimination, so a union
    would re-scan and re-aggregate the input once per hash row
    (plan-audited: 3 scans -> 1).
    """
    counts = (df.groupBy(F.col(key_col).alias("_k"))
              .agg(F.count(F.lit(1)).alias("_c")))
    cell = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _bucket(F.col("_k"), a, b, width).alias("bucket"))
        for j, (a, b) in enumerate(CMS_HASHES)])).alias("cell")
    return (counts.select(cell, "_c")
            .groupBy(F.col("cell.j").alias("j"),
                     F.col("cell.bucket").alias("bucket"))
            .agg(F.sum("_c").alias("c")))


def cms_estimate(sketch: DataFrame, keys: DataFrame,
                 key_col: str, width: int = 256,
                 est_col: str = "cms_est") -> DataFrame:
    """Point-estimate each key in `keys` against a built sketch:
    est = min over hash rows of the addressed cell. The probe frame
    fans each key to its `depth` (j, bucket) addresses and equi-joins
    the sketch — the sketch is depth*width rows, always broadcastable.
    Keeps every column of `keys` and appends `est_col`.
    """
    cell = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _bucket(F.col(key_col), a, b, width).alias("bucket"))
        for j, (a, b) in enumerate(CMS_HASHES)])).alias("cell")
    probes = keys.select("*", cell).select(
        *keys.columns, F.col("cell.j").alias("j"),
        F.col("cell.bucket").alias("bucket"))
    others = [c for c in keys.columns if c != key_col]
    return (probes.join(F.broadcast(sketch), ["j", "bucket"])
            .groupBy(key_col, *others)
            .agg(F.min("c").alias(est_col)))


KMV_K = 256
# KMV reuses the CMS row-0 LCG: h(k) = (a*k + b) mod P is a BIJECTION on
# [0, P) for keys below P (P prime, a coprime), so distinct keys map to
# distinct pseudo-uniform hashes and the k-th minimum is collision-free.
KMV_A, KMV_B = CMS_HASHES[0]


def kmv_hash(key) -> "F.Column":
    # same pre-reduction as _bucket: identical value mod P, no int64
    # overflow on keys past ~8.4e9 (bijectivity then holds per residue
    # class of P rather than globally — still uniform, still the same
    # value as the SQL oracle's (a*k + b) % P for keys below P)
    return (F.lit(KMV_A) * (key.cast("long") % CMS_P)
            + F.lit(KMV_B)) % CMS_P


def kmv_build(df: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """k-row (h) frame: the k smallest DISTINCT hash values of a key
    column — the KMV / bottom-k distinct sketch (Bar-Yossef et al.).

    Scale shape: the distinct() is a map-side-combinable groupBy on the
    hash, and orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps its local bottom-k and the driver merges k-sized
    heaps, never a global sort shuffle. State is O(k) regardless of key
    cardinality, and two sketches merge by union + re-limit (the
    property the set-operation estimates below rely on).
    """
    return (df.select(kmv_hash(F.col(key_col)).alias("h"))
            .distinct().orderBy("h").limit(k))


def kmv_distinct_estimate(sketch: DataFrame, k: int = KMV_K,
                          est_col: str = "est") -> DataFrame:
    """One-row (k_used, kth_hash, est): the classic KMV estimator
    (k-1) * P / h_(k) when the sketch is full; with fewer than k
    distinct hashes the sketch IS the value set, so the count is exact.
    The estimate is two exact-integer operands and one IEEE divide, so
    a SQL oracle reproduces it bit-for-bit.
    """
    agg = sketch.agg(F.count(F.lit(1)).alias("k_used"),
                     F.max("h").alias("kth_hash"))
    est = F.when(
        F.col("k_used") >= k,
        ((F.col("k_used") - 1) * F.lit(CMS_P)).cast("double")
        / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("k_used").cast("double"))
    return agg.select("k_used", "kth_hash", est.alias(est_col))


def kmv_union(sketch_a: DataFrame, sketch_b: DataFrame,
              k: int = KMV_K) -> DataFrame:
    """Bottom-k of the union of two KMV sketches == the KMV sketch of
    the UNION of the underlying sets (bottom-k(A u B) = bottom-k(
    bottom-k(A) u bottom-k(B)) — the mergeability identity)."""
    return (sketch_a.unionByName(sketch_b)
            .distinct().orderBy("h").limit(k))


def cms_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """One-row (est) frame: the Count-Min JOIN-SIZE estimate between
    two keyed relations from their sketches alone — the classic sketch
    inner product, min over hash rows j of sum_b A[j][b] * B[j][b].

    For every j the bucket-wise inner product expands to
    sum over key pairs (x, y) with h_j(x) = h_j(y) of a_x * b_y, which
    contains every TRUE matching pair (x = y) plus non-negative
    collision terms — so each row overestimates and the min is still
    an overestimate: est >= |A join B| always (the one-sided bound,
    property-tested like the point estimate). This is how an optimizer
    sizes a join from O(d*w) state per relation without touching data.
    """
    a = sketch_a.select("j", "bucket", F.col("c").alias("_ca"))
    b = sketch_b.select("j", "bucket", F.col("c").alias("_cb"))
    per_row = (a.join(b, ["j", "bucket"])
               .groupBy("j")
               .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_ip")))
    return per_row.agg(F.min("_ip").alias("est"))


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership sketch for semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_WORDS = 256  # 256 x 64 = 16384 bits; ~0.1% FP at ~1k keys, k=3


def _bloom_idx(key, a: int, b: int, m: int):
    # same int64-safe LCG family as the CMS rows (see _bucket): the
    # bit positions are pure integer arithmetic, so they are identical
    # on any engine and any partitioning. pmod (not %) so a NEGATIVE
    # key yields an index in [0, m): Spark's % keeps the dividend's
    # sign, and a negative index made build (shiftright = floor) and
    # probe (div = truncate) address DIFFERENT bitmap words — a false
    # negative violating the "no false negatives" contract.
    return F.pmod((F.lit(a) * (key.cast("long") % CMS_P) + F.lit(b))
                  % CMS_P, F.lit(m))


def bloom_build(df: DataFrame, key_col: str,
                width_words: int = BLOOM_WORDS) -> DataFrame:
    """One-row (bitmap: map<long,long>) Bloom filter over an integer
    key column — k = len(CMS_HASHES) = 3 bits per key.

    Like the CMS, the sketch is DataFrame algebra end to end: each key
    explodes to its 3 bit positions, positions group to (word, bit_or
    mask) — a map-side-combinable SUM-like merge, so partial filters
    built per partition OR together for free — and the <= width_words
    surviving words fold into a single map row. The materialized
    sketch is ~8 KB REGARDLESS of key cardinality: that is the whole
    point — at 100 TB the dim side of a selective semi-join may be
    too big to broadcast, but its Bloom filter never is (this is the
    explicit, engine-portable form of Spark's own runtime
    bloomFilter-pushdown rewrite).
    """
    m = width_words * 64
    idxs = F.array(*[_bloom_idx(F.col(key_col), a, b, m)
                     for a, b in CMS_HASHES])
    words = (df.select(F.explode(idxs).alias("idx"))
             .select(F.shiftright("idx", 6).alias("word"),
                     F.expr("shiftleft(1L, cast(idx & 63 AS INT))")
                     .alias("mask"))
             .groupBy("word").agg(F.expr("bit_or(mask)").alias("mask")))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask")))
        .alias("bitmap"))


def bloom_might_contain(fact: DataFrame, key_col: str,
                        bloom: DataFrame,
                        width_words: int = BLOOM_WORDS) -> DataFrame:
    """Rows of `fact` whose key passes the Bloom filter — a superset
    of the true matches (no false negatives BY CONSTRUCTION: every bit
    of a present key was set at build time), with false positives
    bounded by the (m, k, n) envelope. The one-row sketch crosses in
    as a broadcast scalar; the membership test is 3 map lookups and
    bit tests per row, fully inside codegen — no shuffle of the fact
    side at all. Callers that need EXACT semantics follow with the
    real (now candidate-only) semi-join; see sketch_bloom_semijoin."""
    m = width_words * 64
    out = fact.crossJoin(F.broadcast(bloom))
    helpers = []
    conds = []
    for j, (a, b) in enumerate(CMS_HASHES):
        col = f"_bf{j}"
        helpers.append(col)
        out = out.withColumn(col, _bloom_idx(F.col(key_col), a, b, m))
        # word/mask expressions IDENTICAL to bloom_build (shiftright /
        # & 63) so build and probe can never address different words
        conds.append(F.expr(
            f"(coalesce(element_at(bitmap, shiftright({col}, 6)), 0L)"
            f" & shiftleft(1L, cast({col} & 63 AS INT))) != 0"))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return out.filter(cond).drop("bitmap", *helpers)
