"""Iterative graph analytics as DataFrame loops.

No reference analog (superset scope): the reference has no graph
surface at all. The pattern here is the Spark-native one for iterative
algorithms — a driver-side loop over DataFrame transformations with an
eager localCheckpoint per iteration to truncate lineage (without it,
iteration K's plan nests K copies of the join and analysis time grows
quadratically). Connected components in operators/dedup.py follows the
same discipline; PageRank here adds weighted propagation.

Engine-exactness: per-iteration contribution sums use the repo's
scaled-long idiom (round(x * 1e12) summed as BIGINT — order-free and
bit-identical in any engine) at 1e12 rather than _util's 1e6 because
rank×edge-fraction products sit at 1e-2..1e-6; 12 decimal digits keeps
them exact while 25 nodes × 1e12 stays far inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 1e12


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 10,
             damping: float = 0.85, id_col: str = "id",
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str = "weight",
             normalized: bool = False,
             ckpt_every: int = 5,
             teleport_id=None) -> DataFrame:
    """Weighted PageRank, `iters` fixed iterations, damping d:

        rank_0(v)   = 1/N
        rank_k+1(v) = (1-d)/N + d * sum_u rank_k(u) * w(u,v)/outw(u)

    With ``teleport_id`` set, the teleport vector concentrates on that
    single node (personalized PageRank / random walk with restart):
    rank_0 = e_s and the (1-d) mass returns to the source each step.

    Dangling mass (nodes with no out-edges) is dropped, not
    redistributed — the simplest fixed-point; both engines agree.

    Scale shape: edge fractions are computed ONCE (one shuffle on src)
    and checkpointed; each iteration is one rank⋈edges join (shuffle on
    the src key — at real graph scale pre-partition both sides on the
    key and the join is exchange-free every iteration) plus one
    dst-keyed aggregate with map-side partial sums. A localCheckpoint
    every `ckpt_every` iterations keeps plan depth O(ckpt_every)
    instead of O(iters). N is a driver scalar (graph METADATA, like
    kmeans centroid counts — not a data collect).
    """
    if normalized:
        # caller guarantees weights already sum to 1 per src (lets an
        # engine-exactness-minded caller do the normalization with its
        # own deterministic summation)
        e = edges.select(F.col(src_col).alias("_src"),
                         F.col(dst_col).alias("_dst"),
                         F.col(weight_col).alias("_frac"))
    else:
        outw = edges.groupBy(src_col).agg(F.sum(weight_col).alias("_ow"))
        e = (edges.join(outw, src_col)
             .select(F.col(src_col).alias("_src"),
                     F.col(dst_col).alias("_dst"),
                     (F.col(weight_col) / F.col("_ow")).alias("_frac")))
    e = e.localCheckpoint(eager=True)
    n = nodes.count()
    if teleport_id is None:
        seed = F.lit(1.0 / n)
    else:
        seed = F.when(F.col(id_col) == teleport_id,
                      F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.select(F.col(id_col).alias("_id"), seed.alias("rank"))
    for i in range(iters):
        contribs = (ranks.join(e, ranks._id == e._src)
                    .select(F.col("_dst").alias("_id"),
                            F.round(F.col("rank") * F.col("_frac")
                                    * PR_SCALE).cast("long").alias("_c")))
        summed = (contribs.groupBy("_id")
                  .agg((F.sum("_c").cast("double") / PR_SCALE)
                       .alias("_s")))
        ranks = (nodes.select(F.col(id_col).alias("_id"))
                 .join(summed, "_id", "left")
                 .select("_id",
                         (((1.0 - damping) / n if teleport_id is None
                           else F.when(F.col("_id") == teleport_id,
                                       F.lit(1.0 - damping))
                           .otherwise(F.lit(0.0)))
                          + damping * F.coalesce(F.col("_s"), F.lit(0.0)))
                         .alias("rank")))
        if ckpt_every > 0 and (i + 1) % ckpt_every == 0 and i != iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    # checkpoint CADENCE, empirically (sf0.1, 10 iters, median of 3):
    # every-1 = 4.4 s (a materialization-barrier job per iteration),
    # every-5 = 3.1 s, never = 3.3 s but with the widest variance and
    # an O(iters)-deep plan whose re-analysis cost grows with the
    # iteration count — every-5 keeps depth bounded AND drops 4/5 of
    # the barrier jobs. Values are checkpoint-invariant, so the
    # unrolled-CTE oracle is unaffected by the cadence.
    return ranks.select(F.col("_id").alias(id_col), "rank")


def bfs_closure(edges: DataFrame, max_hops: int = 4,
                src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Bounded-depth transitive closure with shortest hop counts —
    the recursive-CTE query family (WITH RECURSIVE reach AS ...) as a
    SEMI-NAIVE DataFrame iteration. Returns (src, dst, hops) where
    `hops` is the minimum number of directed edges from src to dst,
    for every pair reachable within `max_hops` (self-pairs only if the
    graph has cycles back to the source).

    Semi-naive evaluation is the at-scale discipline: iteration k joins
    only the FRONTIER (pairs first discovered at hop k-1) against the
    edge list and anti-joins the known set, so per-iteration work is
    proportional to NEW discoveries, never to the full closure so far —
    the naive form re-derives every shorter path every round. Each
    frontier is localCheckpointed to truncate lineage (same discipline
    as `pagerank`); the loop exits early when a frontier empties, which
    costs one bounded `.head(1)` per round on an already-materialized
    checkpoint. Closure size is O(V^2) in the worst case — this is a
    dimension-graph operator (nation trade routes, org charts, category
    trees), not a fact-table one, and the frontier anti-join keeps even
    that worst case one-pass-per-hop.
    """
    e = (edges.select(F.col(src_col).alias("_es"),
                      F.col(dst_col).alias("_ed"))
         .distinct().localCheckpoint(eager=True))
    known = (e.select(F.col("_es").alias(src_col),
                      F.col("_ed").alias(dst_col),
                      F.lit(1).alias("hops"))
             .localCheckpoint(eager=True))
    frontier = known
    for k in range(2, max_hops + 1):
        nxt = (frontier.join(e, frontier[dst_col] == e._es)
               .select(F.col(src_col), F.col("_ed").alias(dst_col))
               .distinct()
               .join(known.select(src_col, dst_col),
                     [src_col, dst_col], "left_anti")
               .withColumn("hops", F.lit(k))
               .localCheckpoint(eager=True))
        if not nxt.head(1):
            break
        known = known.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return known


def triangle_count(edges: DataFrame, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts over the undirected simple graph
    induced by the input edge list (direction dropped, self-loops
    removed, parallel edges collapsed). Returns (id, n_triangles) for
    every node that closes at least one triangle.

    Enumeration is the classic ordered two-join: canonical edges
    (a < b) joined into wedges a-b-c (a < b < c), closed against the
    edge list on (a, c) — each triangle materializes exactly once, so
    no post-hoc /3 or /6 correction. Ordering by node id (not degree)
    keeps the plan a pair of hash joins on edge keys; at real graph
    scale swap the order key to degree rank (degree ordering bounds
    the wedge fan-out of hub nodes — the classic skew guard) — the
    join structure is unchanged. The canonicalized edge list is
    checkpointed once and reused by all three sides.
    """
    und = (edges.select(F.least(src_col, dst_col).alias("a"),
                        F.greatest(src_col, dst_col).alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint(eager=True))
    bc = und.select(F.col("a").alias("_b"), F.col("b").alias("c"))
    wedges = (und.join(bc, und.b == F.col("_b"))
              .select("a", "b", "c"))
    ac = und.select(F.col("a").alias("_a"), F.col("b").alias("_c"))
    tris = (wedges.join(ac, (wedges.a == F.col("_a"))
                        & (wedges.c == F.col("_c")))
            .select("a", "b", "c"))
    return (tris.select(F.explode(F.array("a", "b", "c")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_triangles")))


def orient_by_degree(edges: DataFrame, src_col: str = "src",
                     dst_col: str = "dst") -> DataFrame:
    """Orient the undirected simple graph by DEGREE rank: each
    canonical edge {u, v} becomes u -> v where (deg(u), u) < (deg(v),
    v) — ties broken by id so the order is total. Returns
    (s, d, d_deg): source, destination, destination's degree (carried
    so wedge enumeration can compare endpoint ranks without re-joining
    the degree table).

    This is the classic hub-skew guard: under degree orientation every
    node's out-degree is O(sqrt(m)) (a node of degree k only keeps
    out-edges to neighbors of degree >= k, and there are at most 2m/k
    of those), so the wedge fan-out of a hub collapses from C(deg, 2)
    to C(sqrt(m), 2). Id ordering has no such bound — a hub with the
    smallest id keeps ALL its edges outgoing.

    The degree census is one explode + count (no self-union of the
    edge frame: unionByName gets no subtree CSE); the two rank lookups
    are joins against the node-sized degree table.
    """
    und = (edges.select(F.least(src_col, dst_col).alias("a"),
                        F.greatest(src_col, dst_col).alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint(eager=True))
    deg = (und.select(F.explode(F.array("a", "b")).alias("v"))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    da = deg.select(F.col("v").alias("_va"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("_vb"), F.col("deg").alias("_db"))
    ranked = (und.join(da, und.a == da._va).join(db, und.b == db._vb))
    a_first = (F.col("_da") < F.col("_db")) | \
        ((F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b")))
    return ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("d"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da"))
        .alias("d_deg"))


def triangle_count_degree(edges: DataFrame, src_col: str = "src",
                          dst_col: str = "dst") -> DataFrame:
    """Per-node triangle counts via DEGREE-ordered enumeration — the
    at-scale form of `triangle_count` (same output, same semantics:
    direction dropped, self-loops removed, parallel edges collapsed).

    Wedges pivot at the LOWEST-rank vertex of each triangle: out-edges
    (s->x, s->y) with rank(x) < rank(y) are closed against the oriented
    edge x->y (which is how the closing edge must point, ranks being
    total). Each triangle therefore materializes exactly once. Because
    out-degree is bounded by O(sqrt(m)) under degree orientation
    (orient_by_degree), a hub of degree k contributes O(m) wedges
    instead of C(k, 2) ~ k^2 — the property test pins this on a star
    graph. The id-ordered `triangle_count` is the oracle twin: triangle
    counts are orientation-invariant.
    """
    o = orient_by_degree(edges, src_col, dst_col).localCheckpoint(
        eager=True)
    o1 = o.select(F.col("s").alias("_s"), F.col("d").alias("_x"),
                  F.col("d_deg").alias("_xd"))
    o2 = o.select(F.col("s").alias("_s2"), F.col("d").alias("_y"),
                  F.col("d_deg").alias("_yd"))
    x_first = (F.col("_xd") < F.col("_yd")) | \
        ((F.col("_xd") == F.col("_yd")) & (F.col("_x") < F.col("_y")))
    wedges = (o1.join(o2, (F.col("_s") == F.col("_s2")) & x_first)
              .select("_s", "_x", "_y"))
    closing = o.select(F.col("s").alias("_cx"), F.col("d").alias("_cy"))
    tris = wedges.join(closing, (wedges._x == F.col("_cx"))
                       & (wedges._y == F.col("_cy")))
    return (tris.select(F.explode(F.array("_s", "_x", "_y")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_triangles")))
