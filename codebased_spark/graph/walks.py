"""Deterministic random-walk corpus generation — DeepWalk/node2vec prep.

Graph-embedding training (DeepWalk, node2vec) consumes a corpus of short
walks sampled from the graph; at pipeline scale the walk generator is a
fixed number of distributed steps, each one join from the walk frontier
into the adjacency list. This module generates that corpus with a
DETERMINISTIC step choice — next = neighbors[h(origin, step, cur) % deg]
over the dst-sorted neighbor list — so re-runs are stable (the property
graph-embedding pipelines get from per-partition seeded RNG; determinism
here additionally makes the operator cross-engine value-checkable). The
hash is a linear congruential mix with small prime multipliers, kept in
int64 range for the graph sizes in play.

Reference analog: SURVEY.md Q4's bounded iterative join driver — the walk
loop is the same frontier-join shape, but the frontier stays EXACTLY one
row per live walk (no reach accumulation), so cost is O(walks x length)
rows regardless of graph fan-out: the cheapest of the iterative family.

Scale shape per step: one equi-join frontier.cur == adj.src with the
neighbor-rank predicate applied on the joined row. The adjacency list is
ranked once (one window over (src, dst) — a single shuffle) and reused by
every step. Walks ending at a node with no out-edges terminate (inner
join drops them), matching the random-walk semantics of absorbing nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# small primes keep h = origin*A + step*B + cur*C within int64 for any
# realistic node-id range (ids up to ~9e13 are safe)
_A, _B, _C = 40503, 7919, 104729


def deterministic_walks(
    edges: DataFrame,
    length: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(origin, step, node) rows for one walk of up to `length` steps from
    every node with at least one out-edge; step 0 is the origin itself.

    next(cur) = the h(origin, step, cur) % deg(cur)-th neighbor of cur in
    dst order — fully deterministic, identical in any engine.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    rank_w = Window.partitionBy("src").orderBy("dst")
    deg_w = Window.partitionBy("src")
    adj = e.select(
        "src",
        "dst",
        (F.row_number().over(rank_w) - 1).alias("r"),
        F.count(F.lit(1)).over(deg_w).alias("deg"),
    )
    state = e.select(F.col("src").alias("origin")).distinct().select(
        "origin", F.col("origin").alias("cur")
    )
    out = state.select("origin", F.lit(0).alias("step"), F.col("cur").alias("node"))
    for t in range(1, length + 1):
        idx = (
            F.col("origin") * _A + F.lit(t) * _B + F.col("cur") * _C
        ) % F.col("deg")
        state = (
            state.join(adj, state.cur == adj.src)
            .where(F.col("r") == idx)
            .select("origin", F.col("dst").alias("cur"))
        )
        out = out.unionByName(
            state.select(
                "origin", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    return out


def skipgram_pairs(
    edges: DataFrame,
    length: int = 4,
    window: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(center, context, freq) skip-gram training pairs from the walk
    corpus — the table a DeepWalk/node2vec embedding trainer consumes.

    Every ordered pair of walk positions within `window` steps of each
    other emits one (center, context) co-occurrence; freq aggregates over
    all walks (both directions fall out of the ordered self-join, exactly
    the word2vec windowing applied to walk sentences).

    Scale shape: the self-join keys on origin, and a walk contributes at
    most (length+1) rows, so fan-out per key is <= (length+1)^2 — bounded
    by a constant, never by graph degree. The aggregation shuffles only
    (center, context, partial count) with map-side combine. Determinism
    is inherited from deterministic_walks, so the operator stays
    cross-engine value-checkable.
    """
    walks = deterministic_walks(edges, length, src_col, dst_col)
    a = walks.select(
        F.col("origin"), F.col("step").alias("step_a"), F.col("node").alias("center")
    )
    b = walks.select(
        F.col("origin"), F.col("step").alias("step_b"), F.col("node").alias("context")
    )
    return (
        a.join(b, "origin")
        .where(
            (F.col("step_a") != F.col("step_b"))
            & (F.abs(F.col("step_a") - F.col("step_b")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
