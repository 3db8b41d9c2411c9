"""Bounded weighted single-source(-set) shortest paths — distributed
Bellman-Ford with FRONTIER PRUNING.

The unweighted reach ops (paths.py k_hop_reach, harmonic first-arrival)
cover hop distance; real link graphs carry edge costs (latency, crawl
politeness delay, inverse edge weight). ``weighted_sssp`` relaxes k
rounds of min-plus, but each round joins ONLY the frontier — the
vertices whose best distance improved last round — against the edge
table, not the whole distance vector. On diameter-d graphs the frontier
empties after d effective rounds and the loop exits early; on expander
web graphs the frontier saturates then collapses, so total join input is
O(E · effective-rounds), never O(E · k) when paths stop improving.

Semantics: after k rounds, best(v) = exact minimum weight over all
directed paths from the seed set using <= k edges (the classic
Bellman-Ford invariant; an improved prefix always re-enters the frontier
and re-propagates). Integer weights in, exact integer distances out —
value-checkable on any engine via a bounded recursive CTE.

Reference analog: the bounded variable-length path queries
(endpoints.py:433-438 bounds its traversal the same way); weights are
the generalization the reference's unweighted edges never needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_sssp(
    seeds: DataFrame,
    edges: DataFrame,
    k: int = 6,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """(node, dist) for every node reachable from `seeds` (one-column
    DataFrame of node ids, distance 0) within <= k edges; dist is the
    exact min path weight among those paths."""
    best = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    # per-round materialization: the relax join reads `best`/`frontier`
    # twice (join + anti-check); localCheckpoint truncates the lineage so
    # round r's plan doesn't re-execute rounds 0..r-1 (the pagerank/
    # pointer-doubling house pattern), and blocks free on GC.
    best = best.localCheckpoint(eager=True)
    frontier = best
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"),
        F.col(weight_col).cast("long").alias("_w"),
    )
    for _ in range(k):
        cand = (
            frontier.join(e, frontier["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("cdist"))
        )
        improved = (
            cand.join(best, "node", "left")
            .where(F.col("dist").isNull() | (F.col("cdist") < F.col("dist")))
            .select("node", F.col("cdist").alias("dist"))
        )
        frontier = improved.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        best = (
            best.unionByName(frontier)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return best
