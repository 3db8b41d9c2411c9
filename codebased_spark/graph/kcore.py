"""Bounded k-core peeling over the (undirected) link graph.

Web use: the k-core is the densely-interlinked nucleus of a host or page
graph — spam farms and genuine hub communities both live in high cores,
while crawl-frontier tendrils peel away; core membership is a standard
trust/importance feature beside PageRank and HITS.

Algorithm: synchronous peel rounds — drop every node whose degree among
STILL-ALIVE neighbors is < k, repeat. A fixed `rounds` budget keeps the
trajectory SQL-restatable (the fixed-iteration discipline of
g_pagerank/g_lpa); full convergence is the rounds→diameter limit and a
caller can simply raise the budget. Per round: one semi-join to restrict
edges to alive endpoints and one (node) count shuffle — narrow ids only.

Reference analog: SURVEY.md A2/A4 degree analytics, iterated — the
reference ranks by degree; k-core is degree ranking made closure-aware.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core_members(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree): nodes surviving `rounds` synchronous peel steps.

    `degree` is the value that justified survival in the LAST round —
    i.e. the node's distinct-neighbor count among round-(rounds-1)
    survivors (the synchronous-peel semantics, identically unrollable in
    SQL). Degree counts DISTINCT undirected neighbors; self-loops are
    ignored."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    alive = sym.select(F.col("a").alias("node")).distinct()
    live_edges = sym
    for _ in range(rounds):
        deg = live_edges.groupBy("a").agg(
            F.countDistinct("b").alias("degree")
        )
        alive = deg.where(F.col("degree") >= k).select(
            F.col("a").alias("node"), "degree"
        )
        keep = alive.select("node")
        live_edges = (
            live_edges.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
        )
    return alive
