"""Bounded k-truss peeling — the EDGE-support analog of k-core.

Web use: the k-truss keeps only edges embedded in >= k-2 triangles whose
other two edges also survive — a stricter community nucleus than k-core
(it certifies cohesion per LINK, not per node). Link-spam rings that
survive degree-based peeling (every node well-connected) fall out of the
truss when their links don't close triangles; reciprocal-clique
communities stay.

Algorithm: synchronous support-peel rounds — compute each live edge's
triangle support AMONG LIVE EDGES (both wedge edges must be alive),
drop edges with support < k-2, repeat. A fixed `rounds` budget keeps
the trajectory SQL-restatable (the g_kcore/g_lpa fixed-iteration
discipline); convergence is the rounds→|E| limit.

Scale shape: per round, one wedge join (adjacency joined twice on node
keys, cost sum_v deg(v)^2 like triangle counting — the same hub-cap
caveat as g_triangles applies at web scale) and one (edge) reduction.
Edges travel as bare id pairs; per-round localCheckpoint truncates the
loop lineage (the pagerank house pattern).

Reference analog: SURVEY.md Q1 edge-pattern join iterated to a fixpoint;
the reference's relationship tables carry no cohesion feature — this is
the upgrade a web-scale trust pipeline wants next to k-core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_truss_edges(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, dst, support): undirected edges (src < dst) surviving
    `rounds` synchronous peel steps at truss level k; `support` is the
    live-triangle count that justified survival in the LAST round."""
    need = k - 2
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )
    live = und.localCheckpoint(eager=True)
    sup = None
    for _ in range(rounds):
        adj = live.union(live.select(F.col("b").alias("a"), F.col("a").alias("b")))
        w1 = adj.select(F.col("a").alias("u"), F.col("b").alias("w"))
        w2 = adj.select(F.col("a").alias("v"), F.col("b").alias("w2"))
        sup = (
            live.join(w1, live["a"] == w1["u"])
            .join(w2, (live["b"] == w2["v"]) & (w1["w"] == w2["w2"]))
            .groupBy(live["a"], live["b"])
            .agg(F.count(F.lit(1)).alias("support"))
        )
        live = (
            sup.where(F.col("support") >= need)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    if sup is None:  # rounds == 0: every edge trivially in, support unknown
        return und.select(
            F.col("a").alias(src_col), F.col("b").alias(dst_col),
            F.lit(None).cast("long").alias("support"),
        )
    final = sup.where(F.col("support") >= need)
    return final.select(
        F.col("a").alias(src_col), F.col("b").alias(dst_col), "support"
    )
