"""Approximate graph diameter via the double-sweep heuristic.

Exact diameter is all-pairs shortest paths — O(V·E), out of the question
on a web graph. The double sweep (Magnien/Latapy/Habib '09) gets a tight
LOWER bound with two BFS passes: BFS from an arbitrary pivot, take the
farthest node found (a peripheral vertex), BFS again from there; the
second eccentricity is the bound. On real (small-world, power-law) link
graphs it is usually exact or within 1-2 hops.

Both sweeps reuse the frontier-pruned distributed Bellman-Ford
(graph/sssp.py::weighted_sssp) with unit weights, so each sweep costs
O(E · effective-diameter) join input and exits as soon as the frontier
empties. Pivot and peripheral selection are 1-row DataFrames fed back as
seed sets — no driver collect anywhere; ties break deterministically
(max distance, then min node id) so the result is value-checkable via
two chained recursive-CTE BFS passes.

Directed-graph caveat (documented, deliberate): both sweeps follow
forward edges, so the bound is on the directed diameter of the pivot's
forward-reachable region. n_reach1/n_reach2 expose how much of the graph
each sweep saw — a serving layer reads those together with the bound.

Reference analog: the reference has no diameter op; its bounded path
queries (endpoints.py:433-438) are the per-pair primitive this
generalizes to a whole-graph statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.graph.sssp import weighted_sssp


def _farthest(dists: DataFrame) -> DataFrame:
    """1-row (node) DataFrame: max dist, ties to the smallest node id."""
    return (
        dists.orderBy(F.desc("dist"), F.asc("node")).limit(1).select("node")
    )


def double_sweep(nodes: DataFrame, edges: DataFrame, k: int = 12) -> DataFrame:
    """One summary row:
    (pivot, peripheral, ecc_pivot, diameter_lb, n_reach1, n_reach2).

    nodes: one-column node ids; edges: (src, dst). k bounds each sweep
    (hops beyond k are not explored — pick k above the expected
    effective diameter; the frontier loop exits early anyway).
    """
    unit = edges.select("src", "dst", F.lit(1).alias("w"))
    node_col = nodes.columns[0]
    pivot = nodes.agg(F.min(node_col).alias("node"))
    d1 = weighted_sssp(pivot, unit, k=k)
    peripheral = _farthest(d1)
    d2 = weighted_sssp(peripheral, unit, k=k)
    s1 = d1.agg(
        F.max("dist").alias("ecc_pivot"), F.count(F.lit(1)).alias("n_reach1")
    )
    s2 = d2.agg(
        F.max("dist").alias("diameter_lb"), F.count(F.lit(1)).alias("n_reach2")
    )
    return (
        pivot.select(F.col("node").alias("pivot"))
        .join(F.broadcast(peripheral.select(F.col("node").alias("peripheral"))))
        .join(F.broadcast(s1))
        .join(F.broadcast(s2))
        .select(
            "pivot", "peripheral", "ecc_pivot", "diameter_lb",
            "n_reach1", "n_reach2",
        )
    )
