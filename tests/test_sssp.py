"""Weighted SSSP: a cheaper-but-longer path must beat the direct edge,
the k-edge bound must be honored, and the frontier must empty (early
exit) on a path graph shorter than k."""

from __future__ import annotations

import pytest

from codebased_spark.graph.sssp import weighted_sssp


def _sssp(spark, edges, seeds, k):
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r.node: r.dist for r in weighted_sssp(s, e, k=k).collect()
    }


def test_cheap_detour_beats_direct_edge(spark):
    # 0 -> 3 direct costs 10; 0 -> 1 -> 2 -> 3 costs 3
    edges = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    got = _sssp(spark, edges, [0], k=6)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_edge_budget_bounds_relaxation(spark):
    # with k=1 only the direct (expensive) edge is reachable to node 3
    edges = [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    got = _sssp(spark, edges, [0], k=1)
    assert got == {0: 0, 1: 1, 3: 10}


def test_multi_seed_takes_nearest(spark):
    edges = [(0, 5, 7), (9, 5, 2)]
    got = _sssp(spark, edges, [0, 9], k=3)
    assert got == {0: 0, 9: 0, 5: 2}


def test_early_exit_on_short_diameter(spark):
    # path graph of length 2 with k=10: loop must stop after frontier
    # empties and still return exact distances
    edges = [(0, 1, 4), (1, 2, 4)]
    got = _sssp(spark, edges, [0], k=10)
    assert got == {0: 0, 1: 4, 2: 8}
