"""Bounded path / cycle operators on a hand-checkable graph."""

from __future__ import annotations

from codebased_spark.graph.paths import cycle_members, k_hop_reach

#       1 -> 2 -> 3 -> 1   (3-cycle)
#       3 -> 4 -> 5        (tail)
#       6 -> 6             (self-loop)
EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 6)]


def _edges(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_k_hop_reach_min_depth(spark):
    reach = {
        (r.origin, r.node): r.depth
        for r in k_hop_reach(_edges(spark), k=3).collect()
    }
    assert reach[(1, 2)] == 1
    assert reach[(1, 3)] == 2
    assert reach[(1, 1)] == 3  # back to itself, first arrival depth 3
    assert reach[(1, 4)] == 3
    assert (1, 5) not in reach  # depth 4 > k
    assert reach[(6, 6)] == 1
    # node 5 has no out-edges: never an origin
    assert not any(o == 5 for o, _ in reach)


def test_cycle_members(spark):
    got = {r.node for r in cycle_members(_edges(spark), max_len=3).collect()}
    assert got == {1, 2, 3, 6}
    short = {r.node for r in cycle_members(_edges(spark), max_len=1).collect()}
    assert short == {6}
