"""Strongly connected components (graph/scc.py)."""

from __future__ import annotations

import pytest

from codebased_spark.graph.paths import FrontierBudgetExceeded
from codebased_spark.graph.scc import strongly_connected_components


def _scc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.node: r.scc_id
        for r in strongly_connected_components(df, **kw).collect()
    }


def test_cycle_with_tail(spark):
    got = _scc(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_two_sccs_joined_one_way(spark):
    # {1,2} -> {3,4}: the one-way bridge must not merge them
    got = _scc(spark, [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_acyclic_graph_is_all_singletons(spark):
    got = _scc(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 2, 3: 3}


def test_self_loop_is_its_own_scc(spark):
    got = _scc(spark, [(5, 5), (5, 6)])
    assert got == {5: 5, 6: 6}


def test_prune_matches_unpruned(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 11), (11, 10)]
    assert _scc(spark, edges) == _scc(spark, edges, prune_degree=False)


def test_budget_guard_trips(spark):
    ring = [(i, (i + 1) % 40) for i in range(40)]
    df = spark.createDataFrame(ring, ["src", "dst"])
    with pytest.raises(FrontierBudgetExceeded):
        strongly_connected_components(df, max_rows=50).collect()
