"""Bounded path / cycle operators on a hand-checkable graph."""

from __future__ import annotations

import pytest

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


def test_cycle_members_driver_and_distributed_paths_identical(spark):
    """The adaptive driver-side BFS must match the distributed pruned
    frontier loop set-for-set — on a graph mixing self-loops, a 2-cycle,
    a long cycle at exactly max_len, one beyond it, and acyclic tails."""
    edges = (
        [(i, i + 1) for i in range(1, 4)] + [(4, 1)]     # 4-cycle 1-2-3-4
        + [(10, 11), (11, 10)]                            # 2-cycle
        + [(20, 20)]                                      # self-loop
        + [(30, 31), (31, 32), (32, 33), (33, 34), (34, 30)]  # 5-cycle > k
        + [(4, 40), (40, 41)]                             # tail off the cycle
    )
    e = spark.createDataFrame(edges, ["src", "dst"])
    a = {r.node for r in cycle_members(e, max_len=4).collect()}
    b = {
        r.node
        for r in cycle_members(e, max_len=4, driver_threshold=0).collect()
    }
    assert a == b == {1, 2, 3, 4, 10, 11, 20}
    # the 5-cycle exceeds max_len on both paths
    a5 = {r.node for r in cycle_members(e, max_len=5).collect()}
    b5 = {
        r.node
        for r in cycle_members(e, max_len=5, driver_threshold=0).collect()
    }
    assert a5 == b5 == {1, 2, 3, 4, 10, 11, 20, 30, 31, 32, 33, 34}


def test_k_hop_frontier_budget_guard(spark):
    """max_frontier_rows fails fast with a clear error instead of letting
    a reach explosion run away (the reference's query-timeout analog)."""
    import pytest as _pytest

    from codebased_spark.graph.paths import FrontierBudgetExceeded

    # complete-ish digraph: frontier after hop 1 is ~n^2 rows
    n = 8
    e = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(n) if i != j],
        ["src", "dst"],
    )
    with _pytest.raises(FrontierBudgetExceeded):
        k_hop_reach(e, k=3, max_frontier_rows=10).count()
    # a generous budget passes through untouched
    assert k_hop_reach(e, k=2, max_frontier_rows=10_000).count() > 0


def test_pagerank_matches_numpy_power_iteration(spark):
    """Spark PageRank == dense numpy power iteration on a small graph."""
    import numpy as np
    import pandas as pd

    from codebased_spark.graph.pagerank import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 0), (4, 3)]
    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r.node: r.pr for r in pagerank(nodes, e, n_iter=8).collect()}

    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(8):
        new = np.full(n, 0.15 / n)
        for s, d in edges:
            new[d] += 0.85 * pr[s] / deg[s]
        pr = new
    for i in range(n):
        assert got[i] == pytest.approx(pr[i], abs=1e-6)
    # probability mass is conserved (no dangling nodes in this graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_dangling_mass_redistributed(spark):
    """Graph with sink nodes: the redistributed dangling-mass term keeps
    total probability mass at 1.0 and matches numpy exactly."""
    import numpy as np
    import pandas as pd

    from codebased_spark.graph.pagerank import pagerank

    # nodes 3 and 4 have no out-edges (sinks)
    edges = [(0, 1), (0, 3), (1, 2), (1, 4), (2, 0), (2, 3)]
    n = 5
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r.node: r.pr for r in pagerank(nodes, e, n_iter=8).collect()}

    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    dangling = [i for i in range(n) if deg[i] == 0]
    pr = np.full(n, 1.0 / n)
    for _ in range(8):
        dm = sum(pr[i] for i in dangling)
        new = np.full(n, 0.15 / n) + 0.85 * dm / n
        for s, d in edges:
            new[d] += 0.85 * pr[s] / deg[s]
        pr = new
    for i in range(n):
        assert got[i] == pytest.approx(pr[i], abs=1e-6)
    # with the dangling term the chain remains stochastic: mass == 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_clustering_coefficient_known_graph(spark):
    from codebased_spark.graph.triangles import clustering_coefficient

    # triangle 1-2-3 plus pendant 3-4: deg(1)=deg(2)=2 (coeff 1.0),
    # deg(3)=3 (coeff 2*1/(3*2)=0.3333), deg(4)=1 (excluded)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"]
    )
    got = {r.node: r for r in clustering_coefficient(edges).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].clustering == 1.0 and got[1].degree == 2
    assert got[2].clustering == 1.0
    assert got[3].degree == 3 and got[3].n_triangles == 1
    assert got[3].clustering == round(1 / 3, 4)


def test_transitive_closure_unbounded(spark):
    """Path doubling computes the FULL closure (no depth bound): the
    3-cycle closes on itself, the tail extends it, depth 4 paths (1->5)
    are present — exactly the reflexive-free reachability relation."""
    from codebased_spark.graph.paths import transitive_closure

    got = {
        (r.origin, r.node)
        for r in transitive_closure(_edges(spark)).collect()
    }
    expect = {
        # from the 3-cycle every member reaches all of {1,2,3,4,5}
        *[(o, n) for o in (1, 2, 3) for n in (1, 2, 3, 4, 5)],
        (4, 5),
        (6, 6),
    }
    assert got == expect


def test_transitive_closure_long_chain_converges_in_log_rounds(spark):
    """A 40-node chain closes with doubling (max_rounds=6 covers 2^6=64
    hops) — a per-hop frontier loop would need 39 rounds."""
    from codebased_spark.graph.paths import transitive_closure

    e = spark.createDataFrame([(i, i + 1) for i in range(40)], ["src", "dst"])
    reach = transitive_closure(e, max_rounds=6)
    assert reach.count() == 41 * 40 // 2  # all i<j pairs


def test_transitive_closure_budget_guard(spark):
    import pytest as _pytest

    from codebased_spark.graph.paths import (
        FrontierBudgetExceeded,
        transitive_closure,
    )

    e = spark.createDataFrame([(i, (i + 1) % 30) for i in range(30)], ["src", "dst"])
    with _pytest.raises(FrontierBudgetExceeded):
        transitive_closure(e, max_rows=50).count()  # ring closure is 900 rows


def test_pagerank_edge_from_unknown_src_ignored(spark):
    """Links FROM uncrawled pages (src outside the node table) are
    routine web-graph input: the driver path must drop them like the
    distributed rank join does, not KeyError (ADVICE r3)."""
    from codebased_spark.graph.pagerank import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (99, 1)], ["src", "dst"]  # 99 not a node
    )
    a = sorted(tuple(r) for r in pagerank(nodes, edges, n_iter=5).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(nodes, edges, n_iter=5, driver_threshold=0).collect()
    )
    assert a == b
    assert sum(p for _, p in a) > 0


def test_pagerank_driver_and_distributed_paths_identical(spark):
    """The adaptive driver-side pagerank must match the distributed loop
    value-for-value (same formula, float64, rounding) — including on a
    graph WITH dangling sinks."""
    from codebased_spark.graph.pagerank import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(10)], ["node"])
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 10) for i in range(10) if i % 4 != 0],
        ["src", "dst"],
    )
    a = sorted(tuple(r) for r in pagerank(nodes, edges, n_iter=5).collect())
    b = sorted(
        tuple(r)
        for r in pagerank(nodes, edges, n_iter=5, driver_threshold=0).collect()
    )
    assert a == b


def test_harmonic_first_arrival_depths(spark):
    # diamond: 1->2->4, 1->3->4, 1->4 direct: 4 first-reached at depth 1
    from pyspark.sql import functions as F

    from codebased_spark.graph.paths import k_hop_reach

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4), (4, 5)], ["src", "dst"]
    )
    reach = k_hop_reach(edges, k=3)
    from codebased_spark.util import round_stable

    got = {
        r.origin: (r.n, r.h)
        for r in reach.groupBy("origin")
        .agg(
            F.countDistinct("node").alias("n"),
            round_stable(F.sum(F.lit(1.0) / F.col("depth"))).alias("h"),
        )
        .collect()
    }
    # origin 1: nodes 2,3,4 at depth 1 and 5 at depth 2 -> 3 + 0.5
    assert got[1] == (4, 3.5)
    # origin 2: 4 at d1, 5 at d2 -> 1.5; origin 4: just 5 -> 1.0
    assert got[2] == (2, 1.5)
    assert got[4] == (1, 1.0)


def test_recursive_cte_matches_frontier_loop(spark):
    # Spark 4 native WITH RECURSIVE must produce byte-identical
    # first-arrival rows to the k_hop_reach loop on a cyclic graph
    from codebased_spark.graph.paths import k_hop_reach, k_hop_reach_recursive

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)],
        ["src", "dst"],
    )
    loop = sorted(map(tuple, k_hop_reach(edges, k=3).collect()))
    rec = sorted(map(tuple, k_hop_reach_recursive(spark, edges, k=3).collect()))
    assert loop == rec
