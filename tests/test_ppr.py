"""Personalized PageRank (graph/pagerank.py::personalized_pagerank)."""

from __future__ import annotations

import pytest


def _graph(spark):
    # two loosely-coupled 3-cliques bridged by 2->3; seed in the left one
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        ["src", "dst"],
    )
    return nodes, edges


def test_mass_concentrates_near_seed(spark):
    from codebased_spark.graph.pagerank import personalized_pagerank

    nodes, edges = _graph(spark)
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: r.ppr
        for r in personalized_pagerank(nodes, edges, seeds, n_iter=8).collect()
    }
    # the seed-side ring holds the majority of the mass (restart pins it
    # there; fixed-k leaves the far ring's share sloshing around its cycle,
    # so node-for-node comparisons are not stable — ring sums are)
    assert got[0] + got[1] + got[2] > got[3] + got[4] + got[5]
    # and the seed itself beats every node in its own ring
    assert got[0] > got[1] and got[0] > got[2]
    # total mass conserved (no dangling here: every node has out-degree)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_dangling_mass_returns_to_seeds_and_conserves(spark):
    from codebased_spark.graph.pagerank import personalized_pagerank

    # chain 0->1->2 with 2 a sink; seed at 0
    nodes = spark.createDataFrame([(i,) for i in range(3)], ["node"])
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r.node: r.ppr
        for r in personalized_pagerank(nodes, edges, seeds, n_iter=6).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)
    # all restart + dangling mass lands on the seed -> it dominates
    assert got[0] > got[1] > got[2] > 0


def test_distributed_path_matches_driver_path(spark):
    from codebased_spark.graph.pagerank import personalized_pagerank

    nodes, edges = _graph(spark)
    # make node 5 a sink so the distributed dangling branch runs too
    edges = edges.where("src <> 5")
    seeds = spark.createDataFrame([(0,), (4,)], ["node"])
    drv = {
        r.node: r.ppr
        for r in personalized_pagerank(nodes, edges, seeds, n_iter=5).collect()
    }
    dist = {
        r.node: r.ppr
        for r in personalized_pagerank(
            nodes, edges, seeds, n_iter=5, driver_threshold=0
        ).collect()
    }
    assert drv == dist


def test_empty_seed_overlap_raises(spark):
    from codebased_spark.graph.pagerank import personalized_pagerank

    nodes, edges = _graph(spark)
    seeds = spark.createDataFrame([(99,)], ["node"])
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(nodes, edges, seeds, n_iter=2)
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(nodes, edges, seeds, n_iter=2, driver_threshold=0)
