"""Neighborhood link prediction (graph/linkpred.py)."""

from __future__ import annotations


def _predict(spark, edge_list, **kw):
    from codebased_spark.graph.linkpred import link_prediction

    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    return {
        (r.src, r.dst): (r.n_common, r.ra_scaled, r.jaccard)
        for r in link_prediction(edges, **kw).collect()
    }


def test_path_predicts_endpoints_triangle_excludes_existing(spark):
    # path 1-2-3 plus triangle 4-5-6 with pendant 7 on 4
    got = _predict(spark, [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6), (4, 7)])
    # (1,3) share neighbor 2 (deg 2): ra = 10000//2, jaccard = 1/(1+1-1)
    assert got[(1, 3)] == (1, 5000, 1.0)
    # (5,7)/(6,7) share hub 4 (deg 3): ra = 10000//3, jaccard = 1/(2+1-1)
    assert got[(5, 7)] == (1, 3333, 0.5)
    assert got[(6, 7)] == (1, 3333, 0.5)
    # (5,6) shares neighbor 4 but IS an edge -> anti-joined away
    assert (5, 6) not in got
    assert set(got) == {(1, 3), (5, 7), (6, 7)}


def test_direction_and_duplicate_edges_collapse(spark):
    # same undirected structure written with reversed/duplicate edges
    a = _predict(spark, [(1, 2), (2, 3)])
    b = _predict(spark, [(2, 1), (3, 2), (1, 2)])
    assert a == b == {(1, 3): (1, 5000, 1.0)}


def test_hub_cap_excludes_super_connector_wedges(spark):
    # star: center 0 with 8 leaves; cap below its degree -> no candidates
    star = [(0, i) for i in range(1, 9)]
    assert _predict(spark, star, max_degree=7) == {}
    # at cap >= 8 the leaves pair up through the center: C(8,2) pairs
    full = _predict(spark, star, max_degree=8)
    assert len(full) == 28
    # each leaf pair: 1 common neighbor of degree 8, jaccard 1/(1+1-1)
    assert full[(1, 2)] == (1, 10000 // 8, 1.0)


def test_two_common_neighbors_sum_ra(spark):
    # square 1-2-3-4-1: opposite corners share BOTH adjacent corners
    got = _predict(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    # (1,3) via 2 and 4 (each deg 2): ra = 2*5000, jaccard = 2/(2+2-2)
    assert got[(1, 3)] == (2, 10000, 1.0)
    assert got[(2, 4)] == (2, 10000, 1.0)
    assert set(got) == {(1, 3), (2, 4)}
