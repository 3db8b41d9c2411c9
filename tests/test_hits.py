"""HITS hubs/authorities (graph/hits.py)."""

from __future__ import annotations

import pytest


def test_hits_star_graph_separates_hubs_from_authorities(spark):
    # u0, u1 both point at v (authority); v points nowhere.
    nodes = spark.createDataFrame([(x,) for x in ["u0", "u1", "v"]], ["node"])
    edges = spark.createDataFrame([("u0", "v"), ("u1", "v")], ["src", "dst"])
    from codebased_spark.graph.hits import hits

    got = {r.node: (r.hub, r.auth) for r in hits(nodes, edges, n_iter=3).collect()}
    # v is the sole authority (auth 1.0, hub 0); u0/u1 are equal hubs
    assert got["v"] == (0.0, 1.0)
    assert got["u0"] == got["u1"]
    assert got["u0"][0] == pytest.approx(0.5) and got["u0"][1] == 0.0


def test_hits_l1_scores_sum_to_one(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 2), (4, 5), (2, 4)], ["src", "dst"]
    )
    from codebased_spark.graph.hits import hits

    rows = hits(nodes, edges, n_iter=4).collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.auth for r in rows) == pytest.approx(1.0, abs=1e-4)
    # node 2 has the most distinct in-links -> top authority
    top_auth = max(rows, key=lambda r: r.auth)
    assert top_auth.node == 2


def test_hits_releases_caches(spark):
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    from codebased_spark.graph.hits import hits

    before = spark._jsparkSession.sharedState().cacheManager().isEmpty()
    hits(nodes, edges, n_iter=2).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty() == before


def test_driver_and_distributed_paths_identical(spark):
    from codebased_spark.graph.hits import hits

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["node"])
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 8) for i in range(8)] + [(0, 5), (5, 2)],
        ["src", "dst"],
    )
    a = sorted(tuple(r) for r in hits(nodes, edges, n_iter=4).collect())
    b = sorted(tuple(r) for r in hits(nodes, edges, n_iter=4, driver_threshold=0).collect())
    assert a == b
