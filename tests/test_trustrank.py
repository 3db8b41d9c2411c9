"""TrustRank/spam-mass: the distributed loop must agree exactly with the
adaptive driver-side twin, and trust must stay concentrated near the
trusted seeds (spam pages earn high relative spam mass)."""

from __future__ import annotations

import pytest

from codebased_spark.graph.pagerank import trustrank_spam_mass


@pytest.fixture(scope="module")
def spam_farm(spark):
    """Good core 0-4 densely linked + trusted; spam farm 5-9 links only
    among itself and AT the good core (rank leeching), never linked back."""
    edges = []
    for i in range(5):
        edges.append((i, (i + 1) % 5))
        edges.append((i, (i + 2) % 5))
    for i in range(5, 10):
        edges.append((i, 5 + (i + 1 - 5) % 5))
        edges.append((i, i % 5))  # spam -> good, no reciprocation
    nodes = spark.createDataFrame([(i,) for i in range(10)], "node long")
    e = spark.createDataFrame(edges, "src long, dst long")
    trusted = spark.createDataFrame([(0,), (1,)], "node long")
    return nodes, e, trusted


def test_distributed_matches_driver_twin(spam_farm):
    nodes, edges, trusted = spam_farm
    dist = trustrank_spam_mass(
        nodes, edges, trusted, n_iter=5, driver_threshold=0
    )
    drv = trustrank_spam_mass(nodes, edges, trusted, n_iter=5)
    got_d = {r.node: (r.pr, r.tr, r.spam_mass) for r in dist.collect()}
    got_v = {r.node: (r.pr, r.tr, r.spam_mass) for r in drv.collect()}
    assert got_d == got_v


def test_spam_farm_has_high_spam_mass(spam_farm):
    nodes, edges, trusted = spam_farm
    out = {r.node: r for r in trustrank_spam_mass(
        nodes, edges, trusted, n_iter=8
    ).collect()}
    # no trust ever reaches the farm (no good->spam edge): tr == teleport 0
    for i in range(5, 10):
        assert out[i].tr == 0.0
        assert out[i].spam_mass == 1.0
    # trusted seeds hold more trust than rank share -> negative or low mass
    for i in (0, 1):
        assert out[i].spam_mass < 0.5
        assert out[i].tr > 0.0
