"""Degree assortativity + directed triad census (graph/motifs.py)."""

from __future__ import annotations

from codebased_spark.graph.motifs import degree_assortativity, triad_census


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_star_graph_is_maximally_disassortative(spark):
    # star: hub degree 4, leaves degree 1 -> r = -1 exactly
    row = degree_assortativity(_edges(spark, [(0, i) for i in range(1, 5)])).collect()[0]
    assert row.m_ordered == 8
    # ordered pairs: 4x (4,1) + 4x (1,4)
    assert row.sum_jk == 2 * 4 * 4  # 2 * sum(ja*jb) = 2 * 16
    assert row.sum_j == 4 * 5
    assert row.assortativity == -1.0


def test_regular_graph_has_null_coefficient(spark):
    # 4-cycle: every degree 2 -> variance 0 -> NULL, stats still exact
    row = degree_assortativity(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()[0]
    assert row.m_ordered == 8 and row.sum_j == 16
    assert row.assortativity is None


def test_assortativity_folds_direction_and_dups(spark):
    # both orientations + a self loop collapse to the same undirected star
    base = [(0, 1), (1, 0), (0, 2), (0, 3), (0, 4), (2, 2)]
    got = degree_assortativity(_edges(spark, base)).collect()[0]
    assert got.m_ordered == 8 and got.assortativity == -1.0


def test_triad_census_mutual_and_cyclic(spark):
    # mutual dyad 1<->2, cycle 3->4->5->3, transitive 6->7,7->8,6->8
    e = [(1, 2), (2, 1), (3, 4), (4, 5), (5, 3), (6, 7), (7, 8), (6, 8)]
    row = triad_census(_edges(spark, e), n_nodes=8).collect()[0]
    assert row.n_edges == 8
    assert row.n_mutual_dyads == 1
    assert row.n_asym_dyads == 6
    assert row.n_null_dyads == 8 * 7 // 2 - 1 - 6
    assert row.n_cycle_triples == 3  # one cyclic triangle, 3 rotations
    assert row.n_transitive_triples == 1


def test_triad_census_hub_cap_drops_wedges_through_hot_centers(spark):
    # hub 0 sits at the center of a transitive triple; capping below its
    # degree removes it from wedge centers (documented census scope)
    e = [(1, 0), (0, 2), (1, 2), (0, 3), (0, 4), (5, 0), (6, 0)]
    full = triad_census(_edges(spark, e), n_nodes=7, max_degree=64).collect()[0]
    capped = triad_census(_edges(spark, e), n_nodes=7, max_degree=3).collect()[0]
    assert full.n_transitive_triples == 1
    assert capped.n_transitive_triples == 0
    assert capped.max_degree == 3
