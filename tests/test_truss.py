"""k-truss: triangle-free edges must peel, clique supports must be exact,
and higher k must cascade through dependent edges."""

from __future__ import annotations

from codebased_spark.graph.truss import k_truss_edges


def _truss(spark, edges, k, rounds=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.src, r.dst): r.support
        for r in k_truss_edges(e, k=k, rounds=rounds).collect()
    }


def test_triangle_survives_square_peels(spark):
    # triangle 1-2-3 plus 4-cycle 10-11-12-13 (no triangles) plus pendant
    edges = [(1, 2), (2, 3), (1, 3),
             (10, 11), (11, 12), (12, 13), (10, 13),
             (3, 99)]
    got = _truss(spark, edges, k=3)
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}


def test_clique_supports_exact(spark):
    # 4-clique: every edge sits in exactly 2 triangles
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _truss(spark, edges, k=3)
    assert got == {(a, b): 2 for a in range(4) for b in range(a + 1, 4)}
    # 4-truss (need support >= 2): the whole clique survives
    assert _truss(spark, edges, k=4) == got
    # 5-truss (need 3): nothing survives
    assert _truss(spark, edges, k=5) == {}


def test_cascade_peel_at_k4(spark):
    # 4-clique {0,1,2,3} + triangle (3,4,5) hanging off it. At k=4 the
    # hanging triangle's edges have support 1 < 2 and peel in round 1;
    # the clique is self-sufficient and keeps support 2.
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = clique + [(3, 4), (4, 5), (3, 5)]
    got = _truss(spark, edges, k=4)
    assert got == {(a, b): 2 for a in range(4) for b in range(a + 1, 4)}


def test_directed_duplicates_collapse(spark):
    # both directions + a duplicate: one undirected edge each
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (1, 3)]
    got = _truss(spark, edges, k=3)
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}
