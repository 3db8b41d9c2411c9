"""Bounded k-core peeling (graph/kcore.py)."""

from __future__ import annotations

from codebased_spark.graph.kcore import k_core_members


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.degree for r in k_core_members(df, **kw).collect()}


def test_triangle_with_tail_peels_the_tail(spark):
    # triangle 1-2-3 plus a chain 3-4-5: 5 peels in round 1, 4 in round 2
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    got = _run(spark, edges, k=2, rounds=3)
    assert got == {1: 2, 2: 2, 3: 2}


def test_fixed_rounds_budget_is_honored(spark):
    # a long chain needs one round per tendril hop; rounds=1 only peels
    # the endpoints
    chain = [(i, i + 1) for i in range(6)]
    one = _run(spark, chain, k=2, rounds=1)
    assert set(one) == {1, 2, 3, 4, 5}  # endpoints 0 and 6 peeled
    three = _run(spark, chain, k=2, rounds=3)
    assert set(three) == {3}  # keeps shrinking with more budget


def test_direction_and_self_loops_ignored(spark):
    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1)]
    got = _run(spark, edges, k=2, rounds=2)
    assert got == {1: 2, 2: 2, 3: 2}
