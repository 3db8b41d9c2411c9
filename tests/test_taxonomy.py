"""Taxonomy closure + transitive reduction (graph/taxonomy.py)."""

import pytest
from pyspark.sql import functions as F

from codebased_spark.graph.taxonomy import (
    taxonomy_reduction,
    transitive_closure_rcte,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_closure_rcte_chain_with_shortcut(spark):
    # 1->2->3->4 plus shortcut 1->3
    got = {
        (r.src, r.dst)
        for r in transitive_closure_rcte(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
        ).collect()
    }
    assert got == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    }


def test_closure_rcte_is_engine_native_recursion(spark):
    # the plan must carry Spark's recursive-CTE operator (UnionLoop),
    # not a driver-side loop of unions
    df = transitive_closure_rcte(_edges(spark, [(1, 2), (2, 3)]))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Loop" in plan, plan


def test_reduction_flags_only_implied_edges(spark):
    # diamond: 1->2, 1->3, 2->4, 3->4, plus direct 1->4 (implied twice)
    # and 2->3 (not implied: no other 2-out-neighbor reaches 3)
    rows = taxonomy_reduction(
        _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (1, 4), (2, 3)])
    ).collect()
    flags = {(r.src, r.dst): r.redundant for r in rows}
    assert flags[(1, 4)] == 1
    assert flags[(1, 3)] == 1  # implied via 1->2->3
    assert flags[(2, 4)] == 1  # implied via 2->3->4
    assert flags[(2, 3)] == 0
    assert flags[(1, 2)] == 0
    assert flags[(3, 4)] == 0


def test_reduction_keeps_every_input_edge_once(spark):
    out = taxonomy_reduction(
        _edges(spark, [(1, 2), (1, 2), (2, 3), (1, 3)])
    )
    assert out.count() == 3  # dup edge collapsed, none dropped


def test_fixture_block_redundancy_pattern(spark):
    # one full block of the registered fixture shape: chain 0-6 minus
    # the 3->4 edge, shortcuts at 0..5 — redundant exactly at 0,1,4,5
    chain = [(i, i + 1) for i in range(7) if i != 3]
    short = [(i, i + 2) for i in range(6)]
    rows = taxonomy_reduction(_edges(spark, chain + short)).collect()
    red = {(r.src, r.dst) for r in rows if r.redundant == 1}
    assert red == {(0, 2), (1, 3), (4, 6), (5, 7)}


def test_cyclic_input_fails_fast_not_silent(spark):
    # UNION ALL recursion on a cycle must surface an error (Spark's
    # recursion level limit), never loop forever or return quietly
    with pytest.raises(Exception):
        transitive_closure_rcte(_edges(spark, [(1, 2), (2, 1)])).collect()
