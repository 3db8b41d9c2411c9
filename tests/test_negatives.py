"""Deterministic KG negative sampling (graph/negatives.py)."""

from __future__ import annotations

import pytest

from codebased_spark.graph.negatives import corrupt_tails


def test_corruptions_deterministic_in_range_and_never_true_tail(spark):
    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 10) for i in range(10)], ["src", "dst"]
    )
    a = sorted(tuple(r) for r in corrupt_tails(edges, 10, k=4).collect())
    b = sorted(tuple(r) for r in corrupt_tails(edges, 10, k=4).collect())
    assert a == b  # rerun-identical
    assert len(a) == 40
    for src, dst, k, neg in a:
        assert 0 <= neg < 10
        assert neg != dst


def test_corruptions_vary_across_k(spark):
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    negs = [r.neg_dst for r in corrupt_tails(edges, 100, k=5).collect()]
    assert len(set(negs)) == 5  # 17-step stride over a 99-residue space


def test_rejects_degenerate_entity_space(spark):
    edges = spark.createDataFrame([(0, 0)], ["src", "dst"])
    with pytest.raises(ValueError):
        corrupt_tails(edges, 1)


def test_plan_is_map_only(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    p = corrupt_tails(edges, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p  # no shuffle: scales with scan bandwidth
