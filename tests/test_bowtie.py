"""Bow-tie decomposition (graph/bowtie.py)."""

from __future__ import annotations

from codebased_spark.graph.bowtie import bowtie_decomposition


def _bowtie(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.cls for r in bowtie_decomposition(df).collect()}


def test_textbook_bowtie(spark):
    # IN(1) -> CORE{2,3,4} -> OUT(5); tendril 1->6; disconnected 7<->8
    # (a smaller SCC than the core, so the size argmax must pick {2,3,4})
    got = _bowtie(
        spark,
        [(2, 3), (3, 4), (4, 2), (1, 2), (4, 5), (1, 6), (7, 8), (8, 7)],
    )
    assert got == {
        1: "IN", 2: "CORE", 3: "CORE", 4: "CORE",
        5: "OUT", 6: "OTHER", 7: "OTHER", 8: "OTHER",
    }


def test_tube_is_other(spark):
    # 1 -> core{2,3} -> 4, and a tube 1 -> 5 -> 4 bypassing the core:
    # 5 neither reaches the core nor is reached from it -> OTHER
    got = _bowtie(spark, [(2, 3), (3, 2), (1, 2), (3, 4), (1, 5), (5, 4)])
    assert got == {1: "IN", 2: "CORE", 3: "CORE", 4: "OUT", 5: "OTHER"}


def test_size_tie_breaks_to_min_id(spark):
    # two 2-cycles: {1,2} and {3,4}; min scc_id wins, 3<->4 stays OTHER
    got = _bowtie(spark, [(1, 2), (2, 1), (3, 4), (4, 3)])
    assert got == {1: "CORE", 2: "CORE", 3: "OTHER", 4: "OTHER"}


def test_all_acyclic_core_is_min_singleton(spark):
    # no cycle: every SCC is a singleton, argmax falls to node 1, so the
    # partition is still total and deterministic
    got = _bowtie(spark, [(1, 2), (2, 3)])
    assert got == {1: "CORE", 2: "OUT", 3: "OUT"}
