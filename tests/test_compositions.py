"""Unit tests for the composed feature/profiling queries (beyond their
declarative oracles): small hand-built graphs/tables with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_node_features_shape_on_known_graph(spark):
    # triangle 1-2-3 (+ chord fanout to 4): known degree/core/reach
    from codebased_spark.graph.kcore import k_core_members
    from codebased_spark.graph.paths import k_hop_reach

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"]
    )
    deg = {
        r.src: r.d
        for r in edges.groupBy("src")
        .agg(F.countDistinct("dst").alias("d"))
        .collect()
    }
    core = {r.node for r in k_core_members(edges, k=2, rounds=3).collect()}
    reach = {
        r.origin: r.n
        for r in k_hop_reach(edges, k=3)
        .groupBy("origin")
        .agg(F.countDistinct("node").alias("n"))
        .collect()
    }
    assert deg == {1: 1, 2: 1, 3: 2}
    assert core == {1, 2, 3}          # 4 peels (tail)
    assert reach[1] == 4              # 1 -> 2,3 -> 1(cycle),4
    assert reach[3] == 4


def test_predicate_functionality_logic(spark):
    from codebased_spark.extract.tables import html_table_cells, table_triples

    html = (
        "<table><tr><th>k</th><th>color</th><th>tag</th></tr>"
        "<tr><td>a</td><td>red</td><td>x</td></tr>"
        "<tr><td>b</td><td>red</td><td>y</td></tr></table>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://s.org/1", html), ("https://s.org/2", html)], ["url", "html"]
    )
    t = table_triples(html_table_cells(pages))
    stats = {
        r.pred: (r.n, r.ns, r.no)
        for r in t.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("subj").alias("ns"),
            F.countDistinct("obj").alias("no"),
        )
        .collect()
    }
    # 2 pages x 2 rows: 4 triples per pred; 2 distinct subjects
    assert stats["color"] == (4, 2, 1)
    assert stats["tag"] == (4, 2, 2)
