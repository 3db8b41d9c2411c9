"""double_sweep: directed cycle (exact), dangling tail (directed caveat)."""

from codebased_spark.graph.diameter import double_sweep


def _graph(spark, nodes, edges):
    n = spark.createDataFrame([(v,) for v in nodes], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return n, e


def test_directed_cycle_exact(spark):
    # 0 -> 1 -> 2 -> 3 -> 0: every eccentricity is 3, diameter 3
    n, e = _graph(spark, [0, 1, 2, 3], [(0, 1), (1, 2), (2, 3), (3, 0)])
    row = double_sweep(n, e, k=12).collect()[0]
    assert row["pivot"] == 0
    assert row["ecc_pivot"] == 3
    assert row["peripheral"] == 3  # dist 3 from pivot
    assert row["diameter_lb"] == 3
    assert row["n_reach1"] == 4 and row["n_reach2"] == 4


def test_directed_path_tail(spark):
    # 0 -> 1 -> 2: peripheral node 2 has no out-edges, so the second
    # sweep sees only itself — the documented forward-reach caveat.
    n, e = _graph(spark, [0, 1, 2], [(0, 1), (1, 2)])
    row = double_sweep(n, e, k=12).collect()[0]
    assert (row["pivot"], row["peripheral"]) == (0, 2)
    assert row["ecc_pivot"] == 2
    assert row["diameter_lb"] == 0
    assert (row["n_reach1"], row["n_reach2"]) == (3, 1)


def test_tie_breaks_to_min_node(spark):
    # star out of 0: nodes 1,2,3 all at dist 1 -> peripheral must be 1
    n, e = _graph(spark, [0, 1, 2, 3], [(0, 1), (0, 2), (0, 3)])
    row = double_sweep(n, e, k=12).collect()[0]
    assert row["peripheral"] == 1
