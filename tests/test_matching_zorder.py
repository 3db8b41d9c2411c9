"""Greedy maximal matching rounds + Z-order layout keys."""

from pyspark.sql import functions as F


def test_matching_is_a_matching_and_maximal(spark):
    from codebased_spark.graph.matching import greedy_matching

    # path graph 0-1-2-3-4-5 plus chord 0-5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)], ["src", "dst"]
    )
    m = greedy_matching(edges, rounds=3).collect()
    used = [v for r in m for v in (r.a, r.b)]
    assert len(used) == len(set(used))  # no endpoint reused
    # maximality on this small graph: every remaining edge touches a match
    matched = set(used)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]:
        assert a in matched or b in matched


def test_matching_deterministic_and_canonical(spark):
    from codebased_spark.graph.matching import greedy_matching

    e1 = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], ["src", "dst"])
    e2 = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    a = sorted((r.a, r.b) for r in greedy_matching(e1, rounds=2).collect())
    b = sorted((r.a, r.b) for r in greedy_matching(e2, rounds=2).collect())
    assert a == b and all(x < y for x, y in a)


def test_vertex_cover_covers_all_edges(spark):
    from codebased_spark.graph.matching import vertex_cover

    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    cover = {r.node for r in vertex_cover(edges, rounds=4).collect()}
    for s, d in pairs:
        if s != d:
            assert s in cover or d in cover


def test_zorder_interleaving(spark, tmp_path):
    rows = [
        (1, "t", "en", "src3", 5),   # x=3 (011), y=5 (101)
        (2, "t", "en", "src0", 0),   # zkey 0
        (3, "t", "en", "src19", 31),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    from codebased_spark.dataops import kg_zorder_layout

    got = {r.doc_id: r for r in kg_zorder_layout(spark, str(tmp_path)).collect()}

    def morton(x, y):
        return sum(((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
                   for i in range(5))

    assert got[1].zkey == morton(3, 5)
    assert got[2].zkey == 0
    assert got[3].zkey == morton(19, 31) and got[3].zbucket == morton(19, 31) // 64
