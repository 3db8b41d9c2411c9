"""Luby MIS rounds (graph/mis.py) + positional phrase search
(textops/phrase.py)."""

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_mis_independence_and_coverage(spark):
    from codebased_spark.graph.mis import luby_mis

    # 8-cycle: MIS rounds must pick an independent set; after 3 rounds on
    # a tiny graph everything is decided
    cyc = [(i, (i + 1) % 8) for i in range(8)]
    out = luby_mis(_edges(spark, cyc), rounds=3).collect()
    status = {r.node: r.status for r in out}
    assert set(status) == set(range(8))
    in_mis = {n for n, s in status.items() if s == "in_mis"}
    # independence: no cycle edge inside the set
    assert all(not ((i in in_mis) and ((i + 1) % 8 in in_mis)) for i in range(8))
    # coverage: every non-member neighbors a member (maximality)
    for n, s in status.items():
        if s != "in_mis":
            assert any(nb in in_mis for nb in ((n - 1) % 8, (n + 1) % 8))
    assert "active" not in status.values()


def test_mis_star_selects_leaves_or_center(spark):
    from codebased_spark.graph.mis import luby_mis

    star = [(0, i) for i in range(1, 6)]
    out = luby_mis(_edges(spark, star), rounds=2).collect()
    in_mis = {r.node for r in out if r.status == "in_mis"}
    if 0 in in_mis:
        assert in_mis == {0}
    else:
        assert in_mis == set(range(1, 6))


def test_mis_deterministic(spark):
    from codebased_spark.graph.mis import luby_mis

    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)]
    a = sorted(map(tuple, luby_mis(_edges(spark, pairs), rounds=3).collect()))
    b = sorted(map(tuple, luby_mis(_edges(spark, pairs), rounds=3).collect()))
    assert a == b


def test_phrase_matches_counts_and_positions(spark):
    from codebased_spark.textops.phrase import phrase_matches

    docs = spark.createDataFrame(
        [
            (1, "big data is big data"),        # 2 matches
            (2, "data big"),                    # reversed -> no match
            (3, "big big data"),                # 1 match
            (4, "big and data"),                # gap -> no match
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_matches for r in phrase_matches(docs, ["big", "data"]).collect()}
    assert got == {1: 2, 3: 1}


def test_phrase_three_terms(spark):
    from codebased_spark.textops.phrase import phrase_matches

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b x c"), (3, "c a b c a b")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.n_matches
        for r in phrase_matches(docs, ["a", "b", "c"]).collect()
    }
    assert got == {1: 2, 3: 1}
