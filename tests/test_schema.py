"""Ontology induction (graph/schema.py) + weighted fusion (confidence.py)."""

from pyspark.sql import functions as F

from codebased_spark.graph.confidence import weighted_triple_support
from codebased_spark.graph.schema import predicate_synonyms, schema_graph


def _triples(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_schema_graph_rollup_and_untyped_bucket(spark):
    t = _triples(spark, [
        ("paris", "capital_of", "france"),
        ("berlin", "capital_of", "germany"),
        ("paris", "population", "2m"),     # literal obj -> untyped
        ("ghost", "capital_of", "france"),  # untyped subj
    ])
    types = spark.createDataFrame(
        [("paris", "City"), ("berlin", "City"),
         ("france", "Country"), ("germany", "Country")],
        ["id", "cls"],
    )
    got = {
        (r.subj_type, r.pred, r.obj_type): r.n
        for r in schema_graph(t, types).collect()
    }
    assert got == {
        ("City", "capital_of", "Country"): 2,
        ("City", "population", "untyped"): 1,
        ("untyped", "capital_of", "Country"): 1,
    }


def test_schema_graph_multityped_counts_per_combination(spark):
    t = _triples(spark, [("a", "p", "b")])
    types = spark.createDataFrame(
        [("a", "X"), ("a", "Y"), ("b", "Z")], ["id", "cls"]
    )
    got = {
        (r.subj_type, r.pred, r.obj_type): r.n
        for r in schema_graph(t, types).collect()
    }
    assert got == {("X", "p", "Z"): 1, ("Y", "p", "Z"): 1}


def test_predicate_synonyms_containment_and_support(spark):
    rows = []
    # p and q share 5 pairs; q has no others (contained -> synonym);
    # r shares 2 of its 10 pairs with p (20% -> not a synonym);
    # s shares exactly 1 pair with p (below min_support -> dropped)
    for i in range(5):
        rows += [("s%d" % i, "p", "o%d" % i), ("s%d" % i, "q", "o%d" % i)]
    for i in range(10):
        rows.append(("s%d" % i, "r", "o%d" % (i if i < 2 else i + 100)))
    rows.append(("s0", "s", "o0"))
    rows.append(("s0", "p", "o0"))  # duplicate assertion: distinct-collapsed
    out = {
        (r.pred_a, r.pred_b): (r.n_shared, r.n_a, r.n_b, r.synonym)
        for r in predicate_synonyms(_triples(spark, rows)).collect()
    }
    assert out == {
        ("p", "q"): (5, 5, 5, 1),
        ("p", "r"): (2, 5, 10, 0),
        ("q", "r"): (2, 5, 10, 0),
    }


def test_weighted_support_distinct_hosts_and_default(spark):
    obs = spark.createDataFrame(
        [
            # fact A: host h1 (w=10) asserts it on 3 urls -> counts ONCE
            ("A", "p", "x", "u1", "h1"),
            ("A", "p", "x", "u2", "h1"),
            ("A", "p", "x", "u3", "h1"),
            # fact B: h1 + h2 (w=3) + h3 (absent -> default 1)
            ("B", "p", "y", "u4", "h1"),
            ("B", "p", "y", "u5", "h2"),
            ("B", "p", "y", "u6", "h3"),
        ],
        ["subj", "pred", "obj", "url", "host"],
    )
    hw = spark.createDataFrame([("h1", 10), ("h2", 3)], ["host", "weight"])
    got = {
        r.subj: (r.n_hosts, r.weighted_support)
        for r in weighted_triple_support(obs, hw).collect()
    }
    assert got == {"A": (1, 10), "B": (3, 14)}
