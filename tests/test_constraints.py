"""Constraint audit (graph/constraints.py) + entity cards (graph/cards.py)."""

import pytest
from pyspark.sql import functions as F

from codebased_spark.graph.cards import entity_cards
from codebased_spark.graph.constraints import (
    check_constraints,
    dangling_objects,
    disjoint_type_violations,
    functional_violations,
)


def _triples(spark, rows):
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_functional_fires_on_conflict_not_on_duplicate(spark):
    t = _triples(spark, [
        ("a", "lang", "en"),
        ("a", "lang", "en"),   # idempotent re-assert: NOT a violation
        ("b", "lang", "en"),
        ("b", "lang", "fr"),   # conflict: violation with n=2
        ("c", "tag", "x"),
        ("c", "tag", "y"),     # pred not declared functional: ignored
    ])
    rows = functional_violations(t, ["lang"]).collect()
    assert [(r.subj, r.pred, r.violation, r.n) for r in rows] == [
        ("b", "lang", "functional", 2)
    ]


def test_dangling_counts_assertions_per_missing_node(spark):
    t = _triples(spark, [
        ("a", "cites", "b"),
        ("a", "cites", "ghost"),
        ("b", "cites", "ghost"),
        ("a", "likes", "ghost"),  # pred not entity-valued: ignored
    ])
    nodes = spark.createDataFrame([("a",), ("b",)], ["id"])
    rows = dangling_objects(t, nodes, ["cites"]).collect()
    assert [(r.subj, r.pred, r.violation, r.n) for r in rows] == [
        ("ghost", "cites", "dangling", 2)
    ]


def test_disjoint_pair_is_directional_in_decl_but_caught_once(spark):
    t = _triples(spark, [
        ("a", "is_a", "Article"),
        ("a", "is_a", "Spam"),
        ("b", "is_a", "Article"),
    ])
    rows = disjoint_type_violations(t, [("Article", "Spam")]).collect()
    assert [(r.subj, r.pred, r.violation, r.n) for r in rows] == [
        ("a", "is_a:Article|Spam", "disjoint", 1)
    ]


def test_check_constraints_unions_typed_rows(spark):
    t = _triples(spark, [
        ("a", "lang", "en"),
        ("a", "lang", "fr"),
        ("a", "cites", "ghost"),
        ("a", "is_a", "Article"),
        ("a", "is_a", "Spam"),
    ])
    nodes = spark.createDataFrame([("a",)], ["id"])
    got = {
        r.violation
        for r in check_constraints(
            t,
            functional_preds=["lang"],
            entity_preds=["cites"],
            nodes=nodes,
            disjoint_pairs=[("Article", "Spam")],
        ).collect()
    }
    assert got == {"functional", "dangling", "disjoint"}
    with pytest.raises(ValueError):
        check_constraints(t)


def _mentions(spark):
    return spark.createDataFrame(
        [
            # doc 1: spark x2 (as 'spark' and 'Spark' aliases), join x1
            (1, "spark", "ent:spark", "Tech"),
            (1, "Spark", "ent:spark", "Tech"),
            (1, "join", "ent:join", "Operator"),
            # doc 2: spark x1, filter x1
            (2, "spark", "ent:spark", "Tech"),
            (2, "filter", "ent:filter", "Operator"),
            # doc 3: join only (join's argmax doc by count is 1 then 3)
            (3, "join", "ent:join", "Operator"),
        ],
        ["doc_id", "surface_form", "canonical_id", "entity_type"],
    )


def test_entity_cards_aggregates(spark):
    cards = {r.canonical_id: r for r in entity_cards(_mentions(spark)).collect()}
    s = cards["ent:spark"]
    assert (s.entity_type, s.n_mentions, s.n_docs) == ("Tech", 3, 2)
    assert s.aliases == "Spark,spark"
    assert s.top_doc == 1  # 2 mentions in doc 1 beat 1 in doc 2
    assert s.n_neighbors == 2  # join (doc 1), filter (doc 2)
    j = cards["ent:join"]
    assert j.top_doc == 1  # tie on count=1 -> smallest doc_id
    assert j.n_neighbors == 1  # only spark co-occurs


def test_entity_cards_per_doc_cap_bounds_neighbor_join(spark):
    # cap=1 keeps only the lexicographically-first entity per doc, so
    # no doc contributes a pair and every neighbor count drops to 0
    rows = entity_cards(_mentions(spark), max_entities_per_doc=1).collect()
    assert all(r.n_neighbors == 0 for r in rows)
