"""Alias table + fuzzy TF-IDF char-ngram linker + connected components.

Reference analog: two-pass resolution (extractor.py:111-235) — registry
build, collision priority, fuzzy fallback — and the CC fixture from
FIXTURES.md §3 (chains 2-6 + one large skewed component).
"""

import math

import pandas as pd
import pytest

from codebased_spark.link.alias import (
    build_alias_table,
    build_idf,
    link_fuzzy_mentions,
    tfidf_cosine_batch,
)
from codebased_spark.link.cc import connected_components


def test_tfidf_cosine_sanity():
    idf = build_idf(["Acme Corporation", "Acme Industries", "Globex Systems"])
    d = math.log(4) + 1
    s = tfidf_cosine_batch(
        pd.Series(["Acme Corporati", "Acme Corporati", "Acme Corporation"]),
        pd.Series(["Acme Corporation", "Globex Systems", "Acme Corporation"]),
        idf,
        d,
    )
    assert s[2] == pytest.approx(1.0)
    assert s[0] > 0.7 > s[1]


def test_alias_collision_priority(spark):
    gaz = spark.createDataFrame(
        pd.DataFrame(
            {
                "surface_form": ["Acme", "Acme", "Globex"],
                "canonical_id": ["ent:b", "ent:a", "ent:g"],
                "entity_type": ["Org", "Org", "Org"],
                "weight": [0.5, 1.0, 1.0],
            }
        )
    )
    rows = {r.alias_key: r.entity_id for r in build_alias_table(gaz).collect()}
    assert rows == {"Acme": "ent:a", "Globex": "ent:g"}  # higher weight wins


def test_fuzzy_linker_end_to_end(spark, corpus):
    gaz = spark.createDataFrame(corpus.gazetteer)
    alias = build_alias_table(gaz)
    fuzzy = spark.createDataFrame(
        pd.DataFrame({"surface": ["Acme Corporati", "Zorblax Qux"]})
    )
    linked = {r.surface: r.entity_id for r in link_fuzzy_mentions(spark, fuzzy, alias).collect()}
    assert linked.get("Acme Corporati") == "ent:org:00001"
    assert "Zorblax Qux" not in linked  # no candidate above threshold


def test_fuzzy_linker_first_token_corruption(spark, corpus):
    """Second blocking key (last token — the reference's suffix fallback,
    extractor.py:386-390): a corrupted FIRST token still finds its entity."""
    gaz = spark.createDataFrame(corpus.gazetteer)
    alias = build_alias_table(gaz)
    fuzzy = spark.createDataFrame(pd.DataFrame({"surface": ["Acm Corporation"]}))
    linked = {r.surface: r.entity_id for r in link_fuzzy_mentions(spark, fuzzy, alias).collect()}
    assert linked.get("Acm Corporation") == "ent:org:00001"


def test_cc_chains_and_skew(spark):
    # chains of length 2-6 plus one large skewed (star) component
    edges = []
    nid = 0
    expected = {}
    for length in (2, 3, 4, 6):
        chain = [f"n{nid + i:04d}" for i in range(length)]
        nid += length
        edges += list(zip(chain, chain[1:]))
        for c in chain:
            expected[c] = chain[0]
    hub = "hub0"
    for i in range(200):  # skewed star
        edges.append((hub, f"spoke{i:04d}"))
        expected[f"spoke{i:04d}"] = hub
    expected[hub] = hub
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == expected


def test_cc_merges_via_shared_node(spark):
    df = spark.createDataFrame(
        pd.DataFrame([("sf:a", "ent:1"), ("sf:a", "ent:2")], columns=["src", "dst"])
    )
    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got["ent:1"] == got["ent:2"] == "ent:1"
