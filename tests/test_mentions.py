"""Mention scan + gap-pattern relation extraction (reference analog:
test_parser.py:75-124 exact entity/CALLS assertions on inline snippets)."""

import pandas as pd

from codebased_spark.extract.mentions import build_automaton, scan_doc, scan_mentions_series

SURFACES = ("Acme Corporation", "Acme Corporation Inc", "Grace Hopperfield", "North Haven", "the company")


def test_exact_longest_match():
    auto = build_automaton(SURFACES)
    mentions, _ = scan_doc("We met Acme Corporation Inc yesterday.", auto)
    assert [(m[0], m[3]) for m in mentions] == [("Acme Corporation Inc", True)]


def test_word_boundaries():
    auto = build_automaton(SURFACES)
    mentions, _ = scan_doc("XAcme Corporation Incx has no boundary match.", auto)
    assert all(m[0] != "Acme Corporation Inc" for m in mentions)


def test_relation_gap_pattern():
    auto = build_automaton(SURFACES)
    mentions, rels = scan_doc("Grace Hopperfield works for Acme Corporation.", auto)
    assert ("Grace Hopperfield", "WORKS_FOR", "Acme Corporation") in rels


def test_fuzzy_candidate_emitted():
    auto = build_automaton(SURFACES)
    mentions, _ = scan_doc("Acme Corporati announced results.", auto)
    fuzz = [m for m in mentions if not m[3]]
    assert ("Acme Corporati", 0, len("Acme Corporati"), False) in fuzz


def test_no_overlap_between_exact_and_fuzzy():
    auto = build_automaton(SURFACES)
    mentions, _ = scan_doc("Grace Hopperfield visited North Haven.", auto)
    assert all(m[3] for m in mentions)
    assert {m[0] for m in mentions} == {"Grace Hopperfield", "North Haven"}


def test_hot_surface_form():
    auto = build_automaton(SURFACES)
    mentions, _ = scan_doc("Meanwhile the company declined further comment.", auto)
    assert ("the company", True) in [(m[0], m[3]) for m in mentions]


def test_batch_shape():
    out = scan_mentions_series(pd.Series(["Grace Hopperfield works for Acme Corporation.", ""]), SURFACES)
    assert list(out.columns) == ["mentions", "rels"]
    assert len(out) == 2 and out.rels[0] and not out.mentions[1]
