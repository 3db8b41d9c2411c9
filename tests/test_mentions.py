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


# ---------------------------------------------------------------------------
# automaton implementations: trie regex (production) vs classic AC (spec)
# ---------------------------------------------------------------------------


def _flat_pattern(surfaces):
    import re

    alts = sorted(surfaces, key=len, reverse=True)
    return re.compile(
        r"(?<![\w])(?:" + "|".join(re.escape(s) for s in alts) + r")(?![\w])"
    )


def test_trie_regex_equals_flat_and_ac():
    from codebased_spark.extract.automaton import AhoCorasick, build_trie_regex

    surfaces = SURFACES + ("Acme", "North", "North Haven Gate", "a_b", "x")
    texts = [
        "We met Acme Corporation Inc at North Haven Gate.",
        "Acme, Acme Corporation; XAcme Acmex a_b x xx a_b_c",
        "North North Haven North Haven Gate North",
        "",
        "the company the companyx the company",
    ]
    trie = build_trie_regex(surfaces)
    flat = _flat_pattern(surfaces)
    ac = AhoCorasick(surfaces)
    for t in texts:
        spans_trie = [(m.start(), m.end()) for m in trie.finditer(t)]
        spans_flat = [(m.start(), m.end()) for m in flat.finditer(t)]
        spans_ac = list(ac.iter_matches(t))
        assert spans_trie == spans_flat == spans_ac, t


def test_automaton_property_random_texts():
    """Property: trie regex == flat alternation == AC on random word soup."""
    import random

    from codebased_spark.extract.automaton import AhoCorasick, build_trie_regex

    rng = random.Random(13)
    vocab = ["Acme", "Corp", "Beta", "Gamma", "x", "y_z", "Acme Corp",
             "Acme Corp Beta", "Corp Beta", "the", "company", "the company"]
    surfaces = tuple(s for s in vocab if rng.random() < 0.8) or ("Acme",)
    trie = build_trie_regex(surfaces)
    flat = _flat_pattern(surfaces)
    ac = AhoCorasick(surfaces)
    for _ in range(200):
        t = " ".join(rng.choice(vocab + ["zzz", ",", "Acme-Corp"]) for _ in range(rng.randint(0, 30)))
        spans_trie = [(m.start(), m.end()) for m in trie.finditer(t)]
        spans_flat = [(m.start(), m.end()) for m in flat.finditer(t)]
        spans_ac = list(ac.iter_matches(t))
        assert spans_trie == spans_flat == spans_ac, t


def test_automaton_scales_to_large_gazetteer():
    """10^4-surface gazetteer: compiles, matches planted surfaces, and the
    per-position cost is size-independent (the AC property; VERDICT r1 #4)."""
    from codebased_spark.extract.automaton import build_trie_regex

    surfaces = tuple(f"Entity{i} Holdings" for i in range(10_000)) + (
        "Acme Corporation",
        "Grace Hopperfield",
    )
    pat = build_trie_regex(surfaces)
    text = (
        "Entity42 Holdings partnered with Acme Corporation while "
        "Entity9999 Holdings hired Grace Hopperfield. Entity10001 Holdings "
        "is not in the dictionary but Entity4 Holdings is."
    )
    got = [m.group(0) for m in pat.finditer(text)]
    assert got == [
        "Entity42 Holdings",
        "Acme Corporation",
        "Entity9999 Holdings",
        "Grace Hopperfield",
        "Entity4 Holdings",
    ]
    mentions, _ = scan_doc(text, pat)
    assert [m[0] for m in mentions if m[3]] == got


def test_surfaces_broadcast_cached_per_gazetteer_version(spark):
    """ADVICE r2: repeated pipeline calls must reuse ONE broadcast per
    gazetteer version instead of leaking a new block per call."""
    from codebased_spark.extract.mentions import _surfaces_broadcast

    sc = spark.sparkContext
    b1 = _surfaces_broadcast(sc, ("Acme", "Globex"))
    b2 = _surfaces_broadcast(sc, ("Acme", "Globex"))
    assert b1 is b2
    b3 = _surfaces_broadcast(sc, ("Other",))
    assert b3 is not b1
    assert b3.value == ("Other",)


def test_join_scan_parity_on_adversarial_text(spark):
    """scan_mentions_join must reproduce the automaton scan exactly on
    texts with irregular whitespace, punctuation-adjacent mentions,
    punctuation-bearing surfaces, nested/overlapping candidates, and
    chain overlaps (A kills B, B would have killed C)."""
    import pandas as pd

    from codebased_spark.extract.mentions import build_automaton, scan_doc
    from codebased_spark.extract.mentions_join import scan_mentions_join

    surfaces = [
        "Acme", "Acme Corporation", "A. Hopperfield", "Hyper-Engine",
        "aa bb", "bb cc", "Globex",
        # 10 tokens — beyond MAX_SURFACE_TOKENS_CAP (8): must match via
        # the prefix-gram path, not be silently unmatchable
        "International Business and Trade Council of the Greater Metro Region",
    ]
    texts = [
        "the International Business and Trade Council of the Greater Metro Region met",
        # prefix present but full surface absent -> prefix candidate must
        # be discarded by the exact verification
        "International Business and Trade Council of the Greater Lakes",
        "Acme Corporation, and Globex.",           # punctuation-adjacent
        "Acme  Corporation has  double spaces",    # irregular whitespace
        "meet A. Hopperfield of Acme today",       # dotted surface
        "the Hyper-Engine, by Acme Corporation",   # hyphen surface
        "aa bb cc",                                # chain overlap
        "Acme Corporation Acme",                   # longest-then-short
        "(Globex) [Acme] {A. Hopperfield}",        # bracketed
        "nothing to see here",
        "",
        "Acme\nCorporation spans lines near Globex",  # newline separator
    ]
    pages = spark.createDataFrame(
        pd.DataFrame({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
    )
    alias = spark.createDataFrame(pd.DataFrame({"alias_key": surfaces}))
    got = scan_mentions_join(pages, alias).collect()
    got_m = {
        (r.url, r.surface, r.mstart, r.mend, r.exact)
        for r in got if r.kind == "m" and r.exact
    }
    automaton = build_automaton(tuple(surfaces))
    want_m = set()
    for i, t in enumerate(texts):
        mentions, _ = scan_doc(t, automaton)
        for s, a, b, ex in mentions:
            if ex:
                want_m.add((f"u{i}", s, a, b, ex))
    assert got_m == want_m
    # full-row parity incl. fuzzy candidates and relations
    got_all = {tuple(r) for r in got}
    want_all = set()
    for i, t in enumerate(texts):
        mentions, rels = scan_doc(t, automaton)
        for s, a, b, ex in mentions:
            want_all.add((f"u{i}", "m", s, a, b, ex, None, None, None))
        for s1, p, s2 in rels:
            want_all.add((f"u{i}", "r", None, None, None, None, s1, p, s2))
    assert got_all == want_all


def test_candidate_heuristic_family():
    """E10 in full: the fuzzy-candidate detector FAMILY (capseq/allcaps/
    quoted + the all-caps skip predicate), with earlier detectors winning
    overlaps and exact mentions suppressing all of them."""
    from codebased_spark.extract.mentions import (
        ALLCAPS_SKIP,
        build_automaton,
        scan_doc,
    )

    auto = build_automaton(("Acme Corporation",))
    text = 'Acme Corporation told NATO THE "Flux Capacitor" story of Jane Doe'
    all_h = ("capseq", "allcaps", "quoted")
    mentions, _ = scan_doc(text, auto, heuristics=all_h)
    by_surface = {m[0]: m for m in mentions}
    assert by_surface["Acme Corporation"][3] is True      # exact
    assert by_surface["NATO"][3] is False                  # allcaps candidate
    assert "THE" not in by_surface and "THE" in ALLCAPS_SKIP  # skip predicate
    assert by_surface["Flux Capacitor"][3] is False        # inside quotes
    assert by_surface["Jane Doe"][3] is False              # capseq
    # span of the quoted candidate excludes the quotes themselves
    s, a, b, _ = by_surface["Flux Capacitor"]
    assert text[a:b] == "Flux Capacitor"

    # default family is unchanged: only capseq fires (which also sees the
    # capitalized pair inside the quotes — but never the all-caps run)
    default_mentions, _ = scan_doc(text, auto)
    surfaces = {m[0] for m in default_mentions}
    assert "NATO" not in surfaces
    assert "Jane Doe" in surfaces and "Flux Capacitor" in surfaces

    # order wins overlaps: quoted-first suppresses the capseq inside it
    t2 = 'he read "Jane Doe Goes Home" twice'
    q_first, _ = scan_doc(t2, auto, heuristics=("quoted", "capseq"))
    got = {m[0] for m in q_first}
    assert "Jane Doe Goes Home" in got and "Jane Doe" not in got
