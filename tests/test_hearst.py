"""Hearst-pattern hypernym extraction (extract/hearst.py) — executable spec.

Same discipline as test_urlresolve.py (vs urllib) and test_tables_spec.py
(vs html.parser): the Spark-native extractor is run over a sentence
battery and must emit exactly the pairs a pure-Python `re` reference
implementation of the same patterns produces.
"""

from __future__ import annotations

import re

from codebased_spark.extract.hearst import (
    HEARST_PATTERNS,
    extract_hypernyms,
    hypernym_summary,
)

SENTENCES = [
    # canonical forms
    "formats such as f1, f2 and f3.",
    "standards including s4 or s5.",
    "p6 and other protocols.",
    # real-web connector case
    "Formats SUCH AS f7, f8 And f9.",
    "tools Including t1.",
    "x2 AND OTHER things.",
    # bare single-item list, no conjunction
    "codecs such as c1.",
    # hyphenated tokens survive as one node
    "models such as gpt-x and bert-y.",
    # two matches of the same family in one doc
    "fruits such as apples. vegetables such as beets or kale.",
    # no match at all
    "nothing to see here.",
]


def _py_reference(text: str) -> set[tuple[str, str, str]]:
    out = set()
    for name, (rx, hyper_g, hypo_g, is_list) in HEARST_PATTERNS.items():
        for m in re.finditer(rx, text):
            hyper = m.group(hyper_g).lower()
            raw = m.group(hypo_g)
            hypos = (
                re.split(r"(?i),? (?:and|or) |, ", raw) if is_list else [raw]
            )
            for h in hypos:
                out.add((h.lower(), hyper, name))
    return out


def test_battery_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTENCES)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.hyponym, r.hypernym, r.pattern)
        for r in extract_hypernyms(df).collect()
    }
    expect = {
        (i, hypo, hyper, name)
        for i, s in enumerate(SENTENCES)
        for (hypo, hyper, name) in _py_reference(s)
    }
    assert got == expect
    # spot-check the spec itself is non-vacuous
    assert (0, "f2", "formats", "such_as") in expect
    assert (1, "s5", "standards", "including") in expect
    assert (2, "p6", "protocols", "and_other") in expect
    assert (3, "f8", "formats", "such_as") in expect  # SUCH AS
    assert (7, "gpt-x", "models", "such_as") in expect
    assert not any(t[0] == 9 for t in expect)  # no-match doc emits nothing


def test_summary_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "fruits such as apples and pears."),
            (2, "fruits such as apples. apples and other fruits."),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.hyponym, r.hypernym): (r.n_docs, r.n_mentions)
        for r in hypernym_summary(extract_hypernyms(df)).collect()
    }
    assert rows[("apples", "fruits")] == (2, 3)
    assert rows[("pears", "fruits")] == (1, 1)


def test_plan_is_map_only_before_the_aggregate(spark):
    df = spark.createDataFrame([(1, "a such as b.")], ["doc_id", "text"])
    plan = extract_hypernyms(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # extraction itself never shuffles
    assert "BatchEvalPython" not in plan  # no row-wise Python anywhere


def test_hearst_family_registered_in_dispatch(spark):
    from pyspark.sql import functions as F

    from codebased_spark.extract.registry import dispatch, registered_kinds

    assert "hearst" in registered_kinds()
    df = spark.createDataFrame(
        [
            (1, "hearst", "fruits such as apples."),
            (2, "patterns", "mail me@x.org today."),
            (3, "unknown-kind", "fruits such as pears."),  # skipped (E18)
        ],
        ["doc_id", "kind", "text"],
    )
    rows = {
        (r.doc_id, r.surface, r.entity_type)
        for r in dispatch(df, F.col("kind")).collect()
    }
    assert (1, "apples", "fruits") in rows
    assert (2, "me@x.org", "Email") in rows
    assert not any(d == 3 for d, *_ in rows)


def test_infer_types_majority_tie_and_share(spark):
    from codebased_spark.extract.hearst import infer_types

    pairs = spark.createDataFrame(
        # a: 3 docs say 'tool', 1 says 'product'  -> tool, share 3/4
        [(1, "a", "tool"), (2, "a", "tool"), (3, "a", "tool"), (4, "a", "product"),
         # b: exact 1-1 tie -> lexicographic winner 'gadget'
         (1, "b", "gizmo"), (2, "b", "gadget"),
         # c: duplicate mentions in ONE doc count once (countDistinct)
         (1, "c", "thing"), (1, "c", "thing"), (2, "c", "other")],
        ["doc_id", "hyponym", "hypernym"],
    )
    got = {r.hyponym: (r.inferred_type, r.n_support, r.share)
           for r in infer_types(pairs).collect()}
    assert got["a"] == ("tool", 3, 0.75)
    assert got["b"] == ("gadget", 1, 0.5)
    # 'thing' twice in doc 1 counts ONCE -> 1-1 tie -> 'other' wins lexically
    assert got["c"] == ("other", 1, 0.5)
