"""Sentence segmentation (textops/sentences.py) — executable spec vs a
pure-`re` reference of the same regular-language rule."""

from __future__ import annotations

import re

from codebased_spark.textops.sentences import SENTENCE_RE, split_sentences

CASES = [
    "One. Two! Three? Four",
    "no terminators at all",
    "trailing . ",
    "double!! bang?? ok.",
    "",
    "   ",
    ". leading terminator",
    "a.b.c",  # terminators without spaces still split
]


def _py_reference(text):
    out = []
    for i, m in enumerate(re.findall(SENTENCE_RE, text)):
        s = m.strip()
        if s:
            out.append((i, s, len(s)))
    return out


def test_battery_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.sent_idx, r.sentence, r.n_chars)
        for r in split_sentences(df).collect()
    }
    expect = {
        (i, idx, s, n)
        for i, t in enumerate(CASES)
        for (idx, s, n) in _py_reference(t)
    }
    assert got == expect
    # spot-checks: the spec itself is non-vacuous
    assert (0, 0, "One.", 4) in expect
    assert (0, 3, "Four", 4) in expect
    assert (3, 0, "double!!", 8) in expect
    assert (7, 1, "b.", 2) in expect
    assert not any(d == 4 or d == 5 for d, *_ in expect)  # empty docs


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "a. b.")], ["doc_id", "text"])
    plan = split_sentences(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
