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


def test_c4_repeated_sentence_flags(spark):
    from pyspark.sql import functions as F

    from codebased_spark.textops.sentences import (
        sentence_occurrence_flags,
        split_sentences,
    )

    docs = spark.createDataFrame(
        [
            (1, "Unique one. Accept cookies. Bye."),
            (2, "Unique two. Accept cookies. Bye."),
            (3, "Unique three. Accept cookies. Bye."),
            (4, "Only doc four here."),
        ],
        ["doc_id", "text"],
    )
    out = sentence_occurrence_flags(split_sentences(docs), min_count=3)
    rows = {
        (r.doc_id, r.sentence): (r.n_occurrences, r.keep)
        for r in out.collect()
    }
    assert rows[(1, "Accept cookies.")] == (3, False)  # boilerplate dropped
    assert rows[(2, "Bye.")] == (3, False)
    assert rows[(1, "Unique one.")] == (1, True)
    assert rows[(4, "Only doc four here.")] == (1, True)
    # the count shuffle groups on the 64-bit hash, not the string
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
