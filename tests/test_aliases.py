"""Alias harvesting (extract/aliases.py)."""

from __future__ import annotations


def _extract(spark, texts):
    from codebased_spark.extract.aliases import extract_aliases

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {
        (r.doc_id, r.name, r.alias, r.pattern)
        for r in extract_aliases(docs).collect()
    }


def test_three_pattern_families(spark):
    got = _extract(
        spark,
        ["Acme Widgets, also known as AW, reported growth.",
         "Globex Labs (formerly Globex Research) expanded.",
         "Stark Dynamics, aka SD, filed."],
    )
    assert got == {
        (0, "Acme Widgets", "AW", "also_known_as"),
        (1, "Globex Labs", "Globex Research", "formerly"),
        (2, "Stark Dynamics", "SD", "aka"),
    }


def test_lowercase_alias_rejected(spark):
    got = _extract(
        spark,
        ["Margins, also known as the spread, widened.",
         "It was formerly known as something."],
    )
    assert got == set()


def test_alias_summary_counts_distinct_docs(spark):
    from codebased_spark.extract.aliases import alias_summary, extract_aliases

    docs = spark.createDataFrame(
        [(1, "Acme Corp, aka AC, grew. Acme Corp, aka AC, again."),
         (2, "Acme Corp, aka AC, grew.")],
        ["doc_id", "text"],
    )
    rows = alias_summary(extract_aliases(docs)).collect()
    assert [(r.name, r.alias, r.n_docs) for r in rows] == [("Acme Corp", "AC", 2)]
