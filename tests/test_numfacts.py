"""Numeric-fact extraction (extract/numfacts.py)."""

from __future__ import annotations


def _extract(spark, texts):
    from codebased_spark.extract.numfacts import extract_numeric_facts

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {
        (r.doc_id, r.subj, r.attr, r.value)
        for r in extract_numeric_facts(docs).collect()
    }


def test_comma_grouping_and_multipliers_exact(spark):
    got = _extract(
        spark,
        ["Acme Widgets employs 12,500 people.",
         "Stark Labs raised 3 billion dollars and Wayne Group raised 40 million dollars.",
         "Tyrell Corp shipped 7 thousand units."],
    )
    assert got == {
        (0, "Acme Widgets", "employees", 12500),
        (1, "Stark Labs", "raised_usd", 3_000_000_000),
        (1, "Wayne Group", "raised_usd", 40_000_000),
        (2, "Tyrell Corp", "shipped_units", 7000),
    }


def test_decoy_numbers_not_extracted(spark):
    got = _extract(
        spark,
        ["Version 3.5 shipped in 2024.",
         "employs 40 people",              # no capitalized subject
         "Acme Widgets employs people."],  # no number
    )
    assert got == set()


def test_values_are_longs_not_floats(spark):
    from codebased_spark.extract.numfacts import extract_numeric_facts

    docs = spark.createDataFrame(
        [(0, "Acme Widgets raised 3 billion dollars.")], ["doc_id", "text"]
    )
    out = extract_numeric_facts(docs)
    assert dict(out.dtypes)["value"] == "bigint"
