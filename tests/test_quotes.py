"""Quotation attribution (extract/quotes.py)."""

from __future__ import annotations


def _extract(spark, texts):
    from codebased_spark.extract.quotes import extract_quotes

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {
        (r.doc_id, r.speaker, r.quote, r.pattern)
        for r in extract_quotes(docs).collect()
    }


def test_both_argument_orders(spark):
    got = _extract(
        spark,
        ['"We are ready." said Ada Lovelock.'
         ' Grace Hopperfield said: "Ship it today"'],
    )
    assert got == {
        (0, "Ada Lovelock", "We are ready.", "quote_first"),
        (0, "Grace Hopperfield", "Ship it today", "speaker_first"),
    }


def test_curly_quotes_comma_and_verb_case(spark):
    got = _extract(
        spark,
        ["“Costs are down”, SAYS Alan Turingson.",
         "Barbara Liskovitz added: “Latency too”"],
    )
    assert got == {
        (0, "Alan Turingson", "Costs are down", "quote_first"),
        (1, "Barbara Liskovitz", "Latency too", "speaker_first"),
    }


def test_unattributed_quotes_are_dropped(spark):
    got = _extract(
        spark,
        ['The phrase "synergy" appeared in the memo.',
         '"Orphan quote with nothing after it."',
         'lowercase person said: "should not match" ...wait'],
    )
    # third text: 'lowercase person' fails the capitalized-name pattern
    assert got == set()


def test_speaker_name_with_digit_suffix(spark):
    got = _extract(spark, ['"Fine." said Ana Vargas3.'])
    assert got == {(0, "Ana Vargas3", "Fine.", "quote_first")}
