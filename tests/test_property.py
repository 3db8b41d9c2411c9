"""Property-based tests (hypothesis) for the extraction invariants.

The reference ships no property tests (SURVEY.md §5); these pin the two
load-bearing invariants of the KG pipeline under arbitrary inputs:

- html built by the corpus template is inverted byte-identically by the
  extraction spec (the north rule's per-url invariant), for ANY text the
  generator could embed — not just the fixture's;
- the pure-pandas extraction core never throws on arbitrary bytes
  (task-crash resistance: a 10^12-row corpus WILL contain garbage).
"""

from __future__ import annotations

import html as html_mod

from hypothesis import given, settings
from hypothesis import strategies as st

from codebased_spark.extract.html_text import extract_text_series

import pandas as pd

# words over a benign alphabet plus html-escapable specials
_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789&<>\"'",
    min_size=1,
    max_size=12,
)
_texts = st.lists(_word, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_template_roundtrip_byte_identical(text):
    """escape -> wrap in the corpus html template -> extract == original
    (modulo the spec's whitespace collapse, which the generator applies)."""
    expected = " ".join(text.split())
    raw = (
        "<html><head><title>t</title><script>var x = 1 < 2;</script>"
        f"<style>p {{}}</style></head><body><p>{html_mod.escape(text)}</p></body></html>"
    ).encode("utf-8")
    got = extract_text_series(pd.Series([raw]))[0]
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_extraction_total_on_arbitrary_bytes(payload):
    """Never raises; always returns a str (errors='ignore' decode +
    regex pipeline are total functions)."""
    out = extract_text_series(pd.Series([payload]))[0]
    assert isinstance(out, str)
