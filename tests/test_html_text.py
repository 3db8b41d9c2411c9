"""Byte-identical text extraction — the per-row invariant from BASELINE.json.

Mirrors the reference's golden extraction tests (test_parser.py:37-73): known
input → exact expected output, plus edge cases (syntax errors → recovery,
test_parser.py:227-249; here: malformed tags, non-UTF8 bytes, empty body).
"""

import hashlib

import pandas as pd

from codebased_spark.extract.html_text import (
    extract_text_py,
    extract_text_series,
    with_links,
    with_text,
)


def test_basic_extraction():
    html = b"<html><head><title>t</title><script>var x = 1 < 2;</script></head><body><p>Hello</p><p>World</p></body></html>"
    assert extract_text_py(html) == "Hello World"


def test_entity_unescape():
    html = b"<html><head></head><body><p>Johnson &amp; Sons &lt;3 &#x27;q&#x27;</p></body></html>"
    assert extract_text_py(html) == "Johnson & Sons <3 'q'"


def test_non_utf8_ignore():
    html = b"<body><p>ok</p></body>\xff\xfe tail"
    assert extract_text_py(html) == "ok tail"


def test_malformed_tag():
    assert extract_text_py(b"<body><p>a<p>b</body>") == "a b"


def test_empty():
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"<html><head><title>x</title></head><body></body></html>") == ""


def test_series_matches_scalar(corpus):
    got = extract_text_series(pd.Series(list(corpus.pages.html)))
    for g, want, raw in zip(got, corpus.pages.text, corpus.pages.html):
        assert g == want
        assert g == extract_text_py(raw)


def test_spark_byte_identical(spark, corpus):
    """The golden-hash invariant: sha256(extracted) == golden_text per url."""
    pages = spark.createDataFrame(corpus.pages)
    out = with_text(pages.select("url", "html"), "html", "etext").toPandas()
    golden = dict(zip(corpus.golden_text.url, corpus.golden_text.text_sha256))
    for _, r in out.iterrows():
        assert hashlib.sha256(r.etext.encode()).hexdigest() == golden[r.url], r.url


def test_links_jvm_side(spark):
    df = spark.createDataFrame(
        [(b'<body><a href="https://a/x"></a><a href="https://b/y"></a></body>',), (b"<body></body>",)],
        ["html"],
    )
    rows = with_links(df).select("links").collect()
    assert rows[0][0] == ["https://a/x", "https://b/y"]
    assert rows[1][0] == []
