"""Executable-spec property tests for the markup extractors.

Same pattern as the Aho-Corasick spec test (test_mentions.py): the
Spark-expression parsers are checked against independent reference
implementations built on Python stdlib parsers, over seeded randomized
inputs — a disagreement means one of two UNRELATED implementations is
wrong, which localizes bugs the fixture oracles can't.
"""

from __future__ import annotations

import random
import urllib.robotparser
from html.parser import HTMLParser

from codebased_spark.extract.tables import html_table_cells
from codebased_spark.sources.robots import apply_robots

# --------------------------------------------------------------------------
# tables vs html.parser
# --------------------------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "x1", "y2", "", "a b"]


class _RefTableParser(HTMLParser):
    """Reference table extractor: stdlib event parser, same documented
    semantics as extract/tables.py (cells = th/td text content with tags
    stripped + whitespace collapsed; nested tables not recursed — the
    generator below emits none)."""

    def __init__(self):
        super().__init__()
        self.tables = []
        self._row = None
        self._cell = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.tables.append([])
        elif tag == "tr" and self.tables:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None:
            text = " ".join("".join(self._cell).split())
            self._row.append(text)
            self._cell = None
        elif tag == "tr" and self._row is not None:
            if self._row:
                self.tables[-1].append(self._row)
            self._row = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def _random_table_html(rng):
    parts = ["<html><body><p>prose before</p>"]
    for _ in range(rng.randint(1, 3)):
        parts.append("<table>")
        for _ in range(rng.randint(1, 4)):
            parts.append("<tr>")
            for _ in range(rng.randint(1, 4)):
                tag = rng.choice(["td", "th"])
                inner = rng.choice(WORDS)
                if rng.random() < 0.3:
                    inner = f"<b>{inner}</b>"
                if rng.random() < 0.2:
                    inner = f"\n  {inner}\n  "
                parts.append(f"<{tag}>{inner}</{tag}>")
            parts.append("</tr>")
        parts.append("</table>")
        parts.append(rng.choice(["<p>between</p>", ""]))
    parts.append("</body></html>")
    return "".join(parts)


def test_tables_match_stdlib_reference_on_random_markup(spark):
    rng = random.Random(20260818)
    htmls = [_random_table_html(rng) for _ in range(25)]
    pages = spark.createDataFrame(
        [(f"u{i}", h.encode()) for i, h in enumerate(htmls)], ["url", "html"]
    )
    got: dict = {}
    for r in html_table_cells(pages).collect():
        got.setdefault(r.url, {})[(r.table_idx, r.row_idx, r.col_idx)] = r.cell
    for i, h in enumerate(htmls):
        ref = _RefTableParser()
        ref.feed(h)
        # empty cells are kept on both sides: they are positional
        # placeholders a table consumer needs
        expected = {
            (ti, ri, ci): cell
            for ti, rows in enumerate(ref.tables)
            for ri, row in enumerate(rows)
            for ci, cell in enumerate(row)
        }
        assert got.get(f"u{i}", {}) == expected, f"doc {i}:\n{h}"


# --------------------------------------------------------------------------
# robots vs urllib.robotparser
# --------------------------------------------------------------------------


def _random_robots(rng):
    """Random Disallow-only robots.txt (no Allow lines: with only
    Disallow rules, urllib's first-match-wins equals our any-match)."""
    lines = []
    for ua in rng.sample(["*", "googlebot", "otherbot"], rng.randint(1, 3)):
        lines.append(f"User-agent: {ua}")
        for _ in range(rng.randint(0, 3)):
            seg = rng.choice(["/private", "/tmp", "/de", "/a/b", "/x"])
            suffix = rng.choice(["", "/", "/sub"])
            lines.append(f"Disallow: {seg}{suffix}")
        if rng.random() < 0.3:
            lines.append("Disallow:")
        lines.append("")
    return "\n".join(lines)


def test_robots_match_stdlib_reference_on_random_policies(spark):
    rng = random.Random(42424242)
    paths = ["/", "/private/x", "/tmp", "/tmpfile", "/de/doc/1", "/a/b/c",
             "/x", "/open/page", "/a"]
    cases = []
    for i in range(15):
        body = _random_robots(rng)
        host = f"h{i}.example.com"
        cases.append((host, body))
    urls = spark.createDataFrame(
        [(f"https://{h}{p}",) for h, _ in cases for p in paths], ["url"]
    )
    robots = spark.createDataFrame(cases, ["host", "robots_txt"])
    got = {r.url: r.allowed for r in apply_robots(urls, robots).collect()}
    for host, body in cases:
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        for p in paths:
            url = f"https://{host}{p}"
            assert got[url] == int(rp.can_fetch("*", url)), (
                f"{url}\n--- policy ---\n{body}"
            )


# --------------------------------------------------------------------------
# charset cascade vs an independent Python reference
# --------------------------------------------------------------------------


def _ref_charset(header: str, html: str):
    """Reference resolution: stdlib-regex reimplementation of the WHATWG
    precedence, written independently of the Spark expressions."""
    import re as _re

    if html.startswith("﻿"):
        return "utf-8", "bom"
    m = _re.search(r"charset=([A-Za-z0-9_\-]+)", header, _re.I)
    if m:
        return m.group(1).lower(), "header"
    m = _re.search(r"<meta[^>]*charset\s*=\s*[\"']?([A-Za-z0-9_\-]+)",
                   html, _re.I | _re.S)
    if m:
        return m.group(1).lower(), "meta"
    return "utf-8", "default"


def test_charset_cascade_matches_reference_on_random_pages(spark):
    import random

    from codebased_spark.extract.charset import charset_cascade

    rng = random.Random(4242)
    charsets = ["UTF-8", "ISO-8859-1", "Shift_JIS", "koi8-r", "WINDOWS-1252"]
    quotes = ['"', "'", ""]
    rows = []
    for i in range(120):
        header = rng.choice([
            "text/html",
            f"text/html; charset={rng.choice(charsets)}",
            f"Text/HTML;Charset={rng.choice(charsets)}",
            "application/json",
        ])
        q = rng.choice(quotes)
        meta = rng.choice([
            "",
            f"<meta charset={q}{rng.choice(charsets)}{q}>",
            f"<META http-equiv=x CHARSET={q}{rng.choice(charsets)}{q}/>",
        ])
        bom = "﻿" if rng.random() < 0.2 else ""
        html = f"{bom}<html><head>{meta}</head><body>p{i}</body></html>"
        rows.append((i, html, header))

    df = spark.createDataFrame(rows, ["doc_id", "html_text", "content_type"])
    got = {r.doc_id: (r.charset, r.charset_source)
           for r in charset_cascade(df).collect()}
    for i, html, header in rows:
        assert got[i] == _ref_charset(header, html), (i, header, html)


def test_charset_conflict_null_inputs_yield_zero_not_null(spark):
    """ADVICE r4: (NULL != '') propagates through the AND, so a NULL
    content_type or html_text made charset_conflict NULL and downstream
    sums/filters silently dropped those rows — absent evidence is 0."""
    from codebased_spark.extract.charset import charset_cascade

    rows = [
        (1, None, "<meta charset=utf-8>x"),
        (2, "text/html; charset=utf-8", None),
        (3, None, None),
        (4, "text/html; charset=utf-8", "<meta charset=latin-1>x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "content_type", "html_text"])
    got = {r.doc_id: (r.charset_conflict, r.charset, r.charset_source)
           for r in charset_cascade(df).collect()}
    assert got[1] == (0, "utf-8", "meta")
    assert got[2] == (0, "utf-8", "header")
    assert got[3] == (0, "utf-8", "default")
    assert got[4][0] == 1
    # the audit sum counts every row — no NULL-swallowed rows
    from pyspark.sql import functions as F

    assert charset_cascade(df).agg(
        F.sum("charset_conflict")
    ).collect()[0][0] == 1
