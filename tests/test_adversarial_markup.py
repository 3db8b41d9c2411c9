"""Real-web markup tolerance (VERDICT r3 top task).

Common-Crawl HTML carries uppercase tags, single-quoted attributes, and
attributes in arbitrary order (<a class=... href=...>). Every markup
extractor must find the same content in those forms as in the canonical
lowercase/double-quoted/attr-first form the synthetic fixtures used to
emit. Reference analog: the reference's regex battery runs with
re.IGNORECASE throughout (html.py:96-109).

One nasty page exercises every extractor family at once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

NASTY = """
<HTML><HEAD><TITLE class='t'>Nasty Page</TITLE>
<META CONTENT='en' PROPERTY='og:locale'/>
<meta data-x="1" property='og:site_name' content='nasty'/>
<LINK REL='canonical' HREF='https://hub.example.org/c/9'/>
<LINK HREF='https://n.example.org/de/p' REL='alternate' HREFLANG='de'/>
<SCRIPT async type='application/ld+json' data-x="1">
{"@type":"NewsArticle","name":"n1","url":"https://n.example.org/p","datePublished":"2025-01-02"}
</SCRIPT>
</HEAD><BODY>
<A CLASS='nav' HREF='https://a.example.org/x' DATA-N="1">alpha</A>
<a data-trk="x" href='https://b.example.org/y'>beta</a>
<TABLE class='data'><TR><TH>k</TH></TR><TR><TD align='left'><b>v1</b></TD></TR></TABLE>
<DIV ITEMSCOPE ITEMTYPE='https://schema.org/Article'>
<SPAN ITEMPROP='headline'>hl</SPAN></DIV>
</BODY></HTML>
"""


def _page(spark):
    return spark.createDataFrame(
        [("https://n.example.org/p", NASTY.encode("utf-8"))], ["url", "html"]
    )


def test_href_targets_adversarial(spark):
    from codebased_spark.extract.html_text import href_targets

    got = _page(spark).select(href_targets(F.col("html")).alias("t")).collect()[0].t
    assert got == ["https://a.example.org/x", "https://b.example.org/y"]


def test_anchor_text_adversarial(spark):
    from codebased_spark.extract.anchors import exploded_anchors

    rows = exploded_anchors(_page(spark)).collect()
    assert {(r.target, r.anchor_text) for r in rows} == {
        ("https://a.example.org/x", "alpha"),
        ("https://b.example.org/y", "beta"),
    }


def test_table_cells_adversarial(spark):
    from codebased_spark.extract.tables import html_table_cells

    rows = html_table_cells(_page(spark)).collect()
    cells = {(r.row_idx, r.col_idx): r.cell for r in rows}
    assert cells == {(0, 0): "k", (1, 0): "v1"}


def test_jsonld_adversarial(spark):
    from codebased_spark.extract.jsonld import jsonld_entities

    rows = jsonld_entities(_page(spark)).collect()
    assert len(rows) == 1
    assert rows[0].entity_type == "NewsArticle"
    assert rows[0].name == "n1"
    assert rows[0].date_published == "2025-01-02"


def test_microdata_adversarial(spark):
    from codebased_spark.extract.microdata import microdata_items

    rows = microdata_items(_page(spark)).collect()
    assert {(r.item_type, r.prop, r.value) for r in rows} == {
        ("https://schema.org/Article", "headline", "hl")
    }


def test_canonical_adversarial(spark):
    from codebased_spark.sources.canonical import canonical_url_col

    got = _page(spark).select(
        canonical_url_col(F.col("html")).alias("c")
    ).collect()[0].c
    assert got == "https://hub.example.org/c/9"


def test_hreflang_adversarial(spark):
    from codebased_spark.sources.canonical import hreflang_alternates

    rows = hreflang_alternates(_page(spark)).collect()
    assert {(r.hreflang, r.alt_url) for r in rows} == {
        ("de", "https://n.example.org/de/p")
    }


def test_page_meta_adversarial(spark):
    from codebased_spark.extract.metadata import page_meta_rows

    rows = page_meta_rows(_page(spark)).collect()
    meta = {r.meta_key: r.meta_value for r in rows}
    assert meta["title"] == "Nasty Page"
    assert meta["og:locale"] == "en"
    assert meta["og:site_name"] == "nasty"


def test_data_href_not_matched(spark):
    """The [\\s"'] guard: data-href= must NOT be mistaken for href=."""
    from codebased_spark.extract.html_text import href_targets

    page = spark.createDataFrame(
        [("u", b'<a data-href="https://x.example/no">t</a>')], ["url", "html"]
    )
    got = page.select(href_targets(F.col("html")).alias("t")).collect()[0].t
    assert got == []
