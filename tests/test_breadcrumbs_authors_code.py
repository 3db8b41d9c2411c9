"""Batch: breadcrumb hierarchy, authorship extraction, code profiling —
each against adversarial real-web markup forms."""

from pyspark.sql import functions as F

from codebased_spark.extract.authors import author_pages, page_authors
from codebased_spark.extract.breadcrumbs import breadcrumb_trails, hierarchy_edges
from codebased_spark.textops.codedetect import code_profile


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], ["url", "html"]
    )


def test_breadcrumb_adversarial_forms(spark):
    pages = _pages(spark, [
        ("u1", '<nav class="breadcrumb"><a href="/">Home</a> &gt; '
               '<a href="/d">Docs</a> &gt; <span>Page <b>One</b></span></nav>'),
        ("u2", "<NAV ID='breadcrumbs'><A HREF='/'>Home</A>"
               "<A HREF='/d'>Docs</A><SPAN>Two</SPAN></NAV>"),
        ("u3", "<div>no trail here</div>"),
    ])
    trails = {r["url"]: r for r in breadcrumb_trails(pages).collect()}
    assert set(trails) == {"u1", "u2"}
    # nested <b> tag-stripped, depth counted
    assert trails["u1"]["crumbs"] == ["Home", "Docs", "Page One"]
    assert trails["u2"]["depth"] == 3
    edges = {
        (r["parent"], r["child"]): r["n_pages"]
        for r in hierarchy_edges(breadcrumb_trails(pages)).collect()
    }
    assert edges[("Home", "Docs")] == 2
    assert edges[("Docs", "Page One")] == 1
    assert edges[("Docs", "Two")] == 1


def test_author_meta_both_orders_and_byline(spark):
    pages = _pages(spark, [
        ("u1", '<meta name="author" content="Jane Roe"/>'),
        ("u2", "<META CONTENT='Jo Poe' NAME='author'>"),
        ("u3", "<p>By Ana Alpha</p>"),
        # lowercase 'by' cue accepted, lowercase name rejected
        ("u4", "<p>by Cara Gamma</p><p>by nobody here</p>"),
        ("u5", "<p>nothing</p>"),
    ])
    out = {(r["url"], r["method"]): r["author"]
           for r in page_authors(pages).collect()}
    assert out == {
        ("u1", "meta"): "Jane Roe",
        ("u2", "meta"): "Jo Poe",
        ("u3", "byline"): "Ana Alpha",
        ("u4", "byline"): "Cara Gamma",
    }
    ap = {r["author"]: r for r in author_pages(page_authors(pages)).collect()}
    assert ap["Jane Roe"]["n_pages"] == 1 and ap["Jane Roe"]["n_methods"] == 1


def test_code_profile_nested_not_double_counted(spark):
    pages = spark.createDataFrame(
        [
            ("u1", "<pre><code>abc</code></pre>".encode(), "x" * 10),
            ("u2", "<PRE>12345</PRE><code>678</code>".encode(), "x" * 100),
            ("u3", "<p>prose only</p>".encode(), "x" * 4),
        ],
        ["url", "html", "text"],
    )
    out = {r["url"]: r for r in code_profile(pages).collect()}
    u1 = out["u1"]
    # pre content is "<code>abc</code>" (16 chars); the inner <code> is
    # NOT also counted as an inline block
    assert (u1["n_pre"], u1["n_code_inline"], u1["code_chars"]) == (1, 0, 16)
    assert u1["code_heavy"] == 1  # 16*5 > 10
    u2 = out["u2"]
    assert (u2["n_pre"], u2["n_code_inline"], u2["code_chars"]) == (1, 1, 8)
    assert u2["code_heavy"] == 0  # 8*5 < 100
    u3 = out["u3"]
    assert (u3["code_chars"], u3["code_heavy"]) == (0, 0)
