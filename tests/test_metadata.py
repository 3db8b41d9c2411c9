"""Structured markup metadata extraction (E15): <title> + OpenGraph tags
into a typed map, JVM-side only (reference analog: decorator-config
attribute parsing, javascript.py:254-416)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.extract.metadata import page_meta_rows, with_page_meta

HTML = (
    b'<html><head><title>Acme buys Globex</title>'
    b'<meta property="og:title" content="Acme buys Globex (og)"/>'
    b'<meta property="og:site_name" content="wire">'
    b'<meta property="og:locale" content="en">'
    b"</head><body><p>body text</p></body></html>"
)


def test_page_meta_map(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    got = with_page_meta(df).select("page_meta").first()[0]
    assert got == {
        "title": "Acme buys Globex",
        "og:title": "Acme buys Globex (og)",
        "og:site_name": "wire",
        "og:locale": "en",
    }


def test_page_meta_missing_and_duplicate(spark):
    rows = [
        ("no_meta", b"<html><body><p>x</p></body></html>"),
        (
            "dup",
            b'<head><meta property="og:locale" content="de">'
            b'<meta property="og:locale" content="fr"></head>',
        ),
    ]
    df = spark.createDataFrame(rows, ["url", "html"])
    out = {r.url: r.page_meta for r in with_page_meta(df).collect()}
    assert out["no_meta"] == {"title": ""}  # absent title -> empty string
    assert out["dup"]["og:locale"] == "fr"  # last occurrence wins


def test_page_meta_rows_shape(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    rows = page_meta_rows(df).toPandas()
    assert set(rows.columns) == {"url", "meta_key", "meta_value"}
    assert len(rows) == 4
    assert set(rows.meta_key) == {"title", "og:title", "og:site_name", "og:locale"}


def test_page_meta_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("u1", HTML)], ["url", "html"])
    plan = with_page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the extraction plan


def test_nesting_depth(spark):
    from codebased_spark.extract.metadata import nesting_depth_col

    rows = [
        ("flat", b"<p>a</p><p>b</p>", 1),
        ("nested", b"<div><ul><li><b>x</b></li></ul></div>", 4),
        ("voids", b"<div><br><img src='x'><hr/></div>", 1),
        ("unbalanced", b"</div></div><p>x</p>", 1),
        ("none", b"no tags at all", 0),
        ("full", b"<html><head><title>t</title></head><body><p>x</p></body></html>", 3),
    ]
    df = spark.createDataFrame([(n, h) for n, h, _ in rows], ["name", "html"])
    got = {r.name: r.depth for r in df.select("name", nesting_depth_col(F.col("html")).alias("depth")).collect()}
    assert got == {n: d for n, _, d in rows}
    plan = df.select(nesting_depth_col(F.col("html")))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_url_parts_and_normalization(spark):
    from codebased_spark.extract.urlops import with_url_parts

    rows = [
        ("https://News.Example.com:443/Path/X#frag",
         "News.Example.com", "/Path/X", "Example.com", "https://news.example.com/Path/X"),
        ("http://a.b.co:80", "a.b.co", "", "b.co", "http://a.b.co/"),
    ]
    df = spark.createDataFrame(
        [(u,) for u, *_ in rows] + [("https://bad url/x y",)], ["url"]
    )
    got = {r.url: (r.host, r.path, r.domain, r.url_norm) for r in with_url_parts(df).collect()}
    for u, host, path, domain, norm in rows:
        gh, gp, gd, gn = got[u]
        assert gh == host, (u, gh)
        assert (gp or "") == path, (u, gp)
        assert gd == domain, (u, gd)
        assert gn == norm, (u, gn)
    # malformed url: NULL parts, no job failure (try_parse_url)
    bh, bp, _, _ = got["https://bad url/x y"]
    assert bh is None and bp is None


def test_markup_profile_flags(spark):
    from codebased_spark.extract.metadata import markup_profile

    html = (
        "<html><body><TABLE><tr><td>x</td></tr></TABLE>"
        '<script type="application/ld+json">{}</script>'
        "<div itemscope itemtype='https://schema.org/Thing'></div>"
        "</body></html>"
    ).encode()
    bare = b"<html><body><p>nothing structured</p></body></html>"
    pages = spark.createDataFrame(
        [("u1", html), ("u2", bare)], ["url", "html"]
    )
    got = {r.url: (r.has_table, r.has_jsonld, r.has_microdata,
                   r.has_dl, r.has_img, r.n_families)
           for r in markup_profile(pages).collect()}
    assert got["u1"] == (1, 1, 1, 0, 0, 3)
    assert got["u2"] == (0, 0, 0, 0, 0, 0)
