"""rel-nofollow family + robots meta endorsement edges (extract/anchors.py
::nofollow_edges, extract/metadata.py::robots_meta_col)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.extract.anchors import nofollow_edges


def _pages(spark, rows):
    df = spark.createDataFrame(rows, ["url", "html"])
    return df.withColumn("html", F.encode("html", "UTF-8"))


def test_rel_family_and_attribute_order(spark):
    html = (
        '<a href="https://x/1">a</a>'
        "<A REL='NoFollow' HREF='https://x/2'>b</A>"
        '<a href="https://x/3" rel="ugc external">c</a>'
        '<a data-n="1" rel="sponsored" href="https://x/4">d</a>'
        '<a href="https://x/5" rel="external">e</a>'
    )
    got = {
        r.target: r
        for r in nofollow_edges(_pages(spark, [("u", html)])).collect()
    }
    assert not got["https://x/1"].anchor_nofollow
    assert got["https://x/2"].anchor_nofollow  # uppercase, rel before href
    assert got["https://x/3"].anchor_nofollow  # ugc token among others
    assert got["https://x/4"].anchor_nofollow  # sponsored
    assert not got["https://x/5"].anchor_nofollow  # external alone is fine
    assert got["https://x/1"].followed and not got["https://x/2"].followed


def test_page_meta_robots_overrides_all_anchors(spark):
    html = (
        "<head><META CONTENT='noindex, nofollow' NAME='ROBOTS'></head>"
        '<a href="https://x/1">a</a>'
    )
    (row,) = nofollow_edges(_pages(spark, [("u", html)])).collect()
    assert row.page_noindex and row.page_nofollow
    assert not row.anchor_nofollow and not row.followed


def test_unrelated_meta_does_not_fire(spark):
    html = (
        '<meta name="viewport" content="nofollow-looking"></meta>'
        '<a href="https://x/1">a</a>'
    )
    (row,) = nofollow_edges(_pages(spark, [("u", html)])).collect()
    assert not row.page_nofollow and row.followed
