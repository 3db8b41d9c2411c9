"""Sitemap parsing + refetch worklist (sources/sitemap.py)."""

from __future__ import annotations

import datetime

from codebased_spark.sources.sitemap import (
    parse_sitemap,
    parse_sitemap_index,
    stale_urls,
)

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example.com/a </loc>
    <lastmod>2025-03-01</lastmod>
  </url>
  <url><loc>https://h.example.com/b</loc></url>
  <url><lastmod>2025-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://h.example.com/s1.xml</loc></sitemap>
  <sitemap><loc>https://h.example.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_entries_whitespace_and_missing_fields(spark):
    df = spark.createDataFrame([("h.example.com", SITEMAP)], ["host", "sitemap_xml"])
    got = {(r.loc, r.lastmod) for r in parse_sitemap(df).collect()}
    # loc-less entries dropped, whitespace trimmed, missing lastmod -> NULL
    assert got == {
        ("https://h.example.com/a", "2025-03-01"),
        ("https://h.example.com/b", None),
    }


def test_parse_index(spark):
    df = spark.createDataFrame([("h.example.com", INDEX)], ["host", "sitemap_xml"])
    assert sorted(r.child_sitemap for r in parse_sitemap_index(df).collect()) == [
        "https://h.example.com/s1.xml",
        "https://h.example.com/s2.xml",
    ]


def test_stale_urls_refetch_worklist(spark):
    entries = spark.createDataFrame(
        [
            ("h", "https://h/x", "2025-03-01"),         # newer than crawl
            ("h", "https://h/y", "2025-01-01"),         # older than crawl
            ("h", "https://h/new", "2025-02-01"),       # never crawled
            ("h", "https://h/undated", None),           # crawled, no lastmod
        ],
        ["host", "loc", "lastmod"],
    )
    crawled = spark.createDataFrame(
        [
            ("https://h/x", datetime.datetime(2025, 2, 1)),
            ("https://h/y", datetime.datetime(2025, 2, 1)),
            ("https://h/undated", datetime.datetime(2025, 2, 1)),
        ],
        ["url", "warc_ts"],
    )
    got = sorted(r.url for r in stale_urls(entries, crawled).collect())
    assert got == ["https://h/new", "https://h/x"]
