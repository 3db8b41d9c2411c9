"""Pagination stitching (extract/pagination.py)."""

from __future__ import annotations

from codebased_spark.extract.pagination import next_edges, pagination_chains


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], ["url", "html"]
    )


def test_next_edges_markup_and_resolution(spark):
    pages = _pages(spark, [
        ("https://s.org/a/1",
         '<html><head><link rel="next" href="2"></head></html>'),
        ("https://s.org/a/2",
         "<html><body><A HREF='/a/3' REL='next'>more</A></body></html>"),
        ("https://s.org/b/1", "<html><body>no next here</body></html>"),
        ("https://s.org/c/1",
         '<html><link rel="prev" href="0"><link rel="next" href="2"></html>'),
    ])
    got = {(r.url, r.next_url) for r in next_edges(pages).collect()}
    assert got == {
        ("https://s.org/a/1", "https://s.org/a/2"),  # relative resolved
        ("https://s.org/a/2", "https://s.org/a/3"),  # uppercase, rel-after-href
        ("https://s.org/c/1", "https://s.org/c/2"),  # rel=prev ignored
    }


def test_chains_label_by_min_url(spark):
    pages = _pages(spark, [
        ("https://s.org/x/p1", '<link rel="next" href="p2">'),
        ("https://s.org/x/p2", '<link rel="next" href="p3">'),
        ("https://s.org/x/p3", ""),
        ("https://s.org/y/p1", '<link rel="next" href="p2">'),
    ])
    got = {
        r.url: r.chain_id for r in pagination_chains(pages).collect()
    }
    assert got == {
        "https://s.org/x/p1": "https://s.org/x/p1",
        "https://s.org/x/p2": "https://s.org/x/p1",
        "https://s.org/x/p3": "https://s.org/x/p1",
        "https://s.org/y/p1": "https://s.org/y/p1",
        "https://s.org/y/p2": "https://s.org/y/p1",
    }
