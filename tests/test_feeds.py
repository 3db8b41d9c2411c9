"""RSS/Atom feed parsing (sources/sitemap.py::parse_feed)."""

from __future__ import annotations

from codebased_spark.sources.sitemap import parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Feed</title>
  <item>
    <title> First post </title>
    <link>https://h.example.com/p1</link>
    <pubDate>Mon, 06 Jan 2025 10:00:00 GMT</pubDate>
  </item>
  <item><link>https://h.example.com/p2</link></item>
  <item><title>linkless, dropped</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <entry>
    <title>Entry A</title>
    <link rel="alternate" href="https://h.example.com/a"/>
    <updated>2025-02-01T00:00:00Z</updated>
  </entry>
</feed>"""


def _feeds(spark, body):
    return spark.createDataFrame([("h.example.com", body)], ["host", "feed_xml"])


def test_rss_items(spark):
    got = {
        (r.title, r.link, r.published)
        for r in parse_feed(_feeds(spark, RSS)).collect()
    }
    # channel-level title must not leak into items; linkless item dropped
    assert got == {
        ("First post", "https://h.example.com/p1", "Mon, 06 Jan 2025 10:00:00 GMT"),
        (None, "https://h.example.com/p2", None),
    }


def test_atom_entries(spark):
    rows = parse_feed(_feeds(spark, ATOM)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.title, r.link, r.published) == (
        "Entry A", "https://h.example.com/a", "2025-02-01T00:00:00Z"
    )
