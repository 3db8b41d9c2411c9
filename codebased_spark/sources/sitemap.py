"""Sitemap parsing — url discovery with declared freshness.

The crawl-side complement of robots.txt: sitemaps declare each url a
host WANTS crawled plus its declared last-modification time — the
freshness signal a recrawl scheduler joins against stored warc_ts to
decide what to refetch. Reference analog: the directory walker that
enumerates candidate files before filtering (S1/S3).

One regexp pass per sitemap body collects <url> entries; per-entry
regexps pull <loc> and optional <lastmod>. Pure Catalyst; malformed
entries (no <loc>) are dropped, missing <lastmod> yields NULL.
Sitemap-INDEX files (<sitemap><loc> pointers to child sitemaps) are the
same shape — parse_sitemap_index returns the child urls for the caller's
fetch loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_ENTRY_RE = "(?s)<url>(.*?)</url>"
_SITEMAP_ENTRY_RE = "(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = "(?s)<loc>\\s*(.*?)\\s*</loc>"
_LASTMOD_RE = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>"


def _entries(body: Column, entry_re: str) -> Column:
    return F.regexp_extract_all(body, F.lit(entry_re), 1)


def parse_sitemap(
    sitemaps: DataFrame, host: str = "host", body: str = "sitemap_xml"
) -> DataFrame:
    """(host, loc, lastmod) — one row per <url> entry with a <loc>;
    lastmod is the raw declared string (caller casts; sitemaps carry
    both date and datetime forms), NULL when absent."""
    e = sitemaps.select(
        F.col(host), F.explode(_entries(F.col(body), _URL_ENTRY_RE)).alias("_e")
    )
    loc = F.regexp_extract("_e", _LOC_RE, 1)
    lastmod = F.regexp_extract("_e", _LASTMOD_RE, 1)
    return (
        e.select(
            host,
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .where(F.col("loc") != "")
    )


def parse_sitemap_index(
    sitemaps: DataFrame, host: str = "host", body: str = "sitemap_xml"
) -> DataFrame:
    """(host, child_sitemap) for index files."""
    e = sitemaps.select(
        F.col(host),
        F.explode(_entries(F.col(body), _SITEMAP_ENTRY_RE)).alias("_e"),
    )
    loc = F.regexp_extract("_e", _LOC_RE, 1)
    return e.select(host, loc.alias("child_sitemap")).where(F.col("child_sitemap") != "")


def stale_urls(
    sitemap_entries: DataFrame, crawled: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Sitemap entries whose declared lastmod is NEWER than the stored
    capture (or never crawled) — the refetch worklist. `crawled` is
    (url, warc_ts); lastmod is cast as a date/timestamp best-effort."""
    declared = sitemap_entries.select(
        F.col("loc").alias(url_col),
        F.coalesce(
            F.try_to_timestamp(F.col("lastmod")),
            F.try_to_timestamp(F.col("lastmod"), F.lit("yyyy-MM-dd")),
        ).alias("_declared"),
    )
    j = declared.join(crawled, url_col, "left")
    return j.where(
        F.col("warc_ts").isNull()
        | (F.col("_declared").isNotNull() & (F.col("_declared") > F.col("warc_ts")))
    ).select(url_col, "_declared")


_ITEM_RE = "(?s)<(?:item|entry)[\\s>](.*?)</(?:item|entry)>"
_TITLE_RE = "(?s)<title[^>]*>\\s*(.*?)\\s*</title>"
_FEED_LINK_RE = '(?s)<link[^>]*href="([^"]+)"|<link[^>]*>\\s*([^<\\s][^<]*?)\\s*</link>'
_PUBDATE_RE = "(?s)<(?:pubDate|updated|published)[^>]*>\\s*(.*?)\\s*</(?:pubDate|updated|published)>"


def parse_feed(
    feeds: DataFrame,
    host: str = "host",
    body: str = "feed_xml",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(host, title, link, published) — one row per RSS <item> / Atom
    <entry>. RSS carries the link as element text, Atom as an href
    attribute; both forms are handled (the alternation's two capture
    groups are coalesced). Entries without a link are dropped; missing
    dates yield NULL. Same crawl-discovery family as parse_sitemap —
    feeds declare NEW urls with freshness before any sitemap updates."""
    e = feeds.select(
        F.col(host),
        *[F.col(c) for c in keep_cols],
        F.explode(_entries(F.col(body), _ITEM_RE)).alias("_e"),
    )
    link_attr = F.regexp_extract("_e", _FEED_LINK_RE, 1)
    link_text = F.regexp_extract("_e", _FEED_LINK_RE, 2)
    title = F.regexp_extract("_e", _TITLE_RE, 1)
    pub = F.regexp_extract("_e", _PUBDATE_RE, 1)
    return (
        e.select(
            host,
            *keep_cols,
            F.when(title != "", title).alias("title"),
            F.when(link_attr != "", link_attr)
            .when(link_text != "", link_text)
            .alias("link"),
            F.when(pub != "", pub).alias("published"),
        )
        .where(F.col("link").isNotNull())
    )
