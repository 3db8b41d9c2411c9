"""Pagination stitching — rel=next chains to multi-page article groups.

Real crawl corpora split one article over N pages; training-data
pipelines stitch them BEFORE dedup/quality (a 5-page article is one
document, not five near-duplicate stubs). Discovery is declarative
markup: `<link rel="next" href=...>` (and the equivalent `<a rel=next>`);
chains are the connected components of the next-edge graph, so the
stitch key comes from the engine's existing CC machinery (link/cc.py —
adaptive driver/distributed min-label, the same component labeler the
canonicalizer uses).

House markup rules: case-insensitive, quote-tolerant, attribute-order
free (rel and href in either order); hrefs RFC-resolved against the
page url / <base href>.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import base_href_col, resolve_url_col

_NEXT_TAG_RE = (
    "(?is)<(?:link|a)\\b[^>]*\\brel\\s*=\\s*[\"']next[\"'][^>]*>"
)
_HREF_RE = "(?i)\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"


def next_edges(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, next_url): one row per rel=next declaration (first match
    per page wins — a page has one 'next'), href resolved."""
    h = F.col(html_col).cast("string")
    base_tag = base_href_col(h)
    base = F.when(base_tag == "", F.col("url")).otherwise(
        resolve_url_col(F.col("url"), base_tag)
    )
    tag = F.regexp_extract(h, _NEXT_TAG_RE, 0)
    href = F.regexp_extract(tag, _HREF_RE, 1)
    return (
        pages.select(
            F.col("url"),
            base.alias("_b"),
            href.alias("_h"),
        )
        .where(F.col("_h") != "")
        .select(
            "url", resolve_url_col(F.col("_b"), F.col("_h")).alias("next_url")
        )
        .where(F.col("next_url").rlike("(?i)^https?://"))
    )


def pagination_chains(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, chain_id): every url on a rel=next chain labeled with the
    chain's min url — the stitch key a downstream concat/groupBy uses to
    reassemble multi-page articles. Urls with no next relation are not
    emitted (singleton pages need no stitching)."""
    from codebased_spark.link.cc import connected_components

    e = next_edges(pages, html_col=html_col)
    return connected_components(e, src="url", dst="next_url").select(
        F.col("id").alias("url"), F.col("comp").alias("chain_id")
    )
