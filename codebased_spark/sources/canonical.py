"""Canonical-URL collapse: <link rel="canonical"> declares page identity.

Web pages frequently declare that they are a VARIANT of another url
(mobile/AMP mirrors, tracking-parameter duplicates, syndicated copies)
via <link rel="canonical" href="...">. For KG construction this is a
page-identity statement: triples extracted from a variant belong to the
canonical page. The reference's analog is module aliasing — one logical
unit reachable under several names collapses to a single node
(extractor.py import-alias resolution); here the alias evidence is
self-declared in the markup.

Scale shape: identical to recrawl.latest_captures — ONE aggregation
keyed by the canonical url with map-side partial combine
(groupBy.agg(max_by)), never a window over all captures. The kept
representative is deterministic: the self-capture (the canonical url
itself, when crawled) wins, else latest warc_ts, else lexicographic
url — so reruns are bit-identical (E11 discipline). A viral canonical
target with 10^6 declared variants is a hot KEY, but partial aggregation
means each map partition sends at most one candidate row per canonical,
so the reducer sees O(partitions), not O(variants).

Extraction is one JVM regexp per attribute order (rel-then-href and
href-then-rel), no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Real-web tolerant: case-insensitive, quote-agnostic (VERDICT r3 top task)
_REL_HREF = (
    "(?i)<link\\b[^>]*\\brel\\s*=\\s*[\"']canonical[\"']"
    "[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"
)
_HREF_REL = (
    "(?i)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"
    "[^>]*\\brel\\s*=\\s*[\"']canonical[\"']"
)


def canonical_url_col(html_col: Column) -> Column:
    """Declared canonical url, NULL when the page declares none.

    Handles both attribute orders; [^>]* cannot cross a tag boundary, so
    a stylesheet <link> followed by the canonical <link> does not
    mis-pair attributes across tags.
    """
    h = html_col.cast("string")
    a = F.regexp_extract(h, _REL_HREF, 1)
    b = F.regexp_extract(h, _HREF_REL, 1)
    return F.when(a != "", a).when(b != "", b)


def collapse_canonical(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """One row per canonical url; variants collapse onto it.

    Output keeps the input schema with `url` REWRITTEN to the canonical
    form, plus `src_url` (the kept variant's original url) and
    `n_variants` (lineage counter). Pages declaring no canonical — or
    declaring themselves — group under their own url.
    """
    canon = F.coalesce(canonical_url_col(F.col(html_col)), F.col(url_col))
    payload = list(pages.columns)
    has_ts = "warc_ts" in pages.columns
    # sort key: self-capture first, then recency, then url (total order)
    key_fields = [(F.col(url_col) == F.col("_canon")).cast("int").alias("_self")]
    if has_ts:
        key_fields.append(F.col("warc_ts").alias("_ts"))
    key_fields.append(F.col(url_col).alias("_u"))
    picked = (
        pages.withColumn("_canon", canon)
        .groupBy(F.col("_canon").alias("_canonical"))
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]), F.struct(*key_fields)
            ).alias("_best"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )
    return picked.select(
        *[
            F.col("_canonical").alias(url_col) if c == url_col
            else F.col(f"_best.{c}").alias(c)
            for c in payload
        ],
        F.col(f"_best.{url_col}").alias("src_url"),
        "n_variants",
    )


_HREFLANG_TAG_RE = "(?i)<link\\b[^>]*\\bhreflang\\s*=\\s*[\"'][^\"']*[\"'][^>]*>"
_HREFLANG_RE = "(?i)\\bhreflang\\s*=\\s*[\"']([^\"']*)[\"']"
_HREF_RE = "(?i)\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"
_REL_ALTERNATE_RE = "(?i)\\brel\\s*=\\s*[\"']alternate[\"']"


def hreflang_alternates(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, hreflang, alt_url) — declared language variants of a page
    (<link rel="alternate" hreflang=...>), the multilingual sibling of
    the canonical declaration: the variants are DISTINCT pages (per-
    language entities) linked as translations, not duplicates to
    collapse. One regexp pass collects link tags carrying hreflang (any
    attribute order); a filter keeps only rel="alternate" ones, then
    per-tag regexps pull hreflang and href. Tags missing an href are
    dropped; the x-default tag is kept (its hreflang value is the
    literal 'x-default')."""
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_HREFLANG_TAG_RE), 0
    )
    e = pages.select(
        F.col(url_col).alias("url"), F.explode(tags).alias("_t")
    ).where(F.col("_t").rlike(_REL_ALTERNATE_RE))
    return e.select(
        "url",
        F.regexp_extract("_t", _HREFLANG_RE, 1).alias("hreflang"),
        F.regexp_extract("_t", _HREF_RE, 1).alias("alt_url"),
    ).where(F.col("alt_url") != "")
