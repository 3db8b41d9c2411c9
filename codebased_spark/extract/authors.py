"""Authorship extraction: meta tags + visible bylines → (url, author).

Authorship is a first-class KG edge family (creator provenance, author
disambiguation, source-reliability priors per author). Webtext declares
it two ways: machine-readable `<meta name="author" content=...>` and the
human byline ("By Jane Doe" near the top of an article). A pipeline
extracts BOTH and keeps the method column — agreement between methods is
itself a confidence signal downstream fusion consumes (the reliability-
weighted fact fusion in graph/confidence.py reads exactly such
multi-method observation tables).

Markup tolerance per the house rule: case-insensitive, either quote
style, attribute order free (content before or after name=).

Scale shape: two JVM regexp passes per page + one union — no shuffle,
no UDF; author_pages() adds one map-side-combinable count.

Reference analog: none in source files; the nearest shape is E15
structured-markup attribute extraction (extract/metadata.py og:* map),
which this module's meta pass mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <meta ... name="author" ... content="X"> in either attribute order
_META_NAME_FIRST_RE = (
    "(?is)<meta\\b[^>]*name\\s*=\\s*[\"']author[\"'][^>]*"
    "content\\s*=\\s*[\"']([^\"']*)[\"']"
)
_META_CONTENT_FIRST_RE = (
    "(?is)<meta\\b[^>]*content\\s*=\\s*[\"']([^\"']*)[\"'][^>]*"
    "name\\s*=\\s*[\"']author[\"']"
)
# visible byline: "By Firstname Lastname" — two-to-three capitalized
# tokens after a 'By ' cue at a tag boundary
_BYLINE_RE = (
    "(?s)(?:^|>)\\s*[Bb]y\\s+([A-Z][\\w.-]*(?:\\s+[A-Z][\\w.-]*){1,2})"
)


def page_authors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, author, method) — method in ('meta', 'byline'); one row per
    distinct (url, author, method).

    Both extractors run in ONE projection over ONE scan (an
    array-of-structs explode, the registry.dispatch single-scan
    discipline) — a union of per-method selects would re-read the
    corpus once per method at 100 TB."""
    html = F.col(html_col).cast("string")
    meta_author = F.coalesce(
        F.nullif(F.regexp_extract(html, _META_NAME_FIRST_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, _META_CONTENT_FIRST_RE, 1), F.lit("")),
    )
    candidates = F.array(
        F.struct(
            F.trim(F.coalesce(meta_author, F.lit(""))).alias("author"),
            F.lit("meta").alias("method"),
        ),
        F.struct(
            F.trim(F.regexp_extract(html, _BYLINE_RE, 1)).alias("author"),
            F.lit("byline").alias("method"),
        ),
    )
    return (
        pages.select(
            F.col(url_col).alias("url"), F.explode(candidates).alias("_c")
        )
        .select("url", F.col("_c.author").alias("author"),
                F.col("_c.method").alias("method"))
        .where(F.col("author") != "")
        .distinct()
    )


def author_pages(authors: DataFrame) -> DataFrame:
    """(author, n_pages, n_methods) — the author entity table: page
    support and how many extraction methods attest the author."""
    return authors.groupBy("author").agg(
        F.countDistinct("url").alias("n_pages"),
        F.countDistinct("method").alias("n_methods"),
    )
