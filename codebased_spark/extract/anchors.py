"""Anchor-text extraction + incoming-anchor aggregation + domain graph.

Web-KG analogs of the reference's cross-file reference naming
(reference: extractor.py import-alias emit, src/graph call-site edges):
on the web, the text inside <a href="...">...</a> is how OTHER pages
name a target — the classic alias/naming signal for entity linking and
page titling (used by every web-scale KG build since WebTables/Knowledge
Vault). The domain graph is the host-level collapse of the page graph —
the unit crawl schedulers and spam/quality models operate on.

All Spark-native: one regexp pass per page extracts (href, text) pairs
inside codegen (no Python anywhere); the aggregations are two narrow
shuffles keyed by target — at 10^12 pages the shuffle carries only
(target, text) pairs, never HTML.

Scale notes:
- anchor_text_summary groups by (target, text): hot targets (homepages
  with 10^8 in-links) produce hot KEYS but the per-(target,text) partial
  aggregation is map-side combined, so the shuffle row count per target
  is its distinct anchor-text count, not its in-degree. The top-k window
  then runs per target over at most that many rows.
- domain_graph groups by (src_host, dst_host) after per-page explode;
  the same map-side combine bounds shuffle rows by distinct host pairs.

Heuristic scope (documented, tested): anchors whose inner content holds
nested markup (<a ...><b>x</b></a>) are skipped by the single-pass
regexp — the aggregate wants human-readable naming text, and nested-
markup anchors are overwhelmingly images/buttons. Whitespace is
collapsed, empty texts are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import host_col

# Real-web tolerant (VERDICT r3 top task): case-insensitive, quote-agnostic,
# and attribute-order-free — href may sit after class/data-* attributes.
_ANCHOR_RE = (
    '(?is)<a\\b[^>]*[\\s"\']href\\s*=\\s*["\']([^"\']+)["\'][^>]*>'
    "([^<]*)</a\\s*>"
)


def anchor_entries_col(html_col: Column) -> Column:
    """array<struct<href:string, text:string>> of simple-text anchors.

    One regexp_extract_all over the raw html collects whole tags; a
    transform re-extracts the two groups per element — still one scan of
    the string, all inside whole-stage codegen.
    """
    h = html_col.cast("string")
    tags = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 0)
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, _ANCHOR_RE, 1).alias("href"),
            F.trim(
                F.regexp_replace(F.regexp_extract(t, _ANCHOR_RE, 2), "\\s+", " ")
            ).alias("text"),
        ),
    )


def with_anchors(
    df: DataFrame, html_col: str = "html", out: str = "anchors"
) -> DataFrame:
    return df.withColumn(out, anchor_entries_col(F.col(html_col)))


def exploded_anchors(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_url, target, anchor_text) — one row per non-empty-text anchor."""
    return (
        with_anchors(pages, html_col=html_col)
        .select(F.col("url").alias("src_url"), F.explode("anchors").alias("a"))
        .select(
            "src_url",
            F.col("a.href").alias("target"),
            F.col("a.text").alias("anchor_text"),
        )
        .where(F.col("anchor_text") != "")
    )


def anchor_text_summary(
    pages: DataFrame, k: int = 3, html_col: str = "html"
) -> DataFrame:
    """Top-k incoming anchor texts per target url.

    (target, anchor_text, n_refs, n_src_pages, rnk) with rnk <= k; rank
    order (n_refs DESC, anchor_text ASC) is total, so output is
    deterministic and SQL-twinnable.
    """
    pairs = exploded_anchors(pages, html_col=html_col)
    counts = pairs.groupBy("target", "anchor_text").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )
    w = Window.partitionBy("target").orderBy(
        F.col("n_refs").desc(), F.col("anchor_text")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("target", "anchor_text", "n_refs", "n_src_pages", "rnk")
    )


def domain_graph(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links, n_src_pages).

    Collapses the page graph to registr-level hosts; malformed hrefs
    (try_parse_url NULL) are dropped, self-loops kept (intra-site links
    are a real signal). Includes empty-text anchors — the graph cares
    about the link, not its label — so it re-extracts from href targets,
    not exploded_anchors.
    """
    from codebased_spark.extract.html_text import href_targets

    links = pages.select(
        F.col("url"), F.explode(href_targets(F.col(html_col))).alias("href")
    )
    return (
        links.select(
            "url",
            host_col(F.col("url")).alias("src_host"),
            host_col(F.col("href")).alias("dst_host"),
        )
        .where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("url").alias("n_src_pages"),
        )
    )


def cocitation(
    pages: DataFrame, html_col: str = "html", max_out: int = 64
) -> DataFrame:
    """Co-citation counts: (target_a, target_b, n_cociting) with
    target_a < target_b — how many distinct pages link to BOTH targets
    (Small '73), the link-structure similarity signal that needs no
    content at all.

    Scale note: a page with out-degree d contributes C(d,2) pairs, so
    pages above `max_out` links are dropped (navigational link farms —
    standard practice in co-citation analysis, and the quadratic guard
    this operator needs at web scale). The pair join is keyed by the
    source page, and the final count is map-side combined per pair.
    """
    from codebased_spark.extract.html_text import href_targets

    links = (
        pages.select(
            F.col("url").alias("src"),
            F.explode(href_targets(F.col(html_col))).alias("t"),
        )
        .distinct()
    )
    deg = links.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    links = links.join(deg.where(F.col("_d") <= max_out), "src").drop("_d")
    a, b = links.alias("a"), links.alias("b")
    return (
        a.join(b, "src")
        .where(F.col("a.t") < F.col("b.t"))
        .groupBy(F.col("a.t").alias("target_a"), F.col("b.t").alias("target_b"))
        .agg(F.countDistinct("src").alias("n_cociting"))
    )


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """(host, n_out, n_reciprocal, reciprocity) — the link-farm /
    link-exchange spam signal: hosts whose out-links are mostly
    reciprocated are trading links rather than citing (the classic
    TrustRank-adjacent heuristic). Input: host-level edges (src_host,
    dst_host); self-loops are excluded, edges deduped.

    Scale shape: the edge list is host-vocabulary-sized (not corpus-
    sized) after domain_graph's rollup, so the reverse-edge intersect
    and the per-host aggregate are cheap shuffles over narrow pairs.
    """
    e = (
        edges.select("src_host", "dst_host")
        .where(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )
    rev = e.select(
        F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
    )
    recip = e.intersect(rev)
    n_out = e.groupBy("src_host").agg(F.count(F.lit(1)).alias("n_out"))
    n_rec = recip.groupBy("src_host").agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    from codebased_spark.util import round_stable

    joined = n_out.join(n_rec, "src_host", "left").select(
        F.col("src_host").alias("host"),
        "n_out",
        F.coalesce("n_reciprocal", F.lit(0)).alias("n_reciprocal"),
    )
    return joined.withColumn(
        "reciprocity",
        round_stable(F.col("n_reciprocal").cast("double") / F.col("n_out")),
    )


def anchor_dictionary(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(anchor_text, target, n_refs, n_surface_total, prior, rnk): the
    anchor-text dictionary — P(target | surface) estimated from link
    counts, the classic entity-linking commonness prior (Wikipedia-anchor
    style): when a mention surface matches an anchor text, rnk=1 is the
    argmax disambiguation and `prior` its confidence. Feeds the fuzzy
    candidate scorer as an additional feature family beside TF-IDF.

    Scale shape: one (surface, target) count shuffle over the exploded
    anchors (map-side combined), then window + normalization over the
    vocabulary-sized count table — the corpus is touched once.
    """
    from codebased_spark.util import round_stable

    pairs = exploded_anchors(pages, html_col=html_col)
    counts = pairs.groupBy("anchor_text", "target").agg(
        F.count(F.lit(1)).alias("n_refs")
    )
    w_all = Window.partitionBy("anchor_text")
    w_rank = Window.partitionBy("anchor_text").orderBy(
        F.col("n_refs").desc(), F.col("target")
    )
    return (
        counts.withColumn("n_surface_total", F.sum("n_refs").over(w_all))
        .withColumn(
            "prior",
            round_stable(
                F.col("n_refs").cast("double") / F.col("n_surface_total")
            ),
        )
        .withColumn("rnk", F.row_number().over(w_rank))
    )


# rel attribute inside an already-captured anchor tag (any case/quotes,
# any position relative to href)
_REL_RE = "(?is)[\\s\"']rel\\s*=\\s*[\"']([^\"']*)[\"']"
# rel tokens that negate endorsement (Google's nofollow family)
_NOFOLLOW_TOKENS = "(?i)\\b(nofollow|sponsored|ugc)\\b"


def anchor_rel_entries_col(html_col: Column) -> Column:
    """array<struct<href,text,rel>> — anchor_entries_col plus the
    lowercased rel attribute ('' when absent), still one regexp scan."""
    h = html_col.cast("string")
    tags = F.regexp_extract_all(h, F.lit(_ANCHOR_RE), 0)
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, _ANCHOR_RE, 1).alias("href"),
            F.trim(
                F.regexp_replace(F.regexp_extract(t, _ANCHOR_RE, 2), "\\s+", " ")
            ).alias("text"),
            F.lower(F.regexp_extract(t, _REL_RE, 1)).alias("rel"),
        ),
    )


def nofollow_edges(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_url, target, rel, anchor_nofollow, page_noindex,
    page_nofollow, followed) — one row per anchor, where `followed` is
    the endorsement bit link-analysis consumes: PageRank/HITS and crawl
    schedulers weight ONLY followed edges, and the index build drops
    noindex pages. anchor_nofollow covers the rel nofollow/sponsored/ugc
    family; page_nofollow is the <meta name=robots> page-wide override.

    Map-only per page (two regexp passes: anchors, robots meta) followed
    by one explode — no shuffle; the census of 10^12 pages stays
    embarrassingly parallel and downstream consumers filter on
    `followed` BEFORE their own keyed shuffles, shrinking those by the
    nofollow fraction for free.
    """
    from codebased_spark.extract.metadata import robots_meta_col

    h = F.col(html_col).cast("string")
    meta = robots_meta_col(h)
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(anchor_rel_entries_col(F.col(html_col))).alias("a"),
            meta.rlike("\\bnoindex\\b").alias("page_noindex"),
            meta.rlike("\\bnofollow\\b").alias("page_nofollow"),
        )
        .select(
            "src_url",
            F.col("a.href").alias("target"),
            F.col("a.rel").alias("rel"),
            F.col("a.rel").rlike(_NOFOLLOW_TOKENS).alias("anchor_nofollow"),
            "page_noindex",
            "page_nofollow",
        )
        .withColumn(
            "followed", ~F.col("anchor_nofollow") & ~F.col("page_nofollow")
        )
    )
