"""URL manipulation columns — host/path/domain extraction + normalization.

Reference analog (§2.7): the path-manipulation helpers (relative-path
resolution, prefix stripping) the extractors use on file paths; for web
pages the equivalent unit is the URL. All pure JVM: `parse_url` is a
built-in Catalyst expression, the rest is regexp/split/slice — zero
Python, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_col(url: Column) -> Column:
    """NULL for malformed urls (try_parse_url) — a crawl always contains
    garbage urls and one bad row must not fail the job."""
    return F.try_parse_url(url, F.lit("HOST"))


def path_col(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("PATH"))


def registrable_domain_col(url: Column) -> Column:
    """Last two host labels ('news.example.com' -> 'example.com').

    A full public-suffix list lookup is a broadcast-join against the PSL
    table in production; two labels is the deterministic stand-in here.
    """
    parts = F.split(host_col(url), "\\.")
    return F.array_join(
        F.slice(parts, F.greatest(F.size(parts) - 1, F.lit(1)), 2), "."
    )


def normalize_url_col(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment dropped, trailing slash on bare host."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    # lowercase scheme://host but not the path
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, "^([a-zA-Z]+://[^/]*)", 1)),
        F.regexp_replace(no_frag, "^[a-zA-Z]+://[^/]*", ""),
    )
    no_port = F.regexp_replace(lowered, "^(https://[^/:]+):443(?=/|$)", "$1")
    no_port = F.regexp_replace(no_port, "^(http://[^/:]+):80(?=/|$)", "$1")
    return F.when(
        no_port.rlike("^[a-z]+://[^/]+$"), F.concat(no_port, F.lit("/"))
    ).otherwise(no_port)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    u = F.col(url_col)
    return df.withColumns(
        {
            "host": host_col(u),
            "path": path_col(u),
            "domain": registrable_domain_col(u),
            "url_norm": normalize_url_col(u),
        }
    )


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, template, n_urls): URL pattern census — digit runs in the
    path collapse to '{n}', so /en/doc/42 and /en/doc/7 share a
    template. The standard crawl-frontier analytic: templates with
    runaway n_urls are faceted-search / calendar traps to cap, and the
    census doubles as the site-structure profile a scoped recrawl uses.
    Map-side regexps + one (host, template) count shuffle with map-side
    combine — heavy templates ARE the hot keys the combine collapses."""
    u = F.col(url_col)
    host = host_col(u)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    template = F.regexp_replace(path, r"[0-9]+", "{n}")
    return (
        df.select(host.alias("host"), template.alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path ('/'-prefixed): fold the
    segment list through a stack — '.' skips, '..' pops, everything else
    (including empty segments from '//') pushes. A trailing '.'/'..'
    leaves a trailing slash (the spec's output-buffer behavior), modeled
    by appending one empty segment before the fold. Pure JVM: split +
    aggregate over an array column, no Python, no UDF.
    """
    segs = F.split(F.regexp_replace(path, "^/", ""), "/")
    segs = F.when(
        F.element_at(segs, -1).isin(".", ".."),
        F.concat(segs, F.array(F.lit(""))),
    ).otherwise(segs)
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    return F.concat(F.lit("/"), F.array_join(stack, "/"))


def resolve_url_col(base: Column, href: Column) -> Column:
    """RFC 3986 §5 reference resolution — real crawl HTML is dominated by
    relative hrefs, and a link graph that drops them is missing most of
    its edges. Handles absolute refs, protocol-relative (//host/...),
    root-relative (/p), query-only (?q), empty/fragment-only (→ base),
    and path-relative refs with '.'/'..' dot-segment removal.

    Fragments are dropped (link-graph identity ignores them); the ref's
    query is preserved. Executable spec: tests/test_urlresolve.py runs
    the RFC §5.4 example battery against urllib.parse.urljoin.

    Reference analog (§2.7 path helpers): the reference resolves relative
    module paths against the scanned root (base.py path joins); the web
    equivalent is href-against-page-url resolution. All JVM expressions —
    regexp splits + one aggregate fold — so it runs inside codegen and
    scales as a map-only pass.
    """
    nofrag = F.regexp_replace(F.trim(href), "#.*$", "")
    q = F.regexp_extract(nofrag, "(\\?.*)$", 1)
    p = F.regexp_replace(nofrag, "\\?.*$", "")
    scheme = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    bpath_raw = F.regexp_extract(
        base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    bpath = F.when(bpath_raw == "", F.lit("/")).otherwise(bpath_raw)
    bdir = F.regexp_replace(bpath, "[^/]*$", "")
    return (
        F.when(p.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), nofrag)
        .when(p.rlike("^//"), F.concat(scheme, F.lit(":"), nofrag))
        .when(p.rlike("^/"), F.concat(origin, _remove_dot_segments(p), q))
        .when(
            p == "",
            F.when(q != "", F.concat(origin, bpath, q)).otherwise(
                F.regexp_replace(base, "#.*$", "")
            ),
        )
        .otherwise(
            F.concat(origin, _remove_dot_segments(F.concat(bdir, p)), q)
        )
    )


_BASE_HREF_RE = "(?i)<base\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"


def base_href_col(html_col: Column) -> Column:
    """First <base href=...> value, '' if absent — HTML defines the FIRST
    base element as authoritative. Case/quote/attr-order tolerant per the
    house markup rule."""
    return F.regexp_extract(html_col.cast("string"), _BASE_HREF_RE, 1)


def resolved_link_edges(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_url, target) page-graph edges with every href resolved to an
    absolute url — the input the domain graph / PageRank compositions
    need on real crawl data, where most hrefs are relative.

    Honors <base href>: hrefs resolve against the page's base element
    when present (itself resolved against the page url first, since base
    may be relative), else against the page url."""
    from codebased_spark.extract.html_text import href_targets

    h = F.col(html_col)
    base_tag = base_href_col(h)
    base = F.when(
        base_tag == "", F.col("url")
    ).otherwise(resolve_url_col(F.col("url"), base_tag))
    return (
        pages.select(
            F.col("url").alias("src_url"),
            base.alias("_base"),
            F.explode(href_targets(h)).alias("href"),
        )
        .select(
            "src_url",
            resolve_url_col(F.col("_base"), F.col("href")).alias("target"),
        )
        # link-graph edges are http(s) only: mailto:/javascript:/tel:/data:
        # hrefs resolve verbatim (they are absolute refs) and would
        # otherwise pollute the domain graph / PageRank inputs
        .where(F.col("target").rlike("(?i)^https?://"))
    )


# tracking parameters every crawler strips before url-keyed dedup
# (public convention: Google's utm_* campaign family + the common
# click-id params)
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="


def canonicalize_url_col(url: Column) -> Column:
    """Full url canonicalizer for url-keyed dedup/frontier seen-sets:
    normalize_url_col (scheme/host case, default ports, fragment) PLUS
    query canonicalization — tracking params dropped, remaining params
    sorted so param ORDER no longer splits identical resources into
    distinct keys. Complements the LEARNED per-host strip rules
    (sources/dust.py): this is the fixed, host-independent pass that
    runs first. Pure JVM split/filter/sort/join — map-only."""
    base = normalize_url_col(url)
    path = F.regexp_replace(base, "\\?.*$", "")
    qs = F.regexp_extract(base, "\\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        (qs == "") | (F.size(kept) == 0), path
    ).otherwise(F.concat(path, F.lit("?"), F.array_join(kept, "&")))
