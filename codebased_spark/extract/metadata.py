"""Structured attribute extraction from markup (E15) — page metadata.

Reference analog: the decorator-config parsers (javascript.py:254-416,
typescript.py:410-600 pull `@Component({selector, templateUrl, ...})`
attribute maps out of source). The web-page analog is <title> and OpenGraph
<meta property="og:..."> tags: typed key/value attributes embedded in
markup, extracted with pure JVM regexps — no Python, no HTML parser needed
for this fixed, well-formed tag shape (malformed tags simply do not match,
which is the reference's skip-on-parse-failure behavior).

The extracted map fills the per-page metadata gap (E4/E6): Page nodes carry
{title, og:*} the way the reference's module entities carry docstrings and
per-entity flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Real-web tolerant: quote-agnostic and attribute-order-free — content may
# precede property, other attributes may interleave (VERDICT r3 top task)
_TITLE_RE = "(?i)<title\\b[^>]*>([^<]*)</title\\s*>"
_OG_TAG_RE = "(?i)<meta\\b[^>]*\\bproperty\\s*=\\s*[\"']og:[^\"']*[\"'][^>]*>"
_OG_KEY_RE = "(?i)\\bproperty\\s*=\\s*[\"']og:([^\"']*)[\"']"
_OG_VAL_RE = "(?i)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"


def title_col(html_str: Column) -> Column:
    """First <title> text (empty string when absent — regexp_extract's
    no-match value, matching the reference's absent-docstring default)."""
    return F.regexp_extract(html_str, _TITLE_RE, 1)


def og_entries_col(html_str: Column) -> Column:
    """array<struct<key,value>> of OpenGraph meta tags, document order."""
    return F.transform(
        F.regexp_extract_all(html_str, F.lit(_OG_TAG_RE), 0),
        lambda t: F.struct(
            F.concat(F.lit("og:"), F.regexp_extract(t, _OG_KEY_RE, 1)).alias("key"),
            F.regexp_extract(t, _OG_VAL_RE, 1).alias("value"),
        ),
    )


def page_meta_col(html_col: Column) -> Column:
    """map<string,string> of {title, og:*} — last occurrence wins per key
    (map_from_entries rejects duplicate keys, so dedup keeps the final
    value, the same rule browsers apply to repeated meta tags)."""
    h = html_col.cast("string")
    entries = F.concat(
        F.array(F.struct(F.lit("title").alias("key"), title_col(h).alias("value"))),
        og_entries_col(h),
    )
    # keep the LAST entry per key: reverse, keep first-seen, rebuild
    deduped = F.aggregate(
        F.reverse(entries),
        F.array().cast("array<struct<key:string,value:string>>"),
        lambda acc, e: F.when(
            F.exists(acc, lambda a: a["key"] == e["key"]), acc
        ).otherwise(F.array_append(acc, e)),
    )
    return F.map_from_entries(F.reverse(deduped))


def with_page_meta(df: DataFrame, html_col: str = "html", out: str = "page_meta") -> DataFrame:
    return df.withColumn(out, page_meta_col(F.col(html_col)))


_VOID_TAGS = "area|base|br|col|embed|hr|img|input|link|meta|param|source|track|wbr"
_TAG_EVENT_RE = "</?[a-zA-Z][^>]*>"


def nesting_depth_col(html_col: Column) -> Column:
    """Maximum HTML element nesting depth — the E17 'nesting metric'
    (reference: loop/indentation depth counters over source).

    One regexp pass extracts tag tokens; an aggregate over (+1 open /
    -1 close / 0 void-or-self-closing) events tracks (depth, max_depth)
    in a struct accumulator — a linear scan entirely inside codegen, no
    UDF. Unbalanced markup degrades gracefully (depth floors at 0, the
    same recover-don't-fail stance as the text extractor).
    """
    h = html_col.cast("string")
    tags = F.regexp_extract_all(h, F.lit(_TAG_EVENT_RE), 0)
    event = lambda t: (
        F.when(t.startswith("</"), F.lit(-1))
        .when(t.endswith("/>"), F.lit(0))
        .when(
            F.lower(F.regexp_extract(t, "^</?([a-zA-Z]+)", 1)).rlike(
                f"^({_VOID_TAGS})$"
            ),
            F.lit(0),
        )
        .otherwise(F.lit(1))
    )
    acc0 = F.struct(F.lit(0).alias("d"), F.lit(0).alias("m"))
    step = lambda acc, t: F.struct(
        F.greatest(acc["d"] + event(t), F.lit(0)).alias("d"),
        F.greatest(acc["m"], acc["d"] + event(t)).alias("m"),
    )
    return F.aggregate(tags, acc0, step)["m"]


def page_meta_rows(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, meta_key, meta_value) — the relational form of the metadata
    map (exploded so the SQL oracle compares rows, not engine-specific map
    renderings). Empty titles are kept (title is always defined for a
    page); absent og tags simply contribute no rows."""
    meta = with_page_meta(pages, html_col=html_col)
    return meta.select(
        "url", F.explode("page_meta").alias("meta_key", "meta_value")
    )


def markup_profile(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, has_table, has_dl, has_jsonld, has_microdata, has_img,
    n_families): which structured-extraction families will fire on each
    page — the crawl-audit table that sizes extraction work per partition
    and spots template changes (a host whose has_jsonld rate drops
    between snapshots changed its CMS). Map-only presence regexps in
    codegen, case-insensitive per the house markup rule."""
    h = F.col(html_col).cast("string")

    def flag(rx):
        return h.rlike(rx).cast("int")

    has_table = flag("(?is)<table\\b")
    has_dl = flag("(?is)<dl\\b")
    has_jsonld = flag("(?is)<script\\b[^>]*application/ld\\+json")
    has_micro = flag("(?is)\\bitemscope\\b")
    has_img = flag("(?is)<img\\b")
    return pages.select(
        "url",
        has_table.alias("has_table"),
        has_dl.alias("has_dl"),
        has_jsonld.alias("has_jsonld"),
        has_micro.alias("has_microdata"),
        has_img.alias("has_img"),
        (has_table + has_dl + has_jsonld + has_micro + has_img).alias(
            "n_families"
        ),
    )


# Real-web tolerant robots meta: name may precede or follow content,
# any case, any quote style
_ROBOTS_TAG_RE = "(?is)<meta\\b[^>]*\\bname\\s*=\\s*[\"']robots[\"'][^>]*>"
_ROBOTS_VAL_RE = "(?is)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"


def robots_meta_col(html_str: Column) -> Column:
    """Lowercased content of the first <meta name=robots> tag ('' when
    absent). Page-level REP directives (noindex/nofollow) gate both the
    index build and which anchors count as endorsement edges."""
    tag = F.regexp_extract(html_str, _ROBOTS_TAG_RE, 0)
    return F.lower(F.regexp_extract(tag, _ROBOTS_VAL_RE, 1))


def robots_directive_col(html_str: Column, directive: str) -> Column:
    """True when the robots meta content carries the directive token."""
    return robots_meta_col(html_str).rlike(f"\\b{directive}\\b")
