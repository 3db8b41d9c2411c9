"""Meta-refresh redirect extraction and chain resolution.

Real crawls are full of client-side redirects: moved pages leave behind
`<meta http-equiv="refresh" content="0; url=...">` stubs, and a KG
pipeline must collapse every stub onto the page the reader actually
lands on — otherwise anchors, canonical urls, and dedup keys fragment
across the chain. (HTTP 3xx redirects are resolved by the fetcher; the
meta-refresh form is the one still embedded in stored HTML, so it is
the extractor's job.)

House markup rules (VERDICT r3 top task): case-insensitive, quote-
tolerant, attribute-order free — `<META CONTENT='5;URL=x'
HTTP-EQUIV='Refresh'>` extracts the same as the lowercase canonical
form. Relative targets resolve against the page url via the engine's
RFC 3986 resolver (extract/urlops.py).

Resolution is pointer doubling: R self-joins follow 2^R hops, and the
coalesce keeps a chain pinned at its terminal once reached — ceil(log2)
rounds instead of chain-length rounds, the same distributed shape as
graph/paths.transitive_closure. Browsers cap redirect chains (~20), so
R = 4 rounds = 16 hops covers anything a real crawl yields; a cycle
(stub ring with no terminal) never resolves and is flagged
is_resolved = 0 — exactly the rows a crawl QA dashboard wants.

Reference analog: the reference collapses module aliases onto their
target symbol before emitting edges (SURVEY J8/E8); this is the web
counterpart over page identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import resolve_url_col

_META_REFRESH_RE = (
    "(?is)<meta\\b[^>]*\\bhttp-equiv\\s*=\\s*[\"']refresh[\"'][^>]*>"
)
_META_REFRESH_RE_REV = (
    "(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"'][^\"']*[\"']"
    "[^>]*\\bhttp-equiv\\s*=\\s*[\"']refresh[\"'][^>]*>"
)
_CONTENT_RE = "(?i)\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']"
_URL_IN_CONTENT_RE = "(?i)url\\s*=\\s*([^\\s\"']+)"


def redirect_target_col(url_col, html_col) -> "F.Column":
    """Declared meta-refresh target as a Column (NULL when none):
    the extraction expression alone, so callers composing several
    extractor families can run them in ONE projection over ONE scan
    (the registry.dispatch single-scan discipline)."""
    h = html_col.cast("string")
    # attribute order free: match http-equiv-first, else content-first
    tag = F.regexp_extract(h, _META_REFRESH_RE, 0)
    tag = F.when(tag != "", tag).otherwise(
        F.regexp_extract(h, _META_REFRESH_RE_REV, 0)
    )
    content = F.regexp_extract(tag, _CONTENT_RE, 1)
    raw = F.regexp_extract(content, _URL_IN_CONTENT_RE, 1)
    return F.when(raw == "", F.lit(None)).otherwise(
        resolve_url_col(url_col, raw)
    )


def redirect_edges(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(src_url, target): one row per page declaring a meta refresh with
    a url= payload (first declaration wins), target RFC-resolved against
    the page url. Map-only regexps, pure JVM."""
    return (
        pages.select(
            F.col("url").alias("src_url"),
            redirect_target_col(F.col("url"), F.col(html_col)).alias("target"),
        )
        .where(F.col("target").isNotNull() & (F.col("target") != F.col("src_url")))
    )


def resolve_redirect_chains(
    edges: DataFrame, rounds: int = 4
) -> DataFrame:
    """(src_url, final_url, is_resolved) for every redirect source.

    final_url = the chain's terminal (for chains of length <= 2^rounds),
    or the 2^rounds-th successor on an unterminated cycle. is_resolved =
    1 iff final_url is not itself a redirect source — cycles and
    over-long chains report 0."""
    m = edges.select(F.col("src_url").alias("src"), F.col("target").alias("dst"))
    for _ in range(rounds):
        nxt = m.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
        m = (
            m.join(nxt, m["dst"] == nxt["_s"], "left")
            .select(m["src"], F.coalesce(nxt["_d"], m["dst"]).alias("dst"))
            # each round references m TWICE; without materialization the
            # lazy plan doubles per round (2^rounds scans — measured 23s
            # at sf0.1 for a 15k-row mapping). The mapping is redirect-
            # stub-sized, so a per-round checkpoint is noise.
            .localCheckpoint(eager=True)
        )
    srcs = edges.select(F.col("src_url").alias("dst")).distinct()
    return (
        m.join(srcs.withColumn("_hit", F.lit(1)), "dst", "left")
        .select(
            F.col("src").alias("src_url"),
            F.col("dst").alias("final_url"),
            F.when(F.col("_hit").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_resolved"),
        )
    )
