"""Site-technology fingerprinting — the Wappalyzer-style census.

Crawl pipelines tag each host with the software that generates it
(WordPress/Drupal/Shopify/...) because technology correlates strongly
with content class (blogs vs storefronts vs docs) and with boilerplate
structure — the tag drives both corpus mixing and template-aware
cleaning. Evidence: the `<meta name=generator>` tag and
platform-specific asset paths; both are single codegen regexes, case/
quote/attribute-order tolerant per the r3 markup-tolerance rule.

Scale shape: detection is map-only (an array of matched techs per page,
exploded); the census is one (host, tech) count with map-side combine.
Reference analog: S4/S5 — per-file detection routing rows into a typed
registry (src/codebased/parsers/file_types.py:47-74, registry dispatch
in extract/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tech -> evidence regex (generator meta in any attribute order, or a
# platform asset path)
TECH_PATTERNS: dict[str, str] = {
    # lookaheads make the generator evidence attribute-ORDER-free:
    # content= can precede name= (real CMSes emit both orders)
    "wordpress": r"(?is)<meta(?=[^>]*generator)(?=[^>]*wordpress)|/wp-content/",
    "drupal": r"(?is)<meta(?=[^>]*generator)(?=[^>]*drupal)",
    "shopify": r"(?is)cdn\.shopify\.com",
}


def tech_signals(pages: DataFrame, html_col: str = "html_text") -> DataFrame:
    """One row per (page, detected tech). Pages with no match emit no
    row — explode of the filtered match array drops them."""
    matches = F.array(
        *[
            F.when(F.col(html_col).rlike(pat), F.lit(tech))
            for tech, pat in TECH_PATTERNS.items()
        ]
    )
    return pages.withColumn(
        "tech", F.explode(F.filter(matches, lambda t: t.isNotNull()))
    )


def tech_census(pages: DataFrame, host_col: str = "host",
                html_col: str = "html_text") -> DataFrame:
    """(host, tech, n_pages) — the per-host technology census."""
    return (
        tech_signals(pages, html_col)
        .groupBy(host_col, "tech")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
