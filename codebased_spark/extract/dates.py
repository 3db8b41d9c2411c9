"""Article dating — markup-declared publish dates with a priority cascade.

Freshness drives recrawl priority, dedup tie-breaks (keep the newer
capture), and training-mix recency weighting, so a crawl pipeline mines
the page's OWN declared dates rather than trusting fetch time. Cascade
(most-specific wins): `<time datetime="...">` (HTML5 semantic element) →
`<meta property="article:published_time">` (OpenGraph) → NULL. The raw
declared strings are also kept so downstream can audit the choice.

House markup rules; map-only regexps; the timestamp parse is
try_to_timestamp (never throws on real-web garbage dates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TIME_RE = r"(?is)<time\b[^>]*\bdatetime\s*=\s*[\"']([^\"']+)[\"']"
_OG_PUB_RE = (
    r"(?is)<meta\b[^>]*\bproperty\s*=\s*[\"']article:published_time[\"']"
    r"[^>]*\bcontent\s*=\s*[\"']([^\"']+)[\"']"
)
_OG_PUB_REV_RE = (
    r"(?is)<meta\b[^>]*\bcontent\s*=\s*[\"']([^\"']+)[\"']"
    r"[^>]*\bproperty\s*=\s*[\"']article:published_time[\"']"
)


def article_dates(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, time_tag, og_published, published_at, date_source):
    published_at = parsed cascade winner, date_source in
    ('time', 'og', 'none')."""
    h = F.col(html_col).cast("string")
    t = F.regexp_extract(h, _TIME_RE, 1)
    og = F.regexp_extract(h, _OG_PUB_RE, 1)
    og = F.when(og != "", og).otherwise(F.regexp_extract(h, _OG_PUB_REV_RE, 1))
    t_ts = F.coalesce(
        F.try_to_timestamp(t), F.try_to_timestamp(t, F.lit("yyyy-MM-dd"))
    )
    og_ts = F.coalesce(
        F.try_to_timestamp(og), F.try_to_timestamp(og, F.lit("yyyy-MM-dd"))
    )
    return pages.select(
        "url",
        F.when(t != "", t).alias("time_tag"),
        F.when(og != "", og).alias("og_published"),
        F.coalesce(t_ts, og_ts).alias("published_at"),
        F.when(t_ts.isNotNull(), "time")
        .when(og_ts.isNotNull(), "og")
        .otherwise("none")
        .alias("date_source"),
    )
