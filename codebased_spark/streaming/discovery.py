"""Streaming crawl discovery — feeds/sitemaps to a deduped URL frontier.

The streaming face of the crawl-discovery family (sources/sitemap.py):
as feed/sitemap fetches land continuously, parse their entries with the
SAME JVM column expressions the batch parsers use (they are pure
expressions, so batch and stream cannot drift), then dedup discovered
urls within the event-time watermark so a url republished by many feeds
enters the frontier once per window.

State is bounded exactly like streaming/dedup.py:
`dropDuplicatesWithinWatermark` evicts a url's state once the watermark
passes, so memory is O(arrival rate x watermark) — the only shape that
survives an always-on discovery stream. Global frontier uniqueness (a
url rediscovered weeks later) belongs to the batch scheduler, which
anti-joins against the stored crawl (stale_urls) anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codebased_spark.sources.sitemap import parse_feed


def stream_feed_discovery(
    spark: SparkSession,
    source_dir: str,
    schema: str = "host string, feed_xml string, fetched_at timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DataFrame of (host, url, title, fetched_at) — one row
    per first discovery of a url within the watermark window."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("fetched_at", watermark)
    )
    items = parse_feed(stream, keep_cols=("fetched_at",))
    return items.select(
        "host",
        F.col("link").alias("url"),
        "title",
        "fetched_at",
    ).dropDuplicatesWithinWatermark(["url"])
