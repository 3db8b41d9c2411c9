"""Source/sink helpers: bucketed tables, WARC crawl archives, recrawl collapse."""

from codebased_spark.sources.bucketed import write_bucketed  # noqa: F401
from codebased_spark.sources.recrawl import latest_captures  # noqa: F401
from codebased_spark.sources.warc import read_warc, warc_to_pages, write_warc  # noqa: F401
from codebased_spark.sources.canonical import collapse_canonical  # noqa: F401
from codebased_spark.sources.robots import apply_robots, host_rules  # noqa: F401
from codebased_spark.sources.sitemap import parse_sitemap, parse_sitemap_index, stale_urls  # noqa: F401
from codebased_spark.sources.iceberg import iceberg_available, read_table, write_table  # noqa: F401
