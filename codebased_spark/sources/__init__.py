"""Source/sink helpers: bucketed tables for co-located joins."""

from codebased_spark.sources.bucketed import write_bucketed  # noqa: F401
