"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8: incremental update is a batch
diff), so streaming here extends the engine the way a production web-scale
deployment would run it: pages/events arrive continuously, the same
extraction logic runs per micro-batch, and late data is bounded with
watermarks.
"""

from codebased_spark.streaming.dedup import stream_exact_dedup  # noqa: F401
from codebased_spark.streaming.enrich import enrich_page_stream  # noqa: F401
from codebased_spark.streaming.ingest import (  # noqa: F401
    stream_event_window_counts,
    stream_pages_to_graph,
)
