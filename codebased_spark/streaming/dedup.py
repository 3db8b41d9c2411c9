"""Streaming exact deduplication — content-hash dedup on a page stream.

The streaming face of dedup/exact.py (S6/S8): as pages land continuously,
drop every page whose extracted-content hash was already seen within the
event-time watermark. `dropDuplicatesWithinWatermark` keeps dedup state
BOUNDED — a key's state is evicted once the watermark passes its event
time, so state size is O(arrival rate x watermark), not O(corpus). That is
the only shape that survives an unbounded 10^12-page crawl; plain
streaming dropDuplicates would accumulate one state row per distinct page
forever.

Semantics (documented, not hidden): the FIRST page per content hash within
a watermark window is emitted; a duplicate arriving later than the
watermark after its original CAN be re-emitted (its state was evicted).
Cross-watermark dedup belongs to the batch/manifest layer, which is
content-hash idempotent (E11/A8) — the stream guarantees bounded state and
at-most-once-per-window, the batch read guarantees global uniqueness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    time_col: str = "warc_ts",
    watermark: str = "1 hour",
    hash_col: str = "text",
) -> DataFrame:
    """Streaming DataFrame of first-seen pages per content hash.

    Output columns: the input columns plus `content_sha256`.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(time_col, watermark)
    )
    return stream.withColumn(
        "content_sha256", F.sha2(F.col(hash_col), 256)
    ).dropDuplicatesWithinWatermark(["content_sha256"])
