"""Stream-static enrichment — joining a page stream against reference tables.

The fourth streaming shape beside windowed aggregation (ingest.py),
bounded-state dedup (dedup.py), and stateful sessionization
(sessionize.py): a STREAM-STATIC JOIN. As pages land continuously, each
micro-batch is enriched against slowly-changing reference tables — the
host quality prior, the robots verdict, the gazetteer — via a broadcast
hash join, the same plan the batch pipeline uses (J3).

Why this shape matters at crawl scale: the static side is re-read per
micro-batch by Structured Streaming, so a HOT-CACHED, BROADCAST-SIZED
dimension keeps per-batch overhead flat; there is NO streaming state at
all (stateless join), so throughput is bounded by the batch join cost,
not by a state store. Joins where the STATIC side is the probe (static
LEFT JOIN stream) are not expressible incrementally and raise — the
stream must stay on the preserved side, which `enrich_page_stream`
guarantees by construction (stream LEFT OUTER static is allowed).

Reference analog: the J3 resolution join (broadcast exact alias map,
graph/pipeline.py) applied per micro-batch instead of per corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enrich_page_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    host_prior: DataFrame,
    time_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DataFrame: pages joined (stream LEFT OUTER broadcast
    static) to a (host, quality_tier) prior keyed by the url's host.
    Unknown hosts pass through with tier 'unknown' — a crawl frontier
    always contains hosts the prior table has not scored yet, and
    dropping them would silently bias the corpus toward known hosts.

    Output: url, host, quality_tier plus the pass-through columns.
    """
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(time_col, watermark)
        .withColumn(
            "host", F.parse_url(F.col("url"), F.lit("HOST"))
        )
    )
    prior = F.broadcast(
        host_prior.select(
            F.col("host").alias("p_host"), "quality_tier"
        )
    )
    return (
        stream.join(prior, stream.host == prior.p_host, "left_outer")
        .withColumn(
            "quality_tier",
            F.coalesce(F.col("quality_tier"), F.lit("unknown")),
        )
        .drop("p_host")
    )
