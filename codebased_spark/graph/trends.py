"""Trending-entity detection over timestamped mention observations.

A recrawl corpus is a time series of assertions: the per-bucket mention
count of an entity is its attention curve, and the KG serving layer wants
"what's rising NOW" (entity onboarding, cache warming, editorial review
queues). The reference's graph is a single snapshot — its closest analog
is the stats scan (server.py stats endpoint); the trend axis is what a
crawl-timestamped corpus adds on top.

entity_trends compares the newest complete time bucket against the one
before it, per entity, and labels the direction. Everything stays an
exact integer so the result is value-checkable cross-engine.

Scale shape: one (entity, bucket) count with map-side partial
aggregation, one 1-row global-max aggregate broadcast back (a scalar
join, not a shuffle), one final (entity) aggregate over at most two
buckets' worth of rows. Nothing is corpus-global beyond the 1-row max;
no driver collect. At 10^12 observations the counts table is
O(|entities| x |buckets|), already the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_trends(
    obs: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    bucket_s: int = 120,
    persist_counts: bool = True,
) -> DataFrame:
    """(entity_id, cur_n, prev_n, trend) over the two newest buckets.

    `obs` holds one row per mention observation with an epoch-seconds
    timestamp. Buckets are floor(ts / bucket_s); the comparison window
    is the globally newest bucket vs its predecessor. trend is
    'new' (absent before), 'gone' (absent now), 'rising', 'falling',
    or 'flat'; entities absent from BOTH buckets don't appear.
    """
    counts = (
        obs.select(
            F.col(entity_col).alias("entity_id"),
            F.floor(F.col(ts_col) / bucket_s).cast("long").alias("bucket"),
        )
        .groupBy("entity_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if persist_counts:
        # counts feeds BOTH the global-max aggregate and the windowed
        # scan below; without a persist each subtree re-derives it from
        # the raw observations — two corpus passes at 100 TB for a
        # table that is only |entities| x |buckets| rows. The broadcast
        # side computes first, so the cache is warm for the probe side.
        counts = counts.persist()
    latest = counts.agg(F.max("bucket").alias("_maxb"))
    windowed = counts.join(F.broadcast(latest)).where(
        F.col("bucket") >= F.col("_maxb") - 1
    )
    cur_n = F.sum(
        F.when(F.col("bucket") == F.col("_maxb"), F.col("n")).otherwise(0)
    ).alias("cur_n")
    prev_n = F.sum(
        F.when(F.col("bucket") == F.col("_maxb") - 1, F.col("n")).otherwise(0)
    ).alias("prev_n")
    agg = windowed.groupBy("entity_id").agg(cur_n, prev_n)
    trend = (
        F.when(F.col("prev_n") == 0, F.lit("new"))
        .when(F.col("cur_n") == 0, F.lit("gone"))
        .when(F.col("cur_n") > F.col("prev_n"), F.lit("rising"))
        .when(F.col("cur_n") < F.col("prev_n"), F.lit("falling"))
        .otherwise(F.lit("flat"))
    )
    return agg.withColumn("trend", trend)
