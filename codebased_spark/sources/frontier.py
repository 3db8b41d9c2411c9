"""Crawl-frontier politeness scheduling — host-fair fetch waves.

The crawl-side planning op: a frontier of candidate urls is assigned to
fetch WAVES such that each host appears at most once per wave (the
politeness invariant — one in-flight request per host), with a
deterministic priority order inside each host. Wave w is then a
fetchable batch: every url in it hits a distinct host.

Scale shape: one window per host (row_number over the host partition,
ordered by the priority key). This is the semantically REQUIRED shuffle
— per-host ordering cannot be computed without co-locating a host's
urls — and host cardinality on a real crawl is huge, so parallelism is
wide; a single mega-host serializes only its own queue, which is exactly
what politeness demands anyway (its depth IS its fetch horizon). No
corpus-wide sort: waves are per-host ranks, never a global order.

Reference analog: SURVEY.md S1/S2 (the reference walks and batches the
source tree deterministically before extraction); this is the crawl
equivalent that decides WHAT to fetch when, feeding the S9 batched-sink
machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import host_col


def schedule_frontier(
    urls: DataFrame,
    url_col: str = "url",
    priority_col: Column | None = None,
) -> DataFrame:
    """(url, host, wave): wave = 0-based per-host fetch slot.

    Priority defaults to the url itself (lexicographic) so the schedule
    is reproducible across runs and engines; pass e.g. a sitemap
    lastmod or PageRank column to fetch important urls first. Ties are
    broken by url to keep the assignment total."""
    u = F.col(url_col)
    pri = priority_col if priority_col is not None else u
    host = host_col(u)
    w = Window.partitionBy("host").orderBy("_pri", "url")
    return (
        urls.select(u.alias("url"), host.alias("host"), pri.alias("_pri"))
        .distinct()
        .withColumn("wave", F.row_number().over(w) - 1)
        .drop("_pri")
    )


def paced_schedule(
    schedule: DataFrame,
    robots: DataFrame,
    default_delay_s: int = 1,
    host_col_name: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """schedule + (delay_s, fetch_after_s): politeness pacing — wave w on
    a host with Crawl-delay d may fetch no earlier than w*d seconds into
    the run (one fetch per host per wave, waves d seconds apart). Hosts
    without a robots row or directive use default_delay_s. Broadcast-
    sized join: one delay row per host."""
    from codebased_spark.sources.robots import crawl_delay_col

    delays = robots.select(
        F.col(host_col_name).alias("host"),
        crawl_delay_col(F.col(body_col)).alias("_d"),
    )
    return (
        schedule.join(F.broadcast(delays), "host", "left")
        .withColumn("delay_s", F.coalesce("_d", F.lit(default_delay_s)))
        .drop("_d")
        .withColumn("fetch_after_s", F.col("wave") * F.col("delay_s"))
    )
