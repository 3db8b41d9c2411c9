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


def apportion_budget(
    mass: DataFrame,
    budget: int,
    host_col_name: str = "host",
    mass_col: str = "mass",
) -> DataFrame:
    """(host, mass, base_quota, quota): apportion an integer fetch budget
    across hosts proportionally to `mass` by Hamilton's largest-remainder
    method — the crawl-planning step that turns host quality/demand mass
    into per-host fetch slots for the next cycle.

    Exact integer arithmetic end to end: base_quota = budget*m_i div M,
    the leftover budget - sum(base_quota) slots go to the largest
    remainders (budget*m_i mod M), ties broken by host ascending, so
    sum(quota) == budget exactly and any ANSI engine reproduces the
    result bit-for-bit (no float proportions, no rounding drift).

    Scale shape: one (host) aggregation upstream produces `mass`; the
    global total and the leftover count arrive as broadcast 1-row
    aggregates; the remainder ranking is one window over the HOST
    dimension — vocabulary-sized relative to the page corpus. For crawls
    whose host table itself is too large for a single ordering, apportion
    hierarchically (budget -> registrable domain -> host), which is this
    same operator applied twice.
    """
    m = mass.select(
        F.col(host_col_name).alias("host"),
        F.col(mass_col).cast("long").alias("mass"),
    )
    tot = m.agg(F.sum("mass").alias("m_total"))
    quot = (
        m.crossJoin(F.broadcast(tot))
        .withColumn("base_quota", F.expr(f"({budget} * mass) div m_total"))
        .withColumn("rem", F.expr(f"({budget} * mass) % m_total"))
    )
    leftover = quot.agg(
        (F.lit(budget) - F.sum("base_quota")).alias("leftover")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("host"))
    return (
        quot.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "host",
            "mass",
            "base_quota",
            (
                F.col("base_quota")
                + F.when(F.col("rn") <= F.col("leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("quota"),
        )
    )
