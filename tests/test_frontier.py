"""Crawl-frontier politeness scheduling (sources/frontier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.sources.frontier import schedule_frontier


def test_one_host_per_wave_invariant(spark):
    urls = spark.createDataFrame(
        [(f"https://h{i % 3}.org/p{i}",) for i in range(12)], ["url"]
    )
    out = schedule_frontier(urls)
    # politeness: (host, wave) pairs are unique
    assert (
        out.groupBy("host", "wave").count().where("count > 1").count() == 0
    )
    # waves are dense 0..n-1 per host
    per_host = out.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"), F.max("wave").alias("mx")
    )
    assert per_host.where(F.col("mx") != F.col("n") - 1).count() == 0


def test_priority_column_orders_within_host(spark):
    urls = spark.createDataFrame(
        [
            ("https://h.org/low", 9),
            ("https://h.org/high", 1),
            ("https://h.org/mid", 5),
        ],
        ["url", "rank"],
    )
    out = {
        r.url: r.wave
        for r in schedule_frontier(urls, priority_col=F.col("rank")).collect()
    }
    assert out == {
        "https://h.org/high": 0,
        "https://h.org/mid": 1,
        "https://h.org/low": 2,
    }


def test_duplicate_urls_deduped(spark):
    urls = spark.createDataFrame(
        [("https://h.org/a",), ("https://h.org/a",), ("https://h.org/b",)],
        ["url"],
    )
    out = schedule_frontier(urls)
    assert out.count() == 2
    assert {r.wave for r in out.collect()} == {0, 1}


def test_paced_schedule_crawl_delay(spark):
    from codebased_spark.sources.frontier import paced_schedule

    urls = spark.createDataFrame(
        [(f"https://slow.org/p{i}",) for i in range(3)]
        + [(f"https://fast.org/p{i}",) for i in range(3)]
        + [("https://norobots.org/p0",)],
        ["url"],
    )
    robots = spark.createDataFrame(
        [
            ("slow.org", "User-agent: *\nCrawl-Delay: 10\nDisallow: /x/"),
            ("fast.org", "User-agent: *\nDisallow: /y/"),  # no directive
        ],
        ["host", "robots_txt"],
    )
    out = {
        (r.host, r.wave): (r.delay_s, r.fetch_after_s)
        for r in paced_schedule(
            schedule_frontier(urls), robots, default_delay_s=2
        ).collect()
    }
    assert out[("slow.org", 0)] == (10, 0)
    assert out[("slow.org", 2)] == (10, 20)
    assert out[("fast.org", 2)] == (2, 4)      # default: no directive
    assert out[("norobots.org", 0)] == (2, 0)  # default: no robots row
