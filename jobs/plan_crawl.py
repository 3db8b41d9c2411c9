#!/usr/bin/env python
"""spark-submit entry point for crawl planning.

Composes the crawl-side operators into the scheduler run a recrawl
performs before fetching anything:

    sitemap parse                 (sources/sitemap.py)
    -> staleness vs stored crawl  (stale_urls: lastmod newer or never seen)
    -> robots compliance          (sources/robots.py, RFC 9309, optional)
    -> host-fair politeness waves (sources/frontier.py: one url per host
                                   per wave, stalest first)
    -> Crawl-delay pacing         (robots Crawl-delay x wave ->
                                   fetch_after_s, when --robots given)

Outputs under --out:
    schedule/   (url, host, wave) parquet — wave w is a fetchable batch
    report line counts on stdout (one JSON line)

Usage:
    spark-submit --py-files codebased_spark.zip jobs/plan_crawl.py \\
        --sitemaps /path/sitemaps_parquet  # (host, sitemap_xml)
        --out /tmp/plan \\
        [--crawled /path/pages_parquet] [--robots /path/robots_parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sitemaps", required=True,
                    help="parquet with (host, sitemap_xml) columns")
    ap.add_argument("--crawled", help="parquet with (url, warc_ts) of the stored crawl")
    ap.add_argument("--robots", help="parquet with (host, robots_txt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from codebased_spark.session import get_spark
    from codebased_spark.sources.frontier import schedule_frontier
    from codebased_spark.sources.sitemap import parse_sitemap, stale_urls

    spark = get_spark("codebased-plan-crawl", master=args.master)
    entries = parse_sitemap(spark.read.parquet(args.sitemaps))
    n_declared = entries.count()

    if args.crawled:
        crawled = spark.read.parquet(args.crawled).select("url", "warc_ts")
        work = stale_urls(entries, crawled)
    else:
        work = entries.select(F.col("loc").alias("url"),
                              F.lit(None).cast("timestamp").alias("_declared"))
    if args.robots:
        from codebased_spark.sources.robots import apply_robots

        robots = spark.read.parquet(args.robots)
        work = (
            apply_robots(work, robots)
            .where(F.col("allowed") == 1)
            .drop("allowed")
        )

    # stalest (oldest declared lastmod) first inside each host; nulls
    # (never-crawled / no lastmod) lead so discovery outranks refresh
    schedule = schedule_frontier(
        work, priority_col=F.coalesce(
            F.col("_declared"), F.lit("1970-01-01").cast("timestamp")
        )
    )
    if args.robots:
        from codebased_spark.sources.frontier import paced_schedule

        schedule = paced_schedule(schedule, robots)
    schedule.write.mode("overwrite").parquet(f"{args.out}/schedule")

    out = spark.read.parquet(f"{args.out}/schedule")
    report = {
        "n_declared": n_declared,
        "n_scheduled": out.count(),
        "n_hosts": out.select("host").distinct().count(),
        "max_wave": (out.agg(F.max("wave")).collect()[0][0] if out.count() else None),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
