"""End-to-end crawl-planning job (jobs/plan_crawl.py) — subprocess e2e,
same discipline as test_curate.py."""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sitemap(urls):
    rows = "".join(
        f"<url><loc>{u}</loc>"
        + (f"<lastmod>{lm}</lastmod>" if lm else "")
        + "</url>"
        for u, lm in urls
    )
    return f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{rows}</urlset>'


def test_plan_crawl_end_to_end(spark, tmp_path):
    sitemaps = spark.createDataFrame(
        [
            ("a.example.com", _sitemap([
                ("https://a.example.com/new", "2025-02-01"),     # stale: newer
                ("https://a.example.com/old", "2024-01-01"),     # fresh: older
                ("https://a.example.com/never", None),           # never crawled
                ("https://a.example.com/private/p", "2025-02-01"),  # robots
            ])),
            ("b.example.com", _sitemap([
                ("https://b.example.com/x", "2025-02-01"),
            ])),
        ],
        ["host", "sitemap_xml"],
    )
    crawled = spark.createDataFrame(
        [
            ("https://a.example.com/new", datetime.datetime(2025, 1, 1)),
            ("https://a.example.com/old", datetime.datetime(2025, 1, 1)),
            ("https://a.example.com/private/p", datetime.datetime(2024, 1, 1)),
        ],
        ["url", "warc_ts"],
    )
    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nDisallow: /private/")],
        ["host", "robots_txt"],
    )
    sm, cr, rb = (str(tmp_path / d) for d in ["sm", "cr", "rb"])
    out = str(tmp_path / "out")
    sitemaps.write.parquet(sm)
    crawled.write.parquet(cr)
    robots.write.parquet(rb)

    proc = subprocess.run(
        [sys.executable, "jobs/plan_crawl.py", "--sitemaps", sm,
         "--crawled", cr, "--robots", rb, "--out", out,
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert report["n_declared"] == 5
    # scheduled: a/new (stale), a/never (undiscovered), b/x; NOT a/old
    # (fresh) and NOT a/private/p (robots)
    assert report["n_scheduled"] == 3
    assert report["n_hosts"] == 2

    sched = {
        r.url: (r.host, r.wave)
        for r in spark.read.parquet(f"{out}/schedule").collect()
    }
    assert set(sched) == {
        "https://a.example.com/new",
        "https://a.example.com/never",
        "https://b.example.com/x",
    }
    # never-crawled (null lastmod -> epoch priority) fetches before the
    # stale refresh on the same host; b gets wave 0 in parallel
    assert sched["https://a.example.com/never"] == ("a.example.com", 0)
    assert sched["https://a.example.com/new"] == ("a.example.com", 1)
    assert sched["https://b.example.com/x"] == ("b.example.com", 0)


def test_plan_crawl_pacing_columns(spark, tmp_path):
    sitemaps = spark.createDataFrame(
        [("a.example.com", _sitemap([
            ("https://a.example.com/u1", None),
            ("https://a.example.com/u2", None),
        ]))],
        ["host", "sitemap_xml"],
    )
    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nCrawl-delay: 7\n")],
        ["host", "robots_txt"],
    )
    sm, rb = str(tmp_path / "sm"), str(tmp_path / "rb")
    out = str(tmp_path / "out")
    sitemaps.write.parquet(sm)
    robots.write.parquet(rb)
    proc = subprocess.run(
        [sys.executable, "jobs/plan_crawl.py", "--sitemaps", sm,
         "--robots", rb, "--out", out, "--master", "local[4]"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    sched = {
        r.wave: (r.delay_s, r.fetch_after_s)
        for r in spark.read.parquet(f"{out}/schedule").collect()
    }
    assert sched == {0: (7, 0), 1: (7, 7)}
