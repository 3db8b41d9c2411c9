"""robots.txt parsing + url filtering (sources/robots.py)."""

from __future__ import annotations

from codebased_spark.sources.robots import apply_robots, host_rules

ROBOTS = """# crawl policy
User-agent: googlebot
Disallow: /private/

User-agent: other-bot
User-agent: *
Disallow: /de/
Disallow: /tmp
Disallow:

User-agent: special
Disallow: /everything/
"""


def test_star_group_rules_only(spark):
    df = spark.createDataFrame([("h.example.com", ROBOTS)], ["host", "robots_txt"])
    rules = host_rules(df).collect()[0].rules
    # /private/ belongs to googlebot's group, /everything/ to special's;
    # the stacked UA header (other-bot + *) takes both rules; the empty
    # Disallow contributes nothing
    assert rules == ["/de/", "/tmp"]


def test_apply_robots_prefix_blocking_and_missing_hosts(spark):
    robots = spark.createDataFrame(
        [("a.example.com", "User-agent: *\nDisallow: /blocked/")],
        ["host", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [
            ("https://a.example.com/blocked/x",),
            ("https://a.example.com/blocked-not/",),  # prefix is /blocked/
            ("https://a.example.com/open/x",),
            ("https://norobots.example.com/anything",),
        ],
        ["url"],
    )
    got = {r.url: r.allowed for r in apply_robots(urls, robots).collect()}
    assert got == {
        "https://a.example.com/blocked/x": 0,
        "https://a.example.com/blocked-not/": 1,
        "https://a.example.com/open/x": 1,
        "https://norobots.example.com/anything": 1,
    }


def test_plan_is_pure_jvm(spark):
    robots = spark.createDataFrame([("h", "User-agent: *\nDisallow: /x")],
                                   ["host", "robots_txt"])
    urls = spark.createDataFrame([("https://h/x",)], ["url"])
    p = apply_robots(urls, robots)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
