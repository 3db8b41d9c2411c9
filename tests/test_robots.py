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
    assert [(r.allow, r.path) for r in rules] == [
        (False, "/de/"), (False, "/tmp")
    ]


def test_rfc9309_allow_longest_match_and_wildcards(spark):
    """RFC 9309 semantics: Allow overrides a shorter Disallow, `*`
    matches any sequence, `$` anchors at end-of-path, Allow wins
    length ties, no match => allowed."""
    body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"          # longer than /private/ -> wins
        "Disallow: /*.pdf$\n"           # wildcard + anchor
        "Disallow: /tmp*/x\n"           # infix wildcard
        "Allow: /dup\n"                 # equal length vs next line:
        "Disallow: /dup\n"              # tie -> least restrictive (Allow)
    )
    robots = spark.createDataFrame([("h", body)], ["host", "robots_txt"])
    cases = {
        "/private/secret": 0,
        "/private/ok/page": 1,       # Allow /private/ok (10) > Disallow (9)
        "/report.pdf": 0,            # /*.pdf$ matches at end
        "/report.pdf/view": 1,       # $ anchor: .pdf not at end
        "/tmp123/x": 0,              # infix *
        "/tmp123/y": 1,
        "/dup/page": 1,              # tie -> Allow
        "/open": 1,
    }
    urls = spark.createDataFrame([(f"https://h{p}",) for p in cases], ["url"])
    got = {r.url: r.allowed for r in apply_robots(urls, robots).collect()}
    assert got == {f"https://h{p}": v for p, v in cases.items()}


def test_rfc9309_matches_handrolled_reference(spark):
    """Executable-spec check: the Catalyst matcher vs an independent
    ~10-line Python RFC 9309 longest-match reference, over every
    (rule-set, path) combination of a nasty grid."""
    import re as _re

    rules = [
        (False, "/a"), (True, "/a/b"), (False, "/a/b/c"),
        (False, "/*/x$"), (True, "/q"), (False, "/q"),
    ]
    body = "User-agent: *\n" + "\n".join(
        f"{'Allow' if a else 'Disallow'}: {p}" for a, p in rules
    )
    paths = ["/", "/a", "/a/b", "/a/b/c", "/a/b/cd", "/z/x", "/z/xy",
             "/q/r", "/ab"]

    def ref_allowed(path):
        best = (-1, True)
        for allow, rp in rules:
            anchored = rp.endswith("$")
            core = _re.escape(rp[:-1] if anchored else rp).replace("\\*", ".*")
            pat = "^" + core + ("$" if anchored else "")
            if _re.match(pat, path):
                ln = len(rp)
                if ln > best[0] or (ln == best[0] and allow):
                    best = (ln, allow)
        return int(best[1])

    robots = spark.createDataFrame([("h", body)], ["host", "robots_txt"])
    urls = spark.createDataFrame([(f"https://h{p}",) for p in paths], ["url"])
    got = {r.url: r.allowed for r in apply_robots(urls, robots).collect()}
    for p in paths:
        assert got[f"https://h{p}"] == ref_allowed(p), p


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


def test_sitemap_directive_discovery(spark):
    from codebased_spark.sources.robots import sitemap_urls

    robots = spark.createDataFrame(
        [
            ("a.org",
             "User-agent: *\nDisallow: /x/\n"
             "Sitemap: https://a.org/s1.xml\n"
             "  sitemap:   https://a.org/s2.xml  \n"
             "# Sitemap: https://a.org/commented.xml\n"
             "Sitemap: /relative.xml\n"),
            ("b.org", "User-agent: *\nDisallow:\n"),  # none declared
        ],
        ["host", "robots_txt"],
    )
    got = {(r.host, r.sitemap_url) for r in sitemap_urls(robots).collect()}
    assert got == {
        ("a.org", "https://a.org/s1.xml"),
        ("a.org", "https://a.org/s2.xml"),
    }
