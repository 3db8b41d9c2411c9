"""robots.txt compliance — parse per-host rules, filter the url table.

A crawl-derived corpus must be filterable by the politeness rules the
crawler honored (and re-filterable when rules change — compliance audits
run over stored corpora, not live crawls). Reference analog: the glob
exclusion filter (S2, base.py:158-191) — path-prefix deny rules applied
before processing — with the rules coming from each host's robots.txt.

Parsing: robots.txt is a STATEFUL line format (rules belong to the
preceding User-agent group), which fits a higher-order F.aggregate scan
over the split lines — the accumulator carries (inside-a-`*`-group,
rules-so-far), entirely inside Catalyst, no Python.

Documented simplification (the common-crawler subset): only the
`User-agent: *` group is honored, rule matching is prefix-only (no `*`
wildcards or `$` anchors inside rule paths), and `Allow:` overrides are
not implemented — a Disallow prefix blocks. This matches what the
original REP spec guaranteed; full Google-extension matching drops in as
a richer predicate in the same join.

Scale shape: rules aggregate to one array per host (robots files are
KB-sized); the url table joins host-to-host (url-table-sized shuffle on
the host key — hot hosts are an AQE skew case) and the prefix test is a
map-side F.exists over the per-host rule array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import host_col, path_col


def disallow_rules_col(robots_col: Column) -> Column:
    """array<string> of Disallow path-prefixes in the `User-agent: *`
    group(s). Empty-value Disallow lines (allow-all) contribute nothing."""
    lines = F.split(robots_col, "\r?\n")
    acc0 = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(True).alias("group_open"),
        F.array().cast("array<string>").alias("rules"),
    )

    def step(acc, line):
        clean = F.trim(F.regexp_replace(line, "#.*$", ""))
        low = F.lower(clean)
        is_ua = low.startswith("user-agent:")
        ua = F.trim(F.substring_index(clean, ":", -1))
        is_dis = low.startswith("disallow:")
        rule = F.trim(F.regexp_replace(clean, "(?i)^disallow:", ""))
        # a UA line OPENS a group (or extends one if the previous line was
        # also a UA line); any rule line closes the group header
        in_star = (
            F.when(is_ua & acc["group_open"], acc["in_star"] | (ua == "*"))
            .when(is_ua, ua == "*")
            .otherwise(acc["in_star"])
        )
        group_open = F.when(is_ua, F.lit(True)).otherwise(F.lit(False))
        add = is_dis & acc["in_star"] & (rule != "")
        rules = F.when(add, F.array_append(acc["rules"], rule)).otherwise(
            acc["rules"]
        )
        return F.struct(
            in_star.alias("in_star"),
            group_open.alias("group_open"),
            rules.alias("rules"),
        )

    return F.aggregate(lines, acc0, step)["rules"]


def host_rules(robots: DataFrame, host: str = "host", body: str = "robots_txt") -> DataFrame:
    """(host, rules array<string>) — one row per host."""
    return robots.select(
        F.col(host), disallow_rules_col(F.col(body)).alias("rules")
    )


def apply_robots(
    urls: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """urls + `allowed` flag (1/0). Hosts with no robots row allow all."""
    rules = host_rules(robots)
    u = urls.withColumn("_host", host_col(F.col(url_col))).withColumn(
        "_path", path_col(F.col(url_col))
    )
    joined = u.join(rules.withColumnRenamed("host", "_host"), "_host", "left")
    blocked = F.exists(
        F.coalesce(F.col("rules"), F.array().cast("array<string>")),
        lambda r: F.col("_path").startswith(r),
    )
    return joined.withColumn("allowed", (~blocked).cast("int")).drop(
        "_host", "_path", "rules"
    )
