"""robots.txt compliance — parse per-host rules, filter the url table.

A crawl-derived corpus must be filterable by the politeness rules the
crawler honored (and re-filterable when rules change — compliance audits
run over stored corpora, not live crawls). Reference analog: the glob
exclusion filter (S2, base.py:158-191) — path deny rules applied before
processing, WILDCARD-capable (fnmatch) — with the rules coming from each
host's robots.txt.

Parsing: robots.txt is a STATEFUL line format (rules belong to the
preceding User-agent group), which fits a higher-order F.aggregate scan
over the split lines — the accumulator carries (inside-a-`*`-group,
rules-so-far), entirely inside Catalyst, no Python.

Matching implements RFC 9309 (was prefix-only Disallow before r4):

- both `Allow:` and `Disallow:` rules are honored
- `*` in a rule path matches any character sequence; a trailing `$`
  anchors the rule at end-of-path
- the MOST SPECIFIC matching rule wins (longest rule path in octets,
  wildcards counted as written); on a length tie the least restrictive
  (Allow) wins
- no matching rule => allowed (the spec's implicit-allow default)

Documented remaining subset: only the `User-agent: *` group is honored
(this engine audits generic-crawler corpora; per-UA selection is the
same group scan keyed by a UA column).

Scale shape: rules aggregate to one array per host (robots files are
KB-sized) and rule->regex compilation happens ONCE per host row, not per
url; the url table joins host-to-host (url-table-sized shuffle on the
host key — hot hosts are an AQE skew case) and matching is a map-side
F.aggregate over the per-host rule array, with a startswith fast path
for the (overwhelmingly common) wildcard-free rules so only rules that
actually carry `*`/`$` pay the regex engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codebased_spark.extract.urlops import host_col, path_col

_RULES_T = "array<struct<allow:boolean,path:string>>"
_BEST_T = "struct<len:int,allow:boolean>"

# java-regex metacharacters to neutralize in rule paths (backslash FIRST);
# '*' is escaped with the rest, then the escaped form is rewritten to .*
_REGEX_META = ["\\", ".", "[", "]", "{", "}", "(", ")", "+", "?", "^", "$", "|", "*"]


def rep_rules_col(robots_col: Column) -> Column:
    """array<struct<allow,path>> of Allow/Disallow rules in the
    `User-agent: *` group(s), in file order. Empty-value Disallow lines
    (allow-all) and empty Allow lines contribute nothing."""
    lines = F.split(robots_col, "\r?\n")
    acc0 = F.struct(
        F.lit(False).alias("in_star"),
        F.lit(True).alias("group_open"),
        F.array().cast(_RULES_T).alias("rules"),
    )

    def step(acc, line):
        clean = F.trim(F.regexp_replace(line, "#.*$", ""))
        low = F.lower(clean)
        is_ua = low.startswith("user-agent:")
        ua = F.trim(F.substring_index(clean, ":", -1))
        is_dis = low.startswith("disallow:")
        is_alw = low.startswith("allow:")
        rule = F.trim(F.regexp_replace(clean, "(?i)^(dis)?allow:", ""))
        # a UA line OPENS a group (or extends one if the previous line was
        # also a UA line); any rule line closes the group header
        in_star = (
            F.when(is_ua & acc["group_open"], acc["in_star"] | (ua == "*"))
            .when(is_ua, ua == "*")
            .otherwise(acc["in_star"])
        )
        group_open = F.when(is_ua, F.lit(True)).otherwise(F.lit(False))
        add = (is_dis | is_alw) & acc["in_star"] & (rule != "")
        entry = F.struct(is_alw.alias("allow"), rule.alias("path"))
        rules = F.when(add, F.array_append(acc["rules"], entry)).otherwise(
            acc["rules"]
        )
        return F.struct(
            in_star.alias("in_star"),
            group_open.alias("group_open"),
            rules.alias("rules"),
        )

    return F.aggregate(lines, acc0, step)["rules"]


def disallow_rules_col(robots_col: Column) -> Column:
    """array<string> of the Disallow rule paths only — the pre-r4 surface,
    kept for prefix-audit callers."""
    return F.transform(
        F.filter(rep_rules_col(robots_col), lambda r: ~r["allow"]),
        lambda r: r["path"],
    )


def _rule_regex(path: Column) -> Column:
    """Java regex for one rule path: `*` -> `.*`, trailing `$` -> anchor,
    everything else literal."""
    anchored = path.endswith("$")
    body = F.when(anchored, F.substr(path, F.lit(1), F.length(path) - 1)).otherwise(path)
    esc = body
    for ch in _REGEX_META:
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    core = F.replace(esc, F.lit("\\*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), core, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def _compiled_rules(rules: Column) -> Column:
    """Per-rule match metadata, computed once per HOST row: specificity
    (octet length of the rule as written, RFC 9309 longest-match), a
    wildcard flag, and the regex only wildcard rules need."""
    return F.transform(
        rules,
        lambda r: F.struct(
            r["allow"].alias("allow"),
            r["path"].alias("path"),
            F.length(r["path"]).alias("len"),
            (r["path"].contains("*") | r["path"].endswith("$")).alias("wild"),
            _rule_regex(r["path"]).alias("regex"),
        ),
    )


def host_rules(robots: DataFrame, host: str = "host", body: str = "robots_txt") -> DataFrame:
    """(host, rules array<struct<allow,path,len,wild,regex>>) per host."""
    return robots.select(
        F.col(host), _compiled_rules(rep_rules_col(F.col(body))).alias("rules")
    )


def apply_robots(
    urls: DataFrame, robots: DataFrame, url_col: str = "url"
) -> DataFrame:
    """urls + `allowed` flag (1/0). Hosts with no robots row allow all.

    RFC 9309 evaluation: among matching rules the longest rule path wins;
    Allow wins length ties; no match => allowed."""
    rules = host_rules(robots)
    u = urls.withColumn("_host", host_col(F.col(url_col))).withColumn(
        "_path", path_col(F.col(url_col))
    )
    joined = u.join(rules.withColumnRenamed("host", "_host"), "_host", "left")
    path = F.col("_path")
    best0 = F.named_struct(
        F.lit("len"), F.lit(-1), F.lit("allow"), F.lit(True)
    ).cast(_BEST_T)

    def fold(acc, r):
        matched = F.when(r["wild"], F.rlike(path, r["regex"])).otherwise(
            path.startswith(r["path"])
        )
        better = matched & (
            (r["len"] > acc["len"]) | ((r["len"] == acc["len"]) & r["allow"])
        )
        return F.when(
            better,
            F.named_struct(
                F.lit("len"), r["len"], F.lit("allow"), r["allow"]
            ).cast(_BEST_T),
        ).otherwise(acc)

    best = F.aggregate(
        F.coalesce(F.col("rules"), F.array().cast(
            "array<struct<allow:boolean,path:string,len:int,wild:boolean,regex:string>>"
        )),
        best0,
        fold,
    )
    return joined.withColumn("allowed", best["allow"].cast("int")).drop(
        "_host", "_path", "rules"
    )


def crawl_delay_col(robots_col: Column) -> Column:
    """First `Crawl-delay: N` directive in the robots body (integer
    seconds), NULL when absent. Deliberately group-agnostic — the
    directive is non-standard (absent from RFC 9309) and major crawlers
    treat it as a host-global hint; the full UA-group machinery above is
    for the normative Allow/Disallow rules."""
    d = F.regexp_extract(robots_col, r"(?i)crawl-delay:\s*([0-9]+)", 1)
    return F.when(d != "", d.cast("int"))


def sitemap_urls(robots: DataFrame, host: str = "host", body: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url): every `Sitemap: <url>` directive — the
    discovery bootstrap (robots.txt is the one file a crawler always
    fetches first, and it declares where the sitemaps live). Directive
    is UA-group-independent per the sitemaps.org protocol; matching is
    case-insensitive and comment lines are ignored."""
    lines = F.regexp_extract_all(
        F.regexp_replace(F.col(body), r"(?m)#.*$", ""),
        F.lit(r"(?im)^\s*sitemap:\s*(\S+)\s*$"),
        1,
    )
    return robots.select(
        F.col(host), F.explode(lines).alias("sitemap_url")
    ).where(F.col("sitemap_url").rlike("(?i)^https?://"))
