"""URL manipulation columns — host/path/domain extraction + normalization.

Reference analog (§2.7): the path-manipulation helpers (relative-path
resolution, prefix stripping) the extractors use on file paths; for web
pages the equivalent unit is the URL. All pure JVM: `parse_url` is a
built-in Catalyst expression, the rest is regexp/split/slice — zero
Python, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_col(url: Column) -> Column:
    """NULL for malformed urls (try_parse_url) — a crawl always contains
    garbage urls and one bad row must not fail the job."""
    return F.try_parse_url(url, F.lit("HOST"))


def path_col(url: Column) -> Column:
    return F.try_parse_url(url, F.lit("PATH"))


def registrable_domain_col(url: Column) -> Column:
    """Last two host labels ('news.example.com' -> 'example.com').

    A full public-suffix list lookup is a broadcast-join against the PSL
    table in production; two labels is the deterministic stand-in here.
    """
    parts = F.split(host_col(url), "\\.")
    return F.array_join(
        F.slice(parts, F.greatest(F.size(parts) - 1, F.lit(1)), 2), "."
    )


def normalize_url_col(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment dropped, trailing slash on bare host."""
    no_frag = F.regexp_replace(url, "#.*$", "")
    # lowercase scheme://host but not the path
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, "^([a-zA-Z]+://[^/]*)", 1)),
        F.regexp_replace(no_frag, "^[a-zA-Z]+://[^/]*", ""),
    )
    no_port = F.regexp_replace(lowered, "^(https://[^/:]+):443(?=/|$)", "$1")
    no_port = F.regexp_replace(no_port, "^(http://[^/:]+):80(?=/|$)", "$1")
    return F.when(
        no_port.rlike("^[a-z]+://[^/]+$"), F.concat(no_port, F.lit("/"))
    ).otherwise(no_port)


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    u = F.col(url_col)
    return df.withColumns(
        {
            "host": host_col(u),
            "path": path_col(u),
            "domain": registrable_domain_col(u),
            "url_norm": normalize_url_col(u),
        }
    )
