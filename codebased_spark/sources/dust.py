"""DUST rule learning — which URL query parameters don't change content.

Different URLs with Similar Text (Bar-Yossef et al., WWW'07): crawl logs
are full of url variants that differ only in tracking/session params
(utm_*, ref, sessionid). Learning per-host "safe to strip" parameter
rules collapses those variants BEFORE fetch/dedup — at web scale this is
the cheapest dedup there is, because it needs no content comparison at
apply time. Reference analog: the canonical-collapse family
(sources/canonical.py) — this learns the rules canonicalization applies.

Method: for every captured (url, text) and every query param p the url
carries, build the url's canonical key (path + sorted params) and its
probe key (path + sorted params minus p). Where the probe key exists as
another captured url on the same host, the pair is EVIDENCE for p:
content equal -> p was insignificant there. Aggregating per (host,
param): all pairs equal -> verdict 'strip'; any difference -> 'keep'.
Params with no observed pair produce no rule (no evidence ≠ safe).

Scale shape: map-only parse + explode (fan-out = params per url, a
small constant), one (host, key) equi-join of the exploded probes
against the distinct capture keys, one (host, param) aggregate. Base
keys that map to >1 distinct content hash (recrawl drift) are dropped
as ambiguous evidence rather than guessed at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_col(path, params_sorted):
    return F.when(F.size(params_sorted) == 0, path).otherwise(
        F.concat(path, F.lit("?"), F.array_join(params_sorted, "&"))
    )


def dust_param_rules(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, param, n_pairs, n_equal, verdict) — learned strip rules."""
    u = F.col(url_col)
    q = F.parse_url(u, F.lit("QUERY"))
    params = F.when(
        q.isNull() | (q == ""), F.array().cast("array<string>")
    ).otherwise(F.split(q, "&"))
    rows = pages.select(
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.array_sort(params).alias("params"),
        F.sha2(F.col(text_col), 256).alias("h"),
    ).distinct()

    # unambiguous capture content per canonical key
    base = (
        rows.select(
            "host", _key_col(F.col("path"), F.col("params")).alias("key"), "h"
        )
        .groupBy("host", "key")
        .agg(F.min("h").alias("h_base"), F.countDistinct("h").alias("_nh"))
        .where(F.col("_nh") == 1)
        .drop("_nh")
    )

    probes = (
        rows.select(
            "host", "path", "params", "h",
            F.explode("params").alias("kv"),
        )
        .select(
            "host", "h",
            F.split(F.col("kv"), "=").getItem(0).alias("param"),
            _key_col(
                F.col("path"),
                F.filter(
                    F.col("params"),
                    lambda x: F.split(x, "=").getItem(0)
                    != F.split(F.col("kv"), "=").getItem(0),
                ),
            ).alias("probe_key"),
        )
    )

    pairs = probes.join(
        base,
        (probes.host == base.host) & (probes.probe_key == base.key),
    ).select(probes.host.alias("host"), "param", (F.col("h") == F.col("h_base")).alias("eq"))

    agg = pairs.groupBy("host", "param").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("eq").cast("long")).alias("n_equal"),
    )
    verdict = F.when(F.col("n_equal") == F.col("n_pairs"), F.lit("strip")).otherwise(
        F.lit("keep")
    )
    return agg.select("host", "param", "n_pairs", "n_equal", verdict.alias("verdict"))
