"""Triple support & confidence scoring, and the takedown cascade.

A KG built from web text must rank each emitted (subj, pred, obj) by how
well the corpus supports it: a fact asserted once on one page is noise;
the same fact on many pages across many independent hosts is signal. The
reference stores per-entity/per-relationship occurrence metadata and
counts it in its stats surface (models.py entity/relationship rows;
endpoints.py count-by-type); here support becomes a first-class score
over the web-scale observation table.

Scale shape: ONE (subj, pred, obj)-keyed hash aggregation with map-side
partial combine over the observation rows — count-distinct on url/host
only (low-cardinality per triple), never a self-join. The takedown
cascade reuses the SAME single shuffle: before/after supports are
conditional aggregates in one pass, not two jobs, so compliance deletion
costs no more than the stats scan it replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_support(
    obs: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Per-triple support counters and a host-diversity confidence score.

    confidence = n_hosts / (n_hosts + 1): the two-independent-sources
    rule, monotone in host diversity, and an exact IEEE division of small
    integers on both engines — no transcendental (the PMI lesson,
    ADVICE r3) so the oracle hash can gate it exactly.
    """
    n_hosts = F.countDistinct(F.col(host_col))
    return (
        obs.groupBy(subj_col, pred_col, obj_col)
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.countDistinct(F.col(url_col)).alias("n_urls"),
            n_hosts.alias("n_hosts"),
        )
        .withColumn(
            "confidence",
            F.col("n_hosts").cast("double") / (F.col("n_hosts") + F.lit(1)),
        )
    )


def takedown_cascade(
    obs: DataFrame,
    takedown_hosts: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Compliance deletion with cascade accounting, in ONE aggregation.

    Given a (small, broadcast) list of hosts whose content must be
    removed, report every triple's support before and after the removal
    and its fate:
      'dropped'  — every supporting observation came from removed hosts
      'weakened' — some support removed, some survives
      'retained' — untouched.
    The removed-host flag is attached with a broadcast left join and the
    before/after counts are conditional count-distincts in the SAME
    groupBy — the cascade never re-scans or re-shuffles the observation
    table. 'dropped' rows are exactly the tombstones a production
    pipeline writes back to the graph (manifest path-removal analog,
    graph/manifest.py delete semantics).
    """
    td = F.broadcast(
        takedown_hosts.select(
            F.col(takedown_hosts.columns[0]).alias(host_col),
            F.lit(True).alias("_removed"),
        )
    )
    flagged = obs.join(td, host_col, "left")
    kept_url = F.when(F.col("_removed").isNull(), F.col(url_col))
    out = (
        flagged.groupBy(subj_col, pred_col, obj_col)
        .agg(
            F.countDistinct(F.col(url_col)).alias("n_urls_before"),
            F.countDistinct(kept_url).alias("n_urls_after"),
        )
        .withColumn(
            "status",
            F.when(F.col("n_urls_after") == 0, F.lit("dropped"))
            .when(
                F.col("n_urls_after") < F.col("n_urls_before"),
                F.lit("weakened"),
            )
            .otherwise(F.lit("retained")),
        )
    )
    return out


def weighted_triple_support(
    obs: DataFrame,
    host_weights: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    host_col: str = "host",
    default_weight: int = 1,
) -> DataFrame:
    """Knowledge-Vault-style fact fusion: support weighted by source
    reliability instead of raw host count.

    host_weights: (host, weight) — an integer reliability prior per
    host (e.g. the scaled kg_host_quality score). Each DISTINCT
    supporting host contributes its weight ONCE per triple (a spammy
    host repeating a fact on 10k pages gains nothing); hosts missing
    from the prior get `default_weight`. Returns per-triple n_hosts and
    the integer-exact `weighted_support` = sum of distinct-host weights
    — the fusion score a serving layer thresholds.

    Scale shape: one distinct over (triple, host) — the same key the
    plain support aggregate already shuffles on — then a broadcast join
    against the host-vocabulary-sized prior and one final triple-keyed
    sum with map-side combine. No new shuffle family vs triple_support.
    """
    hw = F.broadcast(
        host_weights.select(
            F.col(host_weights.columns[0]).alias(host_col),
            F.col(host_weights.columns[1]).alias("_w"),
        )
    )
    per_host = (
        obs.select(subj_col, pred_col, obj_col, host_col)
        .distinct()
        .join(hw, host_col, "left")
    )
    return per_host.groupBy(subj_col, pred_col, obj_col).agg(
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum(F.coalesce(F.col("_w"), F.lit(default_weight))).alias(
            "weighted_support"
        ),
    )
