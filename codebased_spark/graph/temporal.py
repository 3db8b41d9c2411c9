"""Temporal fact tracking over recrawl captures.

A web corpus observes each url many times; facts (triples, mentions)
appear, persist, and VANISH across captures — "X works for Y" stops
being stated after X leaves. The reference's incremental updater keeps
only the latest state per path (incremental.py:159-274); a temporal KG
additionally wants each fact's observation window, and whether the fact
is still asserted by the url's LATEST capture (retraction signal).

fact_lifespans turns an observation table
(url, capture_ts, <fact columns...>) into one row per (url, fact):
first_seen / last_seen / n_obs / is_current.

Scale shape: two aggregations, both map-side combined —
(url) -> latest capture ts, and (url, fact) -> window — then ONE
url-keyed join between two url-partitioned aggregates. Nothing is
corpus-global, nothing collects; a url with 10^4 captures contributes
one row per distinct fact, not per capture.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fact_lifespans(
    obs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    fact_cols: Sequence[str] = ("entity_id",),
    captures: DataFrame | None = None,
) -> DataFrame:
    """One row per (url, fact): observation window + currency flag.

    `obs` holds one row per (capture, fact) observation; duplicate
    observations inside one capture are fine (n_obs counts distinct
    capture timestamps). is_current = 1 iff the fact appears in the
    url's latest capture — last_seen equals the latest capture ts.

    `captures` (url, ts) should be the FULL capture table: the per-url
    latest timestamp must come from every capture, not just captures
    that produced observations — a url whose newest capture asserts NO
    facts has retracted them all, and deriving 'latest' from obs misses
    exactly that retraction-by-silence signal (ADVICE r3). When omitted,
    latest falls back to obs (correct only if every capture is
    guaranteed to yield at least one observation row)."""
    latest_src = captures.select(url_col, ts_col) if captures is not None else obs
    latest = latest_src.groupBy(url_col).agg(F.max(ts_col).alias("_latest_ts"))
    per_fact = obs.groupBy(url_col, *fact_cols).agg(
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.countDistinct(ts_col).alias("n_obs"),
    )
    return (
        per_fact.join(latest, url_col)
        .withColumn(
            "is_current",
            (F.col("last_seen") == F.col("_latest_ts")).cast("int"),
        )
        .drop("_latest_ts")
    )


def snapshot_asof(
    obs: DataFrame,
    asof_ts,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    fact_cols: Sequence[str] = ("entity_id",),
    captures: DataFrame | None = None,
) -> DataFrame:
    """The KG as it stood at `asof_ts`: one row per (url, fact) asserted
    by the url's NEWEST capture at or before that time.

    As-of semantics, not observed-window semantics: the state at T is
    the content of the latest capture <= T — a fact observed earlier but
    absent from that capture had already been retracted by T, and a url
    whose latest capture <= T asserts nothing contributes nothing (the
    same retraction-by-silence rule as fact_lifespans, which is why
    `captures` should again be the FULL capture table). The time-travel
    query an auditable KG serves: "what did we believe on date X?".

    Scale shape: one filtered (url -> max ts) aggregate and one
    (url, ts)-keyed equi-join back to the observation table; nothing
    corpus-global."""
    latest_src = captures.select(url_col, ts_col) if captures is not None else obs
    latest = (
        latest_src.where(F.col(ts_col) <= F.lit(asof_ts))
        .groupBy(url_col)
        .agg(F.max(ts_col).alias(ts_col))
    )
    return (
        obs.join(latest, [url_col, ts_col])
        .select(url_col, *fact_cols)
        .distinct()
    )


def fact_churn(
    prev_facts: DataFrame,
    curr_facts: DataFrame,
    keys: Sequence[str] = ("url", "entity_id"),
) -> DataFrame:
    """Triple-level diff between two KG snapshots: one row per fact key
    with status 'added' (curr only), 'retained' (both), or 'vanished'
    (prev only) — the update worklist a graph store applies when a new
    crawl snapshot lands (the fact-granular refinement of the url-level
    snapshot delta in sources/delta.py).

    Inputs are fact tables keyed by `keys` (duplicates fine — presence
    is what matters). One distinct per side plus one full outer join on
    the fact key; nothing corpus-global."""
    p = prev_facts.select(*keys).distinct().withColumn("_in_prev", F.lit(1))
    c = curr_facts.select(*keys).distinct().withColumn("_in_curr", F.lit(1))
    joined = p.join(c, list(keys), "full_outer")
    status = (
        F.when(F.col("_in_prev").isNull(), F.lit("added"))
        .when(F.col("_in_curr").isNull(), F.lit("vanished"))
        .otherwise(F.lit("retained"))
    )
    return joined.select(*keys, status.alias("status"))
