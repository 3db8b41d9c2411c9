"""Exact deduplication: content-hash groupBy.

Reference analog: first-seen-wins entity dedupe on content-hash ids
(extractor.py:702-710, base.py:193-209) — here applied corpus-wide.

Scale notes: sha2 is computed map-side; the groupBy shuffles only
(hash, doc_id) pairs — two narrow columns, not the text. At 10^12 rows the
shuffle is ~32 bytes/row of key+id; AQE coalesces the near-empty partitions
that full-width dedup would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor row per distinct text: (doc_id, text_sha256, group_size).

    Survivor = min(doc_id) in the hash group (deterministic keep-first).
    """
    return (
        docs.select(
            F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha256")
        )
        .groupBy("text_sha256")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select(id_col, "text_sha256", "group_size")
    )


def mirror_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-host mirror detection: content hashes served by >= 2 distinct
    hosts — the crawl signal for mirrors, scrapers, and CDN clones, which a
    curation pipeline collapses BEFORE host-level statistics (a mirrored
    site would otherwise double-count in domain PageRank, per-host
    boilerplate df, and crawl-budget allocation).

    One (hash)-keyed aggregation; every aggregate is constant-size
    (counts, min, max) — deliberately NO collect_set(host): a viral
    boilerplate page can live on millions of hosts and an unbounded
    host-list buffer is exactly the skew hazard the rest of the repo
    avoids. first/last host (min/max) are the bounded witnesses; callers
    wanting the full host list join back on text_sha256.
    """
    hashed = docs.select(
        F.sha2(F.col(text_col), 256).alias("text_sha256"),
        F.col(host_col).alias("host"),
        F.col(id_col),
    )
    return (
        hashed.groupBy("text_sha256")
        .agg(
            F.countDistinct("host").alias("n_hosts"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("first_doc"),
            F.min("host").alias("first_host"),
            F.max("host").alias("last_host"),
        )
        .where(F.col("n_hosts") >= 2)
    )


def exact_duplicate_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, dup_of) rows for every non-survivor duplicate."""
    hashed = docs.select(
        F.col(id_col), F.sha2(F.col(text_col), 256).alias("text_sha256")
    )
    keep = hashed.groupBy("text_sha256").agg(F.min(id_col).alias("dup_of"))
    return (
        hashed.join(keep, "text_sha256")
        .where(F.col(id_col) != F.col("dup_of"))
        .select(id_col, "dup_of")
    )
