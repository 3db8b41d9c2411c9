"""Dedup-cluster materialization: near-dup pairs → keep-one survivors.

Every dd_* operator emits *pairs*; what a training-data pipeline actually
consumes is *clusters* with a kept representative — the reference's own
dedupe always ends keep-one (extractor.py:702-710 first-seen-wins on the
content hash). This module composes any pair emitter (minhash, simhash,
ngram, embedding-LSH) with the connected-components fixpoint (link/cc.py)
into the table a 100-TB pipeline writes:

    (doc_id, cluster_id, is_survivor)

cluster_id = min doc_id of the near-dup component (deterministic, content-
independent of iteration order); survivor = the doc that IS the min —
"first-seen-wins" restated order-independently so task retries and
re-partitioning cannot flip the kept representative.

Scale shape: the CC input is the PAIR set (already bucketed/banded by the
upstream LSH — O(matches), not O(N^2)); singleton docs never enter the
fixpoint and are closed over with one left join against the corpus ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.link.cc import connected_components


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_id, is_survivor) for EVERY doc in `docs`.

    `pairs` is any near-dup pair table (doc_a, doc_b); docs appearing in no
    pair form their own singleton cluster and survive. Survivor selection
    is min-id-wins: deterministic and stable under re-runs (A8/E11
    discipline — content-derived, never first-task-wins).
    """
    comps = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        docs.select(F.col(id_col))
        .join(comps.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("cluster_id"))
    )


def surviving_docs(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The deduplicated corpus: one representative row per cluster."""
    keep = dedup_clusters(docs, pairs, id_col=id_col).where("is_survivor")
    return docs.join(keep.select(id_col), id_col, "left_semi")


def dedup_savings(
    docs: DataFrame,
    clusters: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group dedup audit: what keep-one dedup saves.

    Joins the corpus against a (doc_id, cluster_id, is_survivor) table
    (dedup_clusters output) and reports, per `group_col`:
    n_docs, n_dropped, tokens_total, tokens_dropped — the "dedup saved
    X% of lang-Y tokens" report every corpus-curation run publishes.
    Exact integers (token = whitespace-split non-empty), one equi-join
    on the id plus one map-side-combinable aggregate.
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    )
    j = docs.select(
        F.col(id_col), F.col(group_col), n_tokens.alias("_nt")
    ).join(clusters.select(id_col, "is_survivor"), id_col)
    # is_survivor arrives boolean from dedup_clusters, int from the
    # materialized registered table — normalize before the arithmetic
    dropped = (F.col("is_survivor").cast("int") == 0).cast("long")
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dropped).alias("n_dropped"),
        F.sum("_nt").alias("tokens_total"),
        F.sum(F.col("_nt") * dropped).alias("tokens_dropped"),
    )
