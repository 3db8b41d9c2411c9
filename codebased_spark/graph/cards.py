"""Entity cards: the per-entity serving profile a KG front-end renders.

KG use: once mentions are linked and canonicalized, the thing a user
(or a downstream ranking model) actually consumes is a CARD per entity
— its type, how often and in how many documents it is attested, the
surface forms the corpus uses for it, its most-representative document,
and how connected it is. Reference analog: the reference's node detail
endpoint assembles exactly this join (entity row + mention count +
neighbor count) per request (api/endpoints.py node-detail handler);
here it is materialized for ALL entities in one pass, which is the
batch-serving shape — a request-time point lookup against a
pre-computed card table instead of a per-request join.

Scale shape (100 TB): the mention stream is corpus-sized but every
aggregate below is keyed by canonical_id (vocabulary-sized output) with
map-side combine; the argmax document is a window over (entity, doc)
mention counts — already aggregated, so the window input is
|vocabulary| x avg-doc-frequency, not the corpus; the neighbor count
joins the DISTINCT (doc, entity) projection with itself on doc_id,
bounded by sum over docs of (entities-per-doc)^2 — the same guarded
shape as co-citation (extract/anchors.py max_out cap) if a pathological
doc mentions everything; pass max_entities_per_doc to cap it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_cards(
    mentions: DataFrame, max_entities_per_doc: int | None = None
) -> DataFrame:
    """Materialize one card per entity from a mention stream with
    columns (doc_id, surface_form, canonical_id, entity_type).

    Returns (canonical_id, entity_type, n_mentions, n_docs, aliases,
    top_doc, n_neighbors) — aliases is the sorted comma-joined distinct
    surface set, top_doc the doc with most mentions of the entity
    (smallest doc_id on ties), n_neighbors the count of distinct other
    entities sharing at least one doc.
    """
    m = mentions.select(
        "doc_id", "surface_form", "canonical_id", "entity_type"
    )

    base = m.groupBy("canonical_id").agg(
        F.min("entity_type").alias("entity_type"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.array_join(
            F.array_sort(F.collect_set("surface_form")), ","
        ).alias("aliases"),
    )

    per_doc = m.groupBy("canonical_id", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.desc("c"), F.asc("doc_id")
    )
    top_doc = (
        per_doc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("canonical_id", F.col("doc_id").alias("top_doc"))
    )

    de = m.select("doc_id", "canonical_id").distinct()
    if max_entities_per_doc is not None:
        wd = Window.partitionBy("doc_id").orderBy("canonical_id")
        de = (
            de.withColumn("_r", F.row_number().over(wd))
            .where(F.col("_r") <= max_entities_per_doc)
            .drop("_r")
        )
    a = de.alias("a")
    b = de.alias("b")
    neighbors = (
        a.join(b, "doc_id")
        .where(F.col("a.canonical_id") != F.col("b.canonical_id"))
        .groupBy(F.col("a.canonical_id").alias("canonical_id"))
        .agg(F.countDistinct(F.col("b.canonical_id")).alias("n_neighbors"))
    )

    return (
        base.join(top_doc, "canonical_id", "left")
        .join(neighbors, "canonical_id", "left")
        .select(
            "canonical_id",
            "entity_type",
            "n_mentions",
            "n_docs",
            "aliases",
            "top_doc",
            F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        )
    )
