"""KG integrity constraints: SHACL/OWL-lite violation audit over triples.

KG use: after extraction + linking, a production pipeline gates the
materialized graph on declared schema constraints before serving —
functional predicates (at most one value per subject: birth date,
canonical lang), referential integrity (entity-valued objects must
resolve to a node), and disjoint classes (nothing is both Article and
Spam). Violations are EMITTED, not silently dropped: the audit table is
what a curator triages, the same lineage-first convention as the
manifest counters. Reference analog: the reference validates edges
against the known-node set before insert and skips+counts the rest
(graph_store analog of J7's external-stub anti-join, service.py edge
guard); this module lifts that single check to a declarative constraint
battery with typed violation rows.

Scale shape (100 TB): every check is one narrow aggregate or anti-join
over the triple stream keyed by (subj, pred) — map-side combinable, no
corpus-sized collect, no cross join. The node set used for referential
checks is the graph's entity vocabulary (orders of magnitude smaller
than the page corpus); Spark broadcasts it when it fits and falls back
to a shuffled anti-join when it does not — both expressed by the same
declarative plan, chosen by AQE at runtime.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def functional_violations(
    triples: DataFrame, functional_preds: Sequence[str]
) -> DataFrame:
    """Subjects asserting >1 DISTINCT object for a declared-functional
    predicate. One (subj, pred)-keyed aggregate; duplicate assertions of
    the SAME value are fine (re-extraction is idempotent)."""
    return (
        triples.where(F.col("pred").isin(list(functional_preds)))
        .groupBy("subj", "pred")
        .agg(F.countDistinct("obj").alias("n"))
        .where(F.col("n") > 1)
        .select(
            "subj",
            "pred",
            F.lit("functional").alias("violation"),
            "n",
        )
    )


def dangling_objects(
    triples: DataFrame, nodes: DataFrame, entity_preds: Sequence[str]
) -> DataFrame:
    """Referential integrity: objects of entity-valued predicates that
    do not resolve to any known node id. Anti-join against the entity
    vocabulary; n = how many assertions point at the missing node."""
    known = nodes.select(F.col(nodes.columns[0]).alias("obj")).distinct()
    return (
        triples.where(F.col("pred").isin(list(entity_preds)))
        .join(known, "obj", "left_anti")
        .groupBy(F.col("obj").alias("subj"), F.col("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "subj", "pred", F.lit("dangling").alias("violation"), "n"
        )
    )


def disjoint_type_violations(
    type_triples: DataFrame, disjoint_pairs: Sequence[tuple[str, str]]
) -> DataFrame:
    """Entities typed with two declared-disjoint classes. The type
    relation is vocabulary-sized; the pair list is a literal broadcast.
    Emits one row per (entity, clash) with the offending pair in pred."""
    t = type_triples.select("subj", F.col("obj").alias("cls")).distinct()
    spark = type_triples.sparkSession
    pairs = F.broadcast(
        spark.createDataFrame(
            [(a, b) for a, b in disjoint_pairs], ["cls_a", "cls_b"]
        )
    )
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("a.subj") == F.col("b.subj"))
        .join(
            pairs,
            (F.col("a.cls") == F.col("cls_a"))
            & (F.col("b.cls") == F.col("cls_b")),
        )
        .select(
            F.col("a.subj").alias("subj"),
            F.concat(
                F.lit("is_a:"), F.col("cls_a"), F.lit("|"), F.col("cls_b")
            ).alias("pred"),
            F.lit("disjoint").alias("violation"),
            F.lit(1).cast("long").alias("n"),
        )
        .distinct()
    )


def check_constraints(
    triples: DataFrame,
    *,
    functional_preds: Sequence[str] = (),
    entity_preds: Sequence[str] = (),
    nodes: DataFrame | None = None,
    type_pred: str = "is_a",
    disjoint_pairs: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Run the declared constraint battery; union of typed violation
    rows (subj, pred, violation, n). Each check is independent and
    lazily planned — Catalyst shares the triples scan across them."""
    parts = []
    if functional_preds:
        parts.append(functional_violations(triples, functional_preds))
    if entity_preds and nodes is not None:
        parts.append(dangling_objects(triples, nodes, entity_preds))
    if disjoint_pairs:
        parts.append(
            disjoint_type_violations(
                triples.where(F.col("pred") == type_pred), disjoint_pairs
            )
        )
    if not parts:
        raise ValueError("no constraints declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
