"""Ontology induction over the emitted triple stream: the schema graph
and extensional predicate-synonym discovery.

KG use: web extraction produces predicates nobody declared — lifted
table headers, definition-list keys, open-pattern infixes — so the
pipeline must INDUCE the schema it is filling. Two standard passes:

- **schema graph**: roll the instance graph up to its type level,
  (subj_type, pred, obj_type, n) — the census a curator reads to see
  what the extractors are actually asserting, and the input to
  domain/range constraint declarations (graph/constraints.py consumes
  what this module discovers). Reference analog: the reference's
  per-type node/edge stats surface (S12/A2) is this census without the
  typed endpoints; lifting counts to (type, pred, type) is the same
  aggregate with two vocabulary joins in front.
- **predicate synonyms**: PARIS-style extensional alignment — two
  predicates asserting (nearly) the same (subj, obj) pairs are one
  relation under two names ("population" from a table header,
  "population_of" from a definition list). Matching on shared instance
  pairs is the alignment signal that needs no lexical resource.

Scale shape (100 TB): both passes run on the DISTINCT triple/pair
projection, never raw observations. The synonym self-join is keyed by
(subj, obj) — fan-out per pair is (#preds asserting that exact pair),
bounded by the predicate vocabulary and in practice tiny (most pairs
are asserted under one predicate); the contained-flag arithmetic is
pure integers, no floating ratio in the gate. Type joins broadcast when
the typing relation is vocabulary-sized and shuffle otherwise — same
declarative plan, AQE decides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schema_graph(
    triples: DataFrame,
    types: DataFrame,
    untyped: str = "untyped",
) -> DataFrame:
    """Type-level rollup of the instance graph.

    triples: (subj, pred, obj); types: (id, cls) — an entity may carry
    several types, in which case the triple counts once per (subj_cls,
    obj_cls) combination, the standard multi-typing census semantics.
    Endpoints missing from the typing relation land in the `untyped`
    bucket instead of vanishing (lineage-first: extraction families
    whose arguments never got typed still show up in the census).
    """
    t = types.select(
        F.col(types.columns[0]).alias("_id"),
        F.col(types.columns[1]).alias("_cls"),
    ).distinct()
    s = t.select(F.col("_id").alias("subj"), F.col("_cls").alias("subj_type"))
    o = t.select(F.col("_id").alias("obj"), F.col("_cls").alias("obj_type"))
    return (
        triples.select("subj", "pred", "obj")
        .join(s, "subj", "left")
        .join(o, "obj", "left")
        .groupBy(
            F.coalesce("subj_type", F.lit(untyped)).alias("subj_type"),
            F.col("pred"),
            F.coalesce("obj_type", F.lit(untyped)).alias("obj_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def predicate_synonyms(
    triples: DataFrame,
    min_pct: int = 80,
    min_support: int = 2,
) -> DataFrame:
    """Extensional predicate alignment: for every predicate pair
    (pred_a < pred_b), how many DISTINCT (subj, obj) pairs they share,
    each predicate's own distinct-pair count, and an integer-exact
    synonym flag: shared * 100 >= min_pct * least(n_a, n_b), i.e. the
    smaller extension is >= min_pct% contained in the larger — the
    asymmetric-containment test PARIS uses, kept transcendental-free.
    Pairs sharing fewer than min_support instances are dropped (one
    coincidental row is not evidence).
    """
    pairs = triples.select("subj", "pred", "obj").distinct()
    sizes = pairs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_pairs"))
    a = pairs.alias("a")
    b = pairs.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.subj") == F.col("b.subj"))
            & (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.pred") < F.col("b.pred")),
        )
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_support)
    )
    na = sizes.select(F.col("pred").alias("pred_a"), F.col("n_pairs").alias("n_a"))
    nb = sizes.select(F.col("pred").alias("pred_b"), F.col("n_pairs").alias("n_b"))
    return (
        shared.join(na, "pred_a")
        .join(nb, "pred_b")
        .select(
            "pred_a",
            "pred_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared") * 100
                >= F.lit(min_pct) * F.least("n_a", "n_b")
            ).cast("int").alias("synonym"),
        )
    )
