"""AMIE-style horn-rule mining over the typed triple store.

A knowledge-graph construction pipeline that emits (subj, pred, obj)
triples wants to VALIDATE and ENRICH them: mine length-2 horn rules
p(x,y) ∧ q(y,z) ⇒ r(x,z), score each by support (# body instantiations
whose head triple exists) and confidence (support / body size), and use
the high-confidence rules for link prediction / consistency checking
(Galárraga et al., AMIE, WWW'13 — public). CodeBased's analog is the
typed relationship table its queries traverse (IMPORTS→CONTAINS chains);
rule mining is the statistical layer a web-scale KG adds on top.

100-TB shape: the body is ONE self-join of the triple table on
(p.obj = q.subj) — the join key is a node id, so the shuffle is the
node-degree distribution (salt hot nodes exactly as the pipeline's
entity-linking stage does); the head check is a second keyed join on
(x, z); everything after is a predicate-pair aggregate whose cardinality
is |preds|² × |preds| — tiny, broadcastable. No driver-side iteration:
rule extraction is three joins + two aggregates regardless of corpus
size. Confidence is emitted as exact integer basis points
(support*10000 div body_size) so the value gate stays bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def typed_doc_triples(docs: DataFrame, n: int | None = None) -> DataFrame:
    """Deterministic typed triples over documents — the rule-mining
    fixture. Successor-style relations plant rules with known exact
    confidence: follows∘follows ⇒ skip2 holds ALWAYS (conf 10000 bp);
    follows∘skip2 ⇒ skip3 holds only for even x (conf ~5000 bp); `near`
    is data-dependent (n_chars) noise. Pure column arithmetic so the
    DuckDB oracle derives the identical store."""
    if n is None:
        n = docs.count()
    d = docs.select("doc_id", "n_chars")
    follows = d.select(
        F.lit("follows").alias("pred"),
        F.col("doc_id").alias("subj"),
        ((F.col("doc_id") + 1) % n).alias("obj"),
    )
    skip2 = d.select(
        F.lit("skip2").alias("pred"),
        F.col("doc_id").alias("subj"),
        ((F.col("doc_id") + 2) % n).alias("obj"),
    )
    skip3 = d.where(F.col("doc_id") % 2 == 0).select(
        F.lit("skip3").alias("pred"),
        F.col("doc_id").alias("subj"),
        ((F.col("doc_id") + 3) % n).alias("obj"),
    )
    near = d.select(
        F.lit("near").alias("pred"),
        F.col("doc_id").alias("subj"),
        ((F.col("doc_id") + F.col("n_chars") % 5) % n).alias("obj"),
    )
    return follows.unionByName(skip2).unionByName(skip3).unionByName(near)


def mine_horn_rules(triples: DataFrame, min_support: int = 1) -> DataFrame:
    """Mine p(x,y) ∧ q(y,z) ⇒ r(x,z) rules from a (pred, subj, obj)
    store. Returns (body_p, body_q, head_pred, support, body_size,
    conf_bp) — all integers, conf_bp = support*10000 div body_size.

    body instantiations are DISTINCT (x, z) pairs per predicate pair
    (AMIE counts fact pairs, not derivation paths); support counts those
    pairs whose head triple exists with predicate r."""
    t = triples
    body = (
        t.alias("p")
        .join(t.alias("q"), F.col("p.obj") == F.col("q.subj"))
        .select(
            F.col("p.pred").alias("body_p"),
            F.col("q.pred").alias("body_q"),
            F.col("p.subj").alias("x"),
            F.col("q.obj").alias("z"),
        )
        .distinct()
    )
    bsz = body.groupBy("body_p", "body_q").agg(
        F.count(F.lit(1)).alias("body_size")
    )
    heads = t.select(
        F.col("subj").alias("x"),
        F.col("obj").alias("z"),
        F.col("pred").alias("head_pred"),
    )
    sup = (
        body.join(heads, ["x", "z"])
        .groupBy("body_p", "body_q", "head_pred")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    return sup.join(bsz, ["body_p", "body_q"]).select(
        "body_p",
        "body_q",
        "head_pred",
        "support",
        "body_size",
        F.expr("support * 10000 div body_size").alias("conf_bp"),
    )


def kg_rule_mining(spark: SparkSession, docs: DataFrame) -> DataFrame:
    return mine_horn_rules(typed_doc_triples(docs))
