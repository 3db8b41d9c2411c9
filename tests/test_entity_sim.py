"""Second-order entity similarity: entities that never co-occur but keep
identical company must surface with is_comention = false and jaccard 1."""

from __future__ import annotations

from pyspark.sql import functions as F

from codebased_spark.dataops import kg_entity_neighbors_sim
from codebased_spark.graph.queries import DOC_GAZETTEER


def test_registered_fixture_has_both_pair_kinds(spark):
    out = kg_entity_neighbors_sim(spark, "/root/testdata/sf0.001").collect()
    assert out, "fixture produced no similarity pairs"
    for r in out:
        denom = r.deg_a + r.deg_b - r.n_shared
        assert r.n_shared >= 1 and denom >= r.n_shared
        assert abs(r.jaccard - r.n_shared / denom) < 1e-9
    # the doc word-soup co-mentions almost everything with everything;
    # the structural claim worth pinning is consistency of the flag
    direct = {(r.ent_a, r.ent_b) for r in out if r.is_comention}
    assert direct  # at least some pairs do co-occur


def test_planted_second_order_pair(spark):
    # spark-entity and join-entity never share a doc, but both always
    # appear with merge/filter
    e1, e2 = "ent:concept:spark", "ent:op:join"
    w = {c: s for s, c, _ in DOC_GAZETTEER}
    rows = [
        (1, f"{w[e1]} {w['ent:op:merge']} {w['ent:op:filter']}"),
        (2, f"{w[e2]} {w['ent:op:merge']} {w['ent:op:filter']}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import codebased_spark.graph.queries as q

    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    orig = q._tokens
    q._tokens = lambda spark, sf_dir: toks
    try:
        out = {(r.ent_a, r.ent_b): r for r in kg_entity_neighbors_sim(
            spark, "unused"
        ).collect()}
    finally:
        q._tokens = orig
    pair = out[tuple(sorted((e1, e2)))]
    assert not pair.is_comention
    assert pair.n_shared == 2 and pair.deg_a == 2 and pair.deg_b == 2
    assert pair.jaccard == 1.0
