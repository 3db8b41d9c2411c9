"""DSIR importance weights (textops/dsir.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from codebased_spark.textops.dsir import dsir_weights


def _weights(spark, docs, target_ids, dim=64):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = dsir_weights(
        df, is_target=F.col("doc_id").isin(target_ids), dim=dim
    ).collect()
    return {r.doc_id: r for r in out}


def test_target_like_doc_outranks_background(spark):
    target = "the solar system has eight planets orbiting the sun"
    lookalike = "the solar system has eight planets and many moons"
    background = "buy cheap widgets now free shipping limited offer today"
    got = _weights(
        spark,
        [(1, target), (2, lookalike), (3, background)],
        target_ids=[1],
    )
    # both the exact-ratio gate column and the paper's log form agree
    assert got[2].score > got[3].score
    assert got[2].log_weight > got[3].log_weight


def test_masses_are_exact_integers(spark):
    got = _weights(spark, [(1, "a b c"), (2, "a b d")], target_ids=[1])
    # doc 1: bigrams {a b, b c}; doc 2: {a b, b d}. Raw bucket counts:
    # "a b"->2, "b c"->1, "b d"->1 (dim=64, no collisions among 3 grams
    # is not guaranteed — so just check the invariants, not exact sums)
    for r in got.values():
        assert r.n_feats == 2
        assert r.raw_mass >= r.target_mass  # ct <= cr bucket-wise
        assert math.isclose(r.score, r.target_mass / r.raw_mass)


def test_short_docs_dropped(spark):
    got = _weights(spark, [(1, "solo"), (2, "two words")], target_ids=[2])
    assert set(got) == {2}
