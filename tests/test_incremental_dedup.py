"""Incremental batch-vs-index near-dup probe (dedup/incremental.py)."""

from __future__ import annotations

from codebased_spark.dedup.incremental import incremental_minhash_dupes


def _pairs(spark, new, old, **kw):
    nd = spark.createDataFrame(new, ["doc_id", "text"])
    od = spark.createDataFrame(old, ["doc_id", "text"])
    return {
        (r.doc_new, r.doc_old): r.jaccard
        for r in incremental_minhash_dupes(nd, od, **kw).collect()
    }


BODY = "the quick brown fox jumps over the lazy dog and then naps all day"


def test_batch_doc_duplicating_index_found(spark):
    got = _pairs(
        spark,
        new=[(100, BODY), (101, "completely different text about spark engines here")],
        old=[(1, BODY), (2, "unrelated corpus content entirely elsewhere today")],
        threshold=0.8,
    )
    assert got == {(100, 1): 1.0}


def test_batch_internal_dupes_out_of_scope(spark):
    # two identical NEW docs, nothing matching the index -> no pairs
    got = _pairs(
        spark,
        new=[(100, BODY), (101, BODY)],
        old=[(1, "index text that matches neither of the new arrivals")],
        threshold=0.8,
    )
    assert got == {}


def test_near_but_below_threshold_excluded(spark):
    tail = BODY + " with one extra clause appended to shift the jaccard"
    got = _pairs(spark, new=[(100, tail)], old=[(1, BODY)], threshold=0.95)
    assert got == {}
    got = _pairs(spark, new=[(100, tail)], old=[(1, BODY)], threshold=0.5)
    assert (100, 1) in got
