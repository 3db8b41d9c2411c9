"""Feature hashing (textops/feature_hash.py) — executable spec vs a
pure-Python md5 reference."""

from __future__ import annotations

import hashlib

from codebased_spark.textops.feature_hash import hashed_tf


def _bucket(tok, dim=1024):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def test_buckets_match_python_md5(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta  gamma")], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.bucket): r.tf for r in hashed_tf(docs).collect()
    }
    expect = {
        (1, _bucket("alpha")): 2,
        (1, _bucket("beta")): 1,
        (2, _bucket("beta")): 1,
        (2, _bucket("gamma")): 1,
    }
    assert got == expect
    assert all(0 <= b < 1024 for _, b in got)


def test_collisions_sum_tf(spark):
    # force a collision with dim=1: every token lands in bucket 0
    docs = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    rows = hashed_tf(docs, dim=1).collect()
    assert len(rows) == 1 and rows[0].bucket == 0 and rows[0].tf == 4
