"""Per-language quality bucketing (textops/buckets.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from codebased_spark.textops.buckets import (
    assign_quality_buckets,
    quality_bucket_thresholds,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "quality_score"])


def test_thirds_with_distinct_scores(spark):
    # 9 docs, distinct scores 0.1..0.9 -> exact thirds
    rows = [(i, "en", i / 10.0) for i in range(1, 10)]
    out = {
        r.doc_id: r.bucket
        for r in assign_quality_buckets(_scored(spark, rows)).collect()
    }
    assert {d for d, b in out.items() if b == "head"} == {7, 8, 9}
    assert {d for d, b in out.items() if b == "middle"} == {4, 5, 6}
    assert {d for d, b in out.items() if b == "tail"} == {1, 2, 3}


def test_ties_share_the_higher_bucket(spark):
    # 6 docs all score 0.5 -> one histogram row; everyone is head
    rows = [(i, "en", 0.5) for i in range(6)]
    out = assign_quality_buckets(_scored(spark, rows))
    assert {r.bucket for r in out.collect()} == {"head"}


def test_per_language_cuts_are_independent(spark):
    rows = [(i, "en", i / 10.0) for i in range(1, 10)] + [
        (100 + i, "de", 0.9 + i / 100.0) for i in range(1, 10)
    ]
    cuts = {
        r.lang: (r.t_head, r.t_mid, r.n_docs)
        for r in quality_bucket_thresholds(_scored(spark, rows)).collect()
    }
    assert cuts["en"] == (0.7, 0.4, 9)
    assert cuts["de"] == (0.9 + 7 / 100.0, 0.9 + 4 / 100.0, 9)
    # de's high scores never leak into en's cuts
    out = assign_quality_buckets(_scored(spark, rows))
    en_head = out.where((F.col("lang") == "en") & (F.col("bucket") == "head"))
    assert en_head.count() == 3


def test_bucket_sizes_are_cumulative_ceils(spark):
    # n=10 with distinct scores: |head| = ceil(10/3) = 4,
    # |head|+|middle| = ceil(20/3) = 7
    rows = [(i, "en", i / 100.0) for i in range(1, 11)]
    counts = {
        r.bucket: r.c
        for r in assign_quality_buckets(_scored(spark, rows))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert counts["head"] == math.ceil(10 / 3)
    assert counts["head"] + counts["middle"] == math.ceil(20 / 3)


def test_plan_broadcasts_cuts_and_never_sorts_the_corpus(spark):
    rows = [(i, "en", i / 10.0) for i in range(1, 10)]
    out = assign_quality_buckets(_scored(spark, rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only Sort feeds the histogram window (post-aggregate), never the
    # raw corpus: every Sort must sit above the partial aggregate
    assert "SortMergeJoin" not in plan
