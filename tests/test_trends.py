"""entity_trends: bucket comparison labels, and the 1-row max broadcast."""

from pyspark.sql import functions as F

from codebased_spark.graph.trends import entity_trends


def _obs(spark, rows):
    return spark.createDataFrame(rows, ["entity_id", "ts"])


def test_trend_labels(spark):
    # bucket_s=10 -> buckets: 0 (ts 0-9), 1 (ts 10-19), 2 (ts 20-29, newest)
    rows = (
        # rising: 1 in bucket1, 3 in bucket2
        [("E_RISE", 15)] + [("E_RISE", 21), ("E_RISE", 22), ("E_RISE", 23)]
        # falling: 2 in bucket1, 1 in bucket2
        + [("E_FALL", 11), ("E_FALL", 12), ("E_FALL", 25)]
        # flat: 1 and 1
        + [("E_FLAT", 13), ("E_FLAT", 26)]
        # new: only in bucket2
        + [("E_NEW", 27)]
        # gone: only in bucket1
        + [("E_GONE", 14)]
        # too old: only bucket0 -> absent from the result entirely
        + [("E_OLD", 3)]
    )
    out = {
        r["entity_id"]: r
        for r in entity_trends(_obs(spark, rows), bucket_s=10).collect()
    }
    assert set(out) == {"E_RISE", "E_FALL", "E_FLAT", "E_NEW", "E_GONE"}
    assert (out["E_RISE"]["cur_n"], out["E_RISE"]["prev_n"]) == (3, 1)
    assert out["E_RISE"]["trend"] == "rising"
    assert out["E_FALL"]["trend"] == "falling"
    assert out["E_FLAT"]["trend"] == "flat"
    assert (out["E_NEW"]["prev_n"], out["E_NEW"]["trend"]) == (0, "new")
    assert (out["E_GONE"]["cur_n"], out["E_GONE"]["trend"]) == (0, "gone")


def test_single_bucket_all_new(spark):
    out = entity_trends(
        _obs(spark, [("A", 5), ("A", 7), ("B", 9)]), bucket_s=100
    ).collect()
    assert {(r["entity_id"], r["cur_n"], r["trend"]) for r in out} == {
        ("A", 2, "new"),
        ("B", 1, "new"),
    }


def test_max_bucket_join_is_broadcast(spark):
    plan = entity_trends(
        _obs(spark, [("A", 5)]), bucket_s=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
