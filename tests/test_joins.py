"""As-of join and bucketed range join (joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from codebased_spark.joins import asof_join, bucketed_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "a"),   # before any right -> null
            (1, _ts("2024-01-01T10:00:00"), "b"),   # matches 09:30 (v=7)
            (1, _ts("2024-01-01T12:00:00"), "c"),   # equality -> matches 12:00
            (2, _ts("2024-01-01T10:00:00"), "d"),   # key with no right rows
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 7),
            (1, _ts("2024-01-01T11:00:00"), 9),
            (1, _ts("2024-01-01T12:00:00"), 11),
        ],
        ["k", "ts", "v"],
    )
    out = {
        r.tag: r.r_v
        for r in asof_join(left, right, on=["k"], right_payload=["v"]).collect()
    }
    assert out == {"a": None, "b": 7, "c": 11, "d": None}


def test_asof_join_tiebreak_deterministic(spark):
    """Duplicate right timestamps: the largest tiebreak value wins."""
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 5), (1, _ts("2024-01-01T09:00:00"), 3)],
        ["k", "ts", "v"],
    )
    rows = asof_join(left, right, on=["k"], right_payload=["v"], tiebreak="v").collect()
    assert [r.r_v for r in rows] == [5]


def test_asof_join_single_shuffle_no_nested_loop(spark):
    """The plan is one hash partitioning on the key — never a range-
    predicate join (no CartesianProduct / BroadcastNestedLoopJoin)."""
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        F.col("id").alias("v"),
    )
    plan = (
        asof_join(left, right, on=["k"], right_payload=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_bucketed_range_join_matches_theta_join(spark):
    events = spark.range(500).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 1800).alias("ts"),
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T00:00:00"), _ts("2024-01-03T12:00:00")),
            (2, _ts("2024-01-03T00:00:00"), _ts("2024-01-05T23:59:59")),  # overlaps 1
            (3, _ts("2024-01-04T06:00:00"), _ts("2024-01-04T07:00:00")),  # sub-day
        ],
        ["iv_id", "start_ts", "end_ts"],
    )
    got = (
        bucketed_range_join(events, intervals)
        .select("event_id", "iv_id")
        .collect()
    )
    want = (
        events.join(
            intervals,
            (F.col("ts") >= F.col("start_ts")) & (F.col("ts") <= F.col("end_ts")),
        )
        .select("event_id", "iv_id")
        .collect()
    )
    assert sorted((r.event_id, r.iv_id) for r in got) == sorted(
        (r.event_id, r.iv_id) for r in want
    )
    assert len(got) > 0


def test_bucketed_range_join_plan_is_equi(spark):
    events = spark.range(100).select(
        F.timestamp_seconds(1704067200 + F.col("id") * 3600).alias("ts")
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-02T00:00:00"), _ts("2024-01-03T00:00:00"))],
        ["iv_id", "start_ts", "end_ts"],
    )
    plan = (
        bucketed_range_join(events, intervals)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
