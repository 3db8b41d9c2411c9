"""As-of KG reconstruction (graph/temporal.py::snapshot_asof)."""

from __future__ import annotations

from codebased_spark.graph.temporal import snapshot_asof


def _snap(spark, obs, t, captures=None):
    obs_df = spark.createDataFrame(obs, ["url", "ts", "entity_id"])
    caps_df = (
        spark.createDataFrame(captures, ["url", "ts"]) if captures else None
    )
    return {
        (r.url, r.entity_id)
        for r in snapshot_asof(obs_df, t, ts_col="ts", captures=caps_df).collect()
    }


def test_state_is_newest_capture_not_union(spark):
    # capture 10 asserts E1+E2; capture 20 asserts only E1 (E2 retracted)
    obs = [("u", 10, "E1"), ("u", 10, "E2"), ("u", 20, "E1")]
    assert _snap(spark, obs, 15) == {("u", "E1"), ("u", "E2")}
    assert _snap(spark, obs, 20) == {("u", "E1")}  # E2 already retracted
    assert _snap(spark, obs, 99) == {("u", "E1")}


def test_before_first_capture_is_empty(spark):
    assert _snap(spark, [("u", 10, "E1")], 5) == set()


def test_mentionless_latest_capture_retracts_all(spark):
    # the full capture table knows capture 20 exists even though it
    # produced no observations — at T=25 the url asserts nothing
    obs = [("u", 10, "E1")]
    caps = [("u", 10), ("u", 20)]
    assert _snap(spark, obs, 25, captures=caps) == set()
    assert _snap(spark, obs, 15, captures=caps) == {("u", "E1")}
